#!/usr/bin/env python
"""Run the on-device autotuner and persist `.autotune_cache.json`
(VERDICT r2 #4: the machinery in utils/window.py had never executed on
the device).

Candidates per size are the round-3 sweep's winner plus the nearest
schedule alternative — the broad measurements already live in
benches/tpu_session3.jsonl; this run makes the cache file itself a
DEVICE-MEASURED artifact (autotune compiles, times, and persists each
candidate via the exact production entry point). Programs match ones
benched this round, so the XLA persistent cache keeps compiles short.

Usage: python scripts/tpu_autotune.py [--sizes 65536,1048576,4194304]
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tpu_msm.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def candidates_for(n):
    from tpu_msm.config import MSMConfig
    wide = dict(window_size=16, columns=8192, pbpr_threads=512,
                subtask_group=1)
    if n >= (1 << 23):
        wide["max_points_per_pass"] = 1 << 22
    mid = dict(window_size=13, columns=2048, pbpr_threads=256,
               subtask_group=4)
    if n >= (1 << 20):
        return [MSMConfig(**wide), MSMConfig(window_size=15, columns=8192,
                                             pbpr_threads=512,
                                             subtask_group=1)]
    return [MSMConfig(**mid), MSMConfig(**wide)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="65536,1048576,4194304")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    from tpu_msm.utils.window import autotune
    for n in (int(s) for s in args.sizes.split(",")):
        best, results = autotune(n, runs=args.runs,
                                 configs=candidates_for(n))
        print(f"[autotune] n=2^{n.bit_length()-1} winner: "
              f"s={best.window_size} C={best.columns} "
              f"T={best.pbpr_threads} Wg={best.subtask_group}",
              flush=True)


if __name__ == "__main__":
    main()
