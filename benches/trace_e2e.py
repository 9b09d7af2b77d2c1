#!/usr/bin/env python
"""Trace the production e2e MSM program and dump per-op device time.

Wall-clock timing through the axon tunnel is unreliable below ~25 ms
(dispatch is async; block_until_ready can return before device work
drains — see benches/probe12.py vs probe13.py disagreement), so this is
the authoritative per-stage breakdown: run the pipeline under
jax.profiler, parse the xplane with xprof, and print device time by op,
sorted descending.

Usage: python benches/trace_e2e.py [--n 65536] [--top 40] [--xla]
"""

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpu_msm.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def collect(node, out, path=""):
    """Flatten the xprof by_program tree into (name, ps, occurrences)."""
    m = node.get("metrics", {})
    name = node.get("name", "?")
    kids = node.get("children", [])
    if not kids:
        out.append((path + name, m.get("rawTime", 0),
                    m.get("occurrences", 0)))
    for k in kids:
        collect(k, out, path + name + "/")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--xla", action="store_true",
                    help="trace the XLA backend instead of pallas")
    ap.add_argument("--curve", default="bn254_s12")
    ap.add_argument("--overrides", default="")
    args = ap.parse_args()

    from tpu_msm.config import default_config
    from tpu_msm.constants import CURVES
    from tpu_msm.cuzk.pipeline import get_pipeline
    from tpu_msm.utils import preprocess

    curve = CURVES[args.curve]
    cfg = default_config(args.n, curve)
    import dataclasses
    if args.xla:
        cfg = dataclasses.replace(cfg, backend="xla")
    if args.overrides:
        cfg = dataclasses.replace(cfg, **json.loads(args.overrides))
    pipe = get_pipeline(cfg)
    n = pipe.padded_size(args.n)
    print(f"[trace] n={n} s={cfg.window_size} C={cfg.columns} "
          f"T={cfg.pbpr_threads} Wg={cfg.subtask_group} "
          f"backend={cfg.backend}", file=sys.stderr)

    xs, ys, hw, _ = preprocess.gen_planar_inputs(curve, n, seed=3)
    hw = np.concatenate([hw, np.zeros((2, n), np.uint32)], axis=0)
    xs, ys = xs.astype(np.int32), ys.astype(np.int32)

    import time
    t0 = time.time()
    pipe.window_sums(xs, ys, hw)  # compile + warm
    print(f"[trace] compile+first {time.time()-t0:.1f}s", file=sys.stderr)

    logdir = "/tmp/tpu_msm_e2e_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    t0 = time.time()
    pipe.window_sums(xs, ys, hw)
    wall = time.time() - t0
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    tree = json.loads(data)["byProgram"]
    rows = collect(tree, [])
    rows.sort(key=lambda r: -r[1])
    total = sum(ps for name, ps, _ in rows if "IDLE" not in name)
    print(f"[trace] wall {wall*1e3:.1f} ms; device busy "
          f"{total/1e9:.1f} ms", file=sys.stderr)
    print(json.dumps({"probe": "e2e_device_busy_ms",
                      "ms": round(total / 1e9, 2),
                      "wall_ms": round(wall * 1e3, 1)}))
    for name, ps, occ in rows[:args.top]:
        if "IDLE" in name:
            continue
        print(f"{ps/1e9:9.3f} ms  x{occ:<5d} {name[:150]}")


if __name__ == "__main__":
    main()
