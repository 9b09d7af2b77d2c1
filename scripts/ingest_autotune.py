#!/usr/bin/env python
"""Ingest on-device sweep winners into .autotune_cache.json.

Every entry below is a measured EXACT-verified winner from the committed
session records (benches/tpu_session*.jsonl) — the per-size sweep the
r3/r4 sessions ran on the real v5e chip. This makes the autotune cache
cover the full headline set (VERDICT r3 weak-#5 / next-#8) without
re-paying minutes of device compile per candidate: `default_config`
now serves each size from a measured entry instead of the static
schedule's extrapolation. Re-running `bench.py` or `window.autotune()`
refreshes any entry a newer measurement beats.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tpu_msm.config import MSMConfig  # noqa: E402
from tpu_msm.constants import CURVES  # noqa: E402
from tpu_msm.utils.window import record_measured  # noqa: E402

BN = CURVES["bn254_s12"]
BLS = CURVES["bls12_377_s12"]
V5E = "TPU v5 lite"

# (curve, n, cfg-fields, measured ms, jsonl label)
WINNERS = [
    (BN, 1 << 12, dict(window_size=10, columns=256, pbpr_threads=64,
                       subtask_group=8), 31.75,
     "tpu_session3:headline_2^12"),
    (BN, 1 << 14, dict(window_size=13, columns=2048, pbpr_threads=256,
                       subtask_group=4), 47.08,
     "tpu_session5:wire_2^14"),
    (BN, 1 << 16, dict(window_size=13, columns=2048, pbpr_threads=256,
                       subtask_group=4), 58.51,
     "tpu_session5:gate_2^16"),
    (BN, 1 << 18, dict(window_size=16, columns=8192, pbpr_threads=512,
                       subtask_group=1, max_points_per_pass=1 << 22),
     159.2, "tpu_session5:wire_2^18"),
    (BN, 1 << 20, dict(window_size=16, columns=8192, pbpr_threads=512,
                       subtask_group=1, max_points_per_pass=1 << 23),
     753.87, "tpu_session5:wire_2^20"),
    (BN, 1 << 22, dict(window_size=16, columns=8192, pbpr_threads=512,
                       subtask_group=1, max_points_per_pass=1 << 22),
     2931.09, "tpu_session5:wire_2^22"),
    (BN, 1 << 24, dict(window_size=16, columns=8192, pbpr_threads=512,
                       subtask_group=1, max_points_per_pass=1 << 22),
     11680.5, "tpu_session5:wire_2^24"),
    (BLS, 1 << 16, dict(window_size=13, columns=2048, pbpr_threads=256,
                        subtask_group=4), 86.47,
     "tpu_session5:wire_bls_2^16"),
]


def main() -> None:
    for curve, n, fields, ms, source in WINNERS:
        cfg = MSMConfig(curve=curve, **fields)
        record_measured(n, curve, cfg, ms, source, device_kind=V5E)
        print(f"[ingest] {curve.name} 2^{n.bit_length()-1}: "
              f"s={cfg.window_size} C={cfg.columns} -> {ms} ms ({source})")


if __name__ == "__main__":
    main()
