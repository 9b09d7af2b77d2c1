#!/usr/bin/env python
"""On-device verification battery: runs the pallas kernel + e2e tests
(skipped on CPU, tests/test_pallas.py) against the real TPU, then an
extra randomized e2e sweep across window geometries.

Usage:  python scripts/tpu_verify.py [--quick]
The XLA compile cache makes re-runs fast; first run compiles ~10 kernels.
"""

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="kernel tests only, skip the geometry sweep")
    args = ap.parse_args()

    env = dict(os.environ, TPU_MSM_TEST_TPU="1")
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_pallas.py", "-q"],
        cwd=ROOT, env=env)
    if rc:
        sys.exit(rc)
    if args.quick:
        return

    from tpu_msm.utils.cache import enable_compile_cache
    enable_compile_cache()
    from tpu_msm.config import MSMConfig
    from tpu_msm.constants import BLS12_377_S12, BN254_S12
    from tpu_msm.cuzk.pipeline import tpu_variable_base_msm
    from tpu_msm.reference import curve as ref

    cases = [(BN254_S12, 1024, 8, 128, 16, 8),
             (BN254_S12, 4096, 10, 512, 64, 8),
             (BN254_S12, 3000, 12, 256, 128, 4),
             (BLS12_377_S12, 1024, 8, 128, 16, 8)]
    for (C, n, s, cols, t, wg) in cases:
        pts, scalars = ref.gen_points_scalars(C, n, seed=1000 + n)
        cfg = MSMConfig(curve=C, window_size=s, columns=cols,
                        pbpr_threads=t, subtask_group=wg, backend="pallas")
        got = tpu_variable_base_msm(pts, scalars, config=cfg)
        want = ref.msm_pippenger_signed(C, pts, scalars, window=8)
        ok = ref.jac_eq(C, got, want)
        print(f"e2e {C.name} n={n} s={s}: {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            sys.exit(1)
    print("tpu_verify: ALL MATCH")


if __name__ == "__main__":
    main()
