#!/usr/bin/env python
"""On-device pallas kernel/e2e battery, one pytest PROCESS per test with
an individual timeout, results recorded to benches/tpu_battery.jsonl.

VERDICT r2 #3b: the battery had never passed anywhere because it ran as
one pytest process with one shared timeout — a single slow remote
compile starved the rest. Per-test processes + the persistent XLA cache
make each unit independently accountable, and the tiny-curve interpret
versions of the same kernels (tests/test_pallas_tiny.py) already run in
CPU CI.

Usage: python scripts/tpu_battery.py [--timeout 1500] [--tests a,b,...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benches", "tpu_battery.jsonl")

TESTS = [
    "test_encode_mont_matches_lazy",
    "test_padd_psub_pdbl_batch",
    "test_psub_is_group_subtraction",
    "test_prefix_scan_matches_pmadd_chain",
    "test_pbpr_stage1_matches_reference",
    "test_pallas_e2e_random",
    "test_pallas_e2e_adversarial",
    "test_pallas_e2e_equal_scalars",
    "test_pallas_e2e_second_geometry",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--tests", default="")
    args = ap.parse_args()
    tests = args.tests.split(",") if args.tests else TESTS

    env = dict(os.environ, TPU_MSM_TEST_TPU="1", PYTHONFAULTHANDLER="1")
    passed = failed = 0
    for name in tests:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-m", "pytest",
                 f"tests/test_pallas.py::{name}", "-q", "--no-header"],
                cwd=ROOT, env=env, capture_output=True, text=True,
                timeout=args.timeout)
            ok = p.returncode == 0
            tail = (p.stdout + p.stderr)[-800:] if not ok else ""
        except subprocess.TimeoutExpired:
            ok, tail = False, "timeout"
        rec = {"test": name, "ok": ok,
               "wall_s": round(time.time() - t0, 1)}
        if tail:
            rec["tail"] = tail
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        passed += ok
        failed += not ok
        print(f"[battery] {name}: {'PASS' if ok else 'FAIL'} "
              f"({rec['wall_s']}s)", flush=True)
    summary = {"battery": "test_pallas.py on TPU", "passed": passed,
               "failed": failed, "total": len(tests),
               "ok": failed == 0}
    with open(OUT, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    sys.exit(0 if failed == 0 else 1)


if __name__ == "__main__":
    main()
