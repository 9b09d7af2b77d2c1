#!/usr/bin/env python
"""Follow-up TPU session (after the quick session's breakdown landed).

Findings the quick session produced at 2^16/bn254_s12 (see
benches/tpu_session.jsonl): extraction = 138 ms of the ~143 ms e2e,
PBPR = 30 ms, everything else ~1 ms. Extraction's dominant term is the
Hillis-Steele column-prefix scan: C*log2(C) complete adds with the
default C=16384 — 3.5x the whole stream's add count. Hypothesis: much
smaller C (deeper scan grid, far fewer column-combine adds) wins.

Cases:
  0. validate the pbpr row-padding fix: s13 duel + glv duel (both
     failed pre-fix with the Mosaic block-shape error)
  1. columns sweep at 2^16: C in {2048, 4096}
  2. pbpr_threads probe at 2^16: T=128
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benches", "tpu_session2.jsonl")


def run_case(env_extra, label, timeout_s):
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_extra.items()})
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=timeout_s)
        line = None
        for ln in p.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = json.loads(ln)
        rec = {"label": label, "env": env_extra, "ok": p.returncode == 0,
               "wall_s": round(time.time() - t0, 1), "result": line}
        if p.returncode != 0:
            rec["stderr_tail"] = p.stderr[-2000:]
    except subprocess.TimeoutExpired:
        rec = {"label": label, "env": env_extra, "ok": False,
               "wall_s": round(time.time() - t0, 1), "error": "timeout"}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[session2] {label}: {rec.get('result') or rec.get('error')}",
          flush=True)
    return rec


def run_script(argv, label, timeout_s):
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable] + argv, capture_output=True,
                           text=True, timeout=timeout_s, cwd=ROOT)
        lines = [json.loads(ln) for ln in p.stdout.splitlines()
                 if ln.strip().startswith("{")]
        rec = {"label": label, "ok": p.returncode == 0, "out": lines,
               "wall_s": round(time.time() - t0, 1)}
        if p.returncode != 0:
            rec["stderr_tail"] = p.stderr[-2000:]
    except subprocess.TimeoutExpired:
        rec = {"label": label, "ok": False, "error": "timeout",
               "wall_s": round(time.time() - t0, 1)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[session2] {label}: ok={rec['ok']}", flush=True)
    return rec


def main():
    # 1. launch-cost probe of the dominant stage
    run_script([os.path.join(ROOT, "benches", "probe_extract.py")],
               "probe_extract", 2400)
    # 2. on-device kernel battery — validates the pbpr row-padding fix
    run_script([os.path.join(ROOT, "scripts", "tpu_verify.py"), "--quick"],
               "pallas_battery", 2400)
    # 3. re-queued duels that failed pre-fix
    cases = [
        ({"BENCH_N": 1 << 16, "BENCH_CURVE": "bn254_s13", "BENCH_RUNS": 3},
         "duel_s13_2^16_fixed", 1800),
        ({"BENCH_N": 1 << 16, "BENCH_CURVE": "bn254_s13", "BENCH_RUNS": 3,
          "BENCH_OVERRIDES": '{"glv": true}'}, "glv_2^16_fixed", 1800),
    ]
    for env_extra, label, t in cases:
        run_case(env_extra, label, t)
    print(f"[session2] done -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
