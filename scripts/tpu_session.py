#!/usr/bin/env python
"""One-shot TPU measurement session: run after the device becomes
reachable. Produces JSON lines in benches/tpu_session.jsonl covering
  1. profile duel: bn254_s12 vs bn254_s13 e2e at 2^16 / 2^20
  2. window-size sweep at 2^24 (s = 16 is the static default; try
     neighbors that change the window count W = ceil(254/s))
  3. refreshed headline numbers for BENCHMARKS.md (2^16 / 2^20 / 2^24)

Each case shells out to bench.py under `timeout` so one hung compile
cannot take down the session; partial results are still recorded.

Usage: python scripts/tpu_session.py [--quick]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benches", "tpu_session.jsonl")


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
    print(f"[session] {label}: {rec.get('result') or rec.get('error')}",
          flush=True)
    return rec


def main():
    quick = "--quick" in sys.argv
    cases = [
        # 1. profile duel (same schedule, different limb profile)
        ({"BENCH_N": 1 << 16, "BENCH_CURVE": "bn254_s12", "BENCH_RUNS": 3},
         "duel_s12_2^16", 1800),
        ({"BENCH_N": 1 << 16, "BENCH_CURVE": "bn254_s13", "BENCH_RUNS": 3},
         "duel_s13_2^16", 1800),
        # GLV duel: halves the W-proportional stages (extraction/PBPR/
        # per-window overheads) at unchanged scan/sort op counts — the
        # prime suspect for the e2e-vs-roofline gap (docs/perf_notes.md)
        ({"BENCH_N": 1 << 16, "BENCH_CURVE": "bn254_s13", "BENCH_RUNS": 3,
          "BENCH_OVERRIDES": '{"glv": true}'}, "glv_2^16", 1800),
    ]
    if not quick:
        cases += [
            ({"BENCH_N": 1 << 20, "BENCH_CURVE": "bn254_s12",
              "BENCH_RUNS": 3}, "duel_s12_2^20", 2400),
            ({"BENCH_N": 1 << 20, "BENCH_CURVE": "bn254_s13",
              "BENCH_RUNS": 3}, "duel_s13_2^20", 2400),
            ({"BENCH_N": 1 << 20, "BENCH_CURVE": "bn254_s13",
              "BENCH_RUNS": 3, "BENCH_OVERRIDES": '{"glv": true}'},
             "glv_2^20", 2400),
            # 2. shape sweep at 2^24 (s is capped at 16 by the int16
            # digit buffer; sweep the column/pass shape instead)
            ({"BENCH_N": 1 << 24, "BENCH_RUNS": 1}, "2^24_default", 3600),
            ({"BENCH_N": 1 << 24, "BENCH_RUNS": 1,
              "BENCH_OVERRIDES": '{"columns": 16384}'},
             "2^24_C16384", 3600),
            ({"BENCH_N": 1 << 24, "BENCH_RUNS": 1,
              "BENCH_OVERRIDES": '{"max_points_per_pass": 16777216}'},
             "2^24_one_pass", 3600),
            # 3. full headline sweep (reference README table sizes)
            ({"BENCH_N": 1 << 12, "BENCH_RUNS": 5}, "sweep_2^12", 1200),
            ({"BENCH_N": 1 << 14, "BENCH_RUNS": 5}, "sweep_2^14", 1200),
            ({"BENCH_N": 1 << 18, "BENCH_RUNS": 3}, "sweep_2^18", 2400),
            ({"BENCH_N": 1 << 22, "BENCH_RUNS": 1}, "sweep_2^22", 3600),
        ]
    for env_extra, label, t in cases:
        run_case(env_extra, label, t)

    # pallas per-stage breakdown at the two profile points
    for n, t in (((1 << 16), 1800), ((1 << 20), 2400)):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "benches",
                                              "pallas_stages.py"),
                 "--n", str(n)],
                capture_output=True, text=True, timeout=t)
            stages = [json.loads(ln) for ln in p.stdout.splitlines()
                      if ln.strip().startswith("{")]
            rec = {"label": f"pallas_stages_2^{n.bit_length()-1}",
                   "ok": p.returncode == 0, "stages": stages,
                   "wall_s": round(time.time() - t0, 1)}
            if p.returncode != 0:
                rec["stderr_tail"] = p.stderr[-2000:]
        except subprocess.TimeoutExpired:
            rec = {"label": f"pallas_stages_2^{n.bit_length()-1}",
                   "ok": False, "error": "timeout"}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[session] {rec['label']}: ok={rec['ok']}", flush=True)
    print(f"[session] done -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
