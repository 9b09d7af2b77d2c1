#!/usr/bin/env python
"""Round-3 TPU session: fresh large-size benchmarks (VERDICT r2 #1).

Phase 1 (this script's default): the reference's headline table sizes
2^20 / 2^22 / 2^24 with the round-2 rewritten pipeline and the static
schedule, every point recorded to benches/tpu_session3.jsonl. Phase 2
(--sweep): config sweeps at the large sizes feeding the autotune cache.

Each case is a fresh subprocess of bench.py (compile ~4-7 min through
the axon remote-compile tunnel even warm; execution after that is ms).
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benches", "tpu_session3.jsonl")


def run_case(env_extra, label, timeout_s=3600, retries=1):
    """One bench.py subprocess. The axon runtime occasionally wedges a
    first execution forever when a previous TPU client exited uncleanly
    (device->host fetch blocks; diagnosed via faulthandler in r3) — so
    each case runs under a hard timeout with one retry after a cool-off."""
    for attempt in range(retries + 1):
        rec = _run_once(env_extra, label, timeout_s)
        if rec.get("ok") or rec.get("error") != "timeout":
            return rec
        time.sleep(20)
    return rec


def _run_once(env_extra, label, timeout_s):
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
               "wall_s": round(time.time() - t0, 1), "result": line,
               "stderr_info": [l for l in p.stderr.splitlines()
                               if l.startswith("[bench]")]}
        if p.returncode != 0:
            rec["stderr_tail"] = p.stderr[-2000:]
    except subprocess.TimeoutExpired:
        rec = {"label": label, "env": env_extra, "ok": False,
               "wall_s": round(time.time() - t0, 1), "error": "timeout"}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[session3] {label}: {rec.get('result') or rec.get('error')}",
          flush=True)
    return rec


HEADLINE = [
    ({"BENCH_N": 1 << 20, "BENCH_RUNS": 3}, "headline_2^20"),
    ({"BENCH_N": 1 << 22, "BENCH_RUNS": 3}, "headline_2^22"),
    ({"BENCH_N": 1 << 24, "BENCH_RUNS": 3}, "headline_2^24"),
]

SMALL = [
    ({"BENCH_N": 1 << 12, "BENCH_RUNS": 5}, "headline_2^12"),
    ({"BENCH_N": 1 << 14, "BENCH_RUNS": 5}, "headline_2^14"),
    ({"BENCH_N": 1 << 18, "BENCH_RUNS": 3}, "headline_2^18"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="headline",
                    help="headline | small | json list of (env, label)")
    args = ap.parse_args()
    if args.cases == "headline":
        cases = HEADLINE
    elif args.cases == "small":
        cases = SMALL
    else:
        cases = [(dict(e), l) for e, l in json.loads(args.cases)]
    for env_extra, label in cases:
        run_case(env_extra, label)


if __name__ == "__main__":
    main()
