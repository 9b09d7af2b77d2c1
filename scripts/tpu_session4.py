#!/usr/bin/env python
"""Round-4 TPU session driver.

Primary goal (VERDICT r3 #1): make a COLD `python bench.py` finish inside
the driver budget. The axon remote-compile server re-compiles per process
even when the local persistent cache is warm ("compile ~4-7 min even
warm", tpu_session3.py), so the lever is shrinking the compiled program:
fewer window-group bodies (group_loop="fori" — one traced body — or a
G=1 config) rather than more caching.

Each case is a fresh `bench.py` subprocess under a hard timeout with one
retry (the axon runtime occasionally wedges a first execution after an
unclean client exit). Records append to benches/tpu_session4.jsonl.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benches", "tpu_session4.jsonl")


def run_case(env_extra, label, timeout_s=3600, retries=1):
    for attempt in range(retries + 1):
        rec = _run_once(env_extra, label, timeout_s)
        if rec.get("ok") or rec.get("error") != "timeout":
            return rec
        time.sleep(20)
    return rec


def _run_once(env_extra, label, timeout_s):
    env = dict(os.environ)
    env["PYTHONFAULTHANDLER"] = "1"
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
    print(f"[session4] {label}: {rec.get('result') or rec.get('error')} "
          f"(wall {rec['wall_s']}s)", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", required=True,
                    help="json list of (env, label) pairs")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--retries", type=int, default=1)
    args = ap.parse_args()
    for env_extra, label in [(dict(e), l) for e, l in json.loads(args.cases)]:
        run_case(env_extra, label, timeout_s=args.timeout,
                 retries=args.retries)


if __name__ == "__main__":
    main()
