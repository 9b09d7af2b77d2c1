#!/usr/bin/env python
"""Per-stage / per-kernel microbenchmarks — the analogue of the
reference's Criterion shader benches (mopro-msm/benches/shaders.rs:
convert :19-96, transpose :98-166, smvp :168-268, pbpr :270-412) plus
field/curve-op throughput anchors (mont_benchmarks.rs:10-42).

Each bench jits one pipeline stage (or one primitive batch op), warms it
up, and reports median wall latency plus derived throughput
(point-adds/s for curve stages, mont-muls/s for field stages — the
per-chip roofline numbers BASELINE.json asks for).

Usage:  python benches/stages.py [--n 65536] [--window 13] [--runs 5]
Output: one JSON line per stage on stdout; human summary on stderr.
"""

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpu_msm.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, args, runs):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times)


def emit(name, ms, work, unit):
    rate = work / (ms * 1e-3) if ms > 0 else 0.0
    print(f"[stage] {name:28s} {ms:10.3f} ms   "
          f"{rate/1e6:10.2f} M{unit}/s", file=sys.stderr)
    print(json.dumps({"stage": name, "ms": round(ms, 3),
                      "work": work, "unit": unit,
                      "rate_per_s": round(rate, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from tpu_msm.config import default_config
    from tpu_msm.constants import BN254_S12
    from tpu_msm.cuzk import decompose, pbpr, smvp
    from tpu_msm.cuzk.pipeline import get_pipeline
    from tpu_msm.ops import lazy
    from tpu_msm.ops.complete import ProjPoint, padd, pmadd
    from tpu_msm.utils import preprocess

    curve = BN254_S12
    n = args.n
    cfg = default_config(n, curve)
    if args.window:
        import dataclasses
        cfg = dataclasses.replace(cfg, window_size=args.window)
    pipe = get_pipeline(cfg)
    n_pad = pipe.padded_size(n)
    L, W, Wg = curve.num_limbs, cfg.num_windows, cfg.subtask_group

    print(f"[stages] n=2^{n.bit_length()-1} (padded {n_pad}) s={cfg.window_size} "
          f"C={cfg.columns} T={cfg.pbpr_threads} Wg={Wg} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    xs, ys, hw, _ = preprocess.gen_planar_inputs(curve, n_pad, seed=3)
    hw = np.concatenate([hw, np.zeros((2, n_pad), np.uint32)], axis=0)
    xs = jnp.asarray(xs.astype(np.int32))
    ys = jnp.asarray(ys.astype(np.int32))
    hw = jnp.asarray(hw)

    # ---- primitive throughput anchors ----
    batch = max(n_pad, 1 << 16)
    a = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << curve.log_limb_size, (L, batch)).astype(np.int32))
    mont = jax.jit(functools.partial(lazy.mont_mul, curve=curve))
    emit("mont_mul", timeit(mont, (a, a), args.runs), batch, "mul")

    pt = ProjPoint(a, a, a)
    jpadd = jax.jit(functools.partial(padd, curve=curve))
    emit("padd_complete", timeit(jpadd, (pt, pt), args.runs), batch, "add")
    jmadd = jax.jit(functools.partial(pmadd, curve=curve))
    emit("pmadd_complete", timeit(jmadd, (pt, a, a), args.runs), batch, "add")

    # ---- stage 1: convert + decompose ----
    conv = jax.jit(functools.partial(decompose.points_to_mont, curve=curve))
    emit("convert_to_mont", timeit(conv, (xs, ys), args.runs), 2 * n_pad, "coord")
    dec = jax.jit(functools.partial(decompose.decompose, cfg=cfg))
    emit("decompose", timeit(dec, (hw,), args.runs), W * n_pad, "digit")

    # ---- stage 2: sort (the transpose analogue) ----
    from tpu_msm.cuzk import sort as sortmod
    digits = dec(hw)[:Wg]

    def sort_stage(d):
        keys, negm = sortmod.bucket_keys(d)
        skeys, perm = sortmod.sort_by_bucket(keys)
        return skeys, perm, negm
    emit("sort_by_bucket", timeit(jax.jit(sort_stage), (digits,), args.runs),
         Wg * n_pad, "key")

    # ---- stage 3: SMVP bucket accumulation (one window group) ----
    xm, ym = conv(xs, ys)
    smvp_fn = jax.jit(functools.partial(smvp.bucket_accumulate, cfg=cfg))
    ms = timeit(smvp_fn, (xm, ym, digits), args.runs)
    emit("smvp_group", ms, Wg * n_pad, "pointadd")
    emit("smvp_extrapolated_full", ms * cfg.num_groups, W * n_pad, "pointadd")

    # ---- stage 4: PBPR ----
    buckets = smvp_fn(xm, ym, digits)
    bx = jnp.broadcast_to(buckets.x[:, :1], (L, cfg.padded_windows,
                                             cfg.half_columns))
    full = ProjPoint(bx, bx, bx)
    pbpr_fn = jax.jit(functools.partial(pbpr.bucket_reduce, cfg=cfg))
    emit("pbpr", timeit(pbpr_fn, (full,), args.runs),
         2 * cfg.padded_windows * cfg.half_columns, "pointadd")

    # ---- full pipeline ----
    t0 = time.perf_counter()
    pipe.window_sums(np.asarray(xs), np.asarray(ys), np.asarray(hw))
    first = (time.perf_counter() - t0) * 1e3
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        pipe.window_sums(np.asarray(xs), np.asarray(ys), np.asarray(hw))
        times.append((time.perf_counter() - t0) * 1e3)
    ms = statistics.median(times)
    emit("e2e_device_pipeline", ms, W * n_pad, "pointadd")
    print(f"[stages] first full run (incl compile) {first:.0f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
