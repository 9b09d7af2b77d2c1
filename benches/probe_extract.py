#!/usr/bin/env python
"""Probe: split the `extract` stage (83% of the 2^16 e2e — see
docs/perf_notes.md MEASURED) into its sub-pieces and time each as its
own jitted program, plus bare padd_batch launches at several widths to
separate per-pallas_call fixed cost from the add-count roofline.

Usage: python benches/probe_extract.py [--runs 5]
Output: one JSON line per probe.
"""

import argparse
import functools
import json
import statistics
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpu_msm.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

I32 = jnp.int32


def timeit(fn, args, runs):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), out


def emit(name, ms, note=""):
    print(f"[probe] {name:28s} {ms:9.3f} ms  {note}", file=sys.stderr)
    print(json.dumps({"probe": name, "ms": round(ms, 3), "note": note}),
        flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from tpu_msm.config import default_config
    from tpu_msm.constants import BN254_S12
    from tpu_msm.cuzk import kernels
    from tpu_msm.cuzk.pipeline_pallas import _hs_scan_last

    n = 1 << 16
    curve = BN254_S12
    cfg = default_config(n, curve)
    L = curve.num_limbs
    Wg = cfg.subtask_group
    C = min(cfg.columns, n)
    R = n // C
    B = cfg.half_columns
    F8 = Wg * C // 8
    n8 = R * F8
    print(f"[probe] L={L} Wg={Wg} C={C} R={R} B={B}", file=sys.stderr)

    rng = np.random.default_rng(7)

    def rand_pts(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 12, size=(3, L) + shape, dtype=np.int64)
            .astype(np.int32))

    # --- bare padd_batch at the extract widths ---
    for lanes in (64, 1024, Wg * C, Wg * B, Wg * n):
        p = rand_pts((lanes,))
        q = rand_pts((lanes,))
        f = jax.jit(functools.partial(kernels.padd_batch, curve=curve))
        ms, _ = timeit(f, (p, q), args.runs)
        emit(f"padd_batch_{lanes}", ms, f"{lanes} lanes, 1 launch")

    # --- k chained padds in ONE jit (launch-count scaling) ---
    for k in (2, 4, 8):
        p = rand_pts((Wg * C,))
        q = rand_pts((Wg * C,))

        def chain(p, q, k=k):
            for _ in range(k):
                p = kernels.padd_batch(p, q, curve)
            return p
        ms, _ = timeit(jax.jit(chain), (p, q), args.runs)
        emit(f"padd_chain_{k}", ms, f"{Wg*C} lanes, {k} launches")

    # --- S column scan exactly as extract does it ---
    excl = rand_pts((Wg, C))
    ms, _ = timeit(jax.jit(lambda e: _hs_scan_last(e, curve)), (excl,),
                   args.runs)
    emit("S_hs_scan", ms, f"log2(C)={C.bit_length()-1} padd launches")

    # --- searchsorted ---
    sk = jnp.sort(jnp.asarray(
        rng.integers(0, 2 * B, size=(Wg, n), dtype=np.int64).astype(np.int32)),
        axis=-1)
    qs = jnp.arange(1, B + 2, dtype=I32) << 1

    def ss(sk):
        return jax.vmap(lambda s: jnp.searchsorted(s, qs, side="left"))(sk)
    ms, cnt = timeit(jax.jit(ss), (sk,), args.runs)
    emit("searchsorted", ms, f"{Wg}x{B+1} queries over n={n}")

    # --- the two flat row-gathers ---
    tflat = rand_pts((8 * n8,))
    idx = jnp.asarray(rng.integers(0, 8 * n8, size=(Wg, B + 1),
                                   dtype=np.int64).astype(np.int32))

    def gathers(tflat, idx):
        pm = tflat.reshape(3 * L, 8 * n8).T
        rows_ = jnp.take(pm, idx.reshape(-1), axis=0)
        return rows_.T.reshape((3, L) + idx.shape)
    ms, _ = timeit(jax.jit(gathers), (tflat, idx), args.runs)
    emit("flat_gather", ms, f"{Wg*(B+1)} rows of {3*L} words")

    # --- the empty-bucket fill loop (wheres/concats only, no padds) ---
    vals = rand_pts((Wg, B))
    valid0 = jnp.asarray(rng.integers(0, 2, size=(Wg, B)) > 0)
    inf_b = kernels.inf_stacked(curve, (Wg, B))

    def fill(vals, valid):
        k = 1
        while k < B:
            pad_v = jnp.broadcast_to(inf_b[..., :k], vals[..., :k].shape)
            sh_vals = jnp.concatenate([pad_v, vals[..., :-k]], axis=-1)
            sh_valid = jnp.concatenate(
                [jnp.zeros((Wg, k), bool), valid[..., :-k]], axis=-1)
            vals = jnp.where(valid[None, None], vals, sh_vals)
            valid = valid | sh_valid
            k *= 2
        return vals
    ms, _ = timeit(jax.jit(fill), (vals, valid0), args.runs)
    emit("fill_loop", ms, f"log2(B)={B.bit_length()-1} where-rounds")

    # --- psub at (Wg, B) ---
    a = rand_pts((Wg, B))
    b = rand_pts((Wg, B))
    ms, _ = timeit(jax.jit(functools.partial(kernels.psub_batch,
                                             curve=curve)), (a, b), args.runs)
    emit("psub_WgB", ms, f"{Wg*B} lanes")


if __name__ == "__main__":
    main()
