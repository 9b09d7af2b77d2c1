#!/usr/bin/env python
"""Per-stage timing of the PRODUCTION pallas pipeline
(cuzk/pipeline_pallas.py) — the breakdown the e2e number hides.

Times each sub-piece of _windows_device_pallas with the exact shapes the
pipeline uses at the given (n, config): encode, decompose, the hoisted
global sort, the permutation row-gather, the prefix-scan kernel, bucket
extraction (searchsorted + combined gathers + HS fill), and PBPR.
The pieces deliberately mirror pipeline_pallas.py's internals (same
layouts, same kernel calls); if the pipeline changes, update both.

Usage: python benches/pallas_stages.py [--n 65536] [--runs 3]
Output: one JSON line per stage on stdout, summary on stderr.
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

I32 = jnp.int32


def timeit(fn, args, runs):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times), out


def emit(name, ms, note=""):
    print(f"[pstage] {name:26s} {ms:10.3f} ms  {note}", file=sys.stderr)
    print(json.dumps({"stage": name, "ms": round(ms, 3), "note": note}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from tpu_msm.config import default_config
    from tpu_msm.constants import BN254_S12
    from tpu_msm.cuzk import decompose, kernels
    from tpu_msm.cuzk.pipeline import get_pipeline
    from tpu_msm.utils import preprocess

    curve = BN254_S12
    cfg = default_config(args.n, curve)
    pipe = get_pipeline(cfg)
    n = min(pipe.padded_size(args.n), cfg.max_points_per_pass)
    L = curve.num_limbs
    W, Wg, G = cfg.num_windows, cfg.subtask_group, cfg.num_groups
    C = min(cfg.columns, n)
    R = n // C
    B = cfg.half_columns
    F = Wg * C
    F8 = F // 8
    n8 = R * F8
    print(f"[pstage] n={n} s={cfg.window_size} C={C} R={R} Wg={Wg} G={G} "
          f"B={B} device={jax.devices()[0].device_kind}", file=sys.stderr)

    xs, ys, hw, _ = preprocess.gen_planar_inputs(curve, n, seed=3)
    hw = np.concatenate([hw, np.zeros((2, n), np.uint32)], axis=0)
    xs = jnp.asarray(xs.astype(np.int32))
    ys = jnp.asarray(ys.astype(np.int32))
    hw = jnp.asarray(hw)

    # stage 1a: Montgomery encode (both coords)
    enc = jax.jit(lambda a, b: (kernels.encode_mont(a, curve),
                                kernels.encode_mont(b, curve)))
    ms, (xm, ym) = timeit(enc, (xs, ys), args.runs)
    emit("encode_mont", ms, f"{2*n} coords")

    # stage 1b: decompose to int16 digits
    dec = jax.jit(lambda h: decompose.decompose(h, cfg).astype(jnp.int16))
    ms, digits = timeit(dec, (hw,), args.runs)
    emit("decompose", ms, f"{W*n} digits")
    if cfg.padded_windows > W:
        digits = jnp.concatenate(
            [digits, jnp.zeros((cfg.padded_windows - W, n), jnp.int16)], 0)

    # stage 2: hoisted global sort (packed-sign keys)
    def sort_all(d):
        d32 = d.astype(I32)
        keys2 = (jnp.abs(d32) << 1) | (d32 < 0).astype(I32)
        iota = jnp.broadcast_to(jnp.arange(n, dtype=I32),
                                (cfg.padded_windows, n))
        return jax.lax.sort((keys2, iota), dimension=-1, num_keys=1,
                            is_stable=False)
    ms, (skeys2_all, perm_all) = timeit(jax.jit(sort_all), (digits,),
                                        args.runs)
    emit("sort_global", ms, f"{cfg.padded_windows}x{n} keys")

    wv = jnp.arange(Wg, dtype=I32)[:, None]

    def to_kernel8(a):
        return (a.reshape(Wg, C, R).transpose(2, 0, 1)
                .reshape(R, 8, F8).swapaxes(0, 1).reshape(8, n8))

    skeys2 = skeys2_all[:Wg]
    perm = perm_all[:Wg]

    # stage 3a: permutation row-gather of the point stream (one group)
    def gather_stream(pm, xm_, ym_):
        perm8 = to_kernel8(pm)
        sx8 = xm_[:, perm8].reshape(L * 8, n8)
        sy8 = ym_[:, perm8].reshape(L * 8, n8)
        return sx8, sy8
    ms, (sx8, sy8) = timeit(jax.jit(gather_stream), (perm, xm, ym),
                            args.runs)
    emit("gather_stream_group", ms, f"x{G} groups = {ms*G:.1f}")

    # stage 3b: prefix-scan kernel (one group)
    sign8 = to_kernel8(skeys2.astype(I32)) & 1
    scan = jax.jit(functools.partial(kernels.prefix_scan, curve=curve,
                                     f8=F8))
    ms, tbuf = timeit(scan, (sx8, sy8, sign8), args.runs)
    emit("prefix_scan_group", ms, f"x{G} groups = {ms*G:.1f}")

    # stage 3c: extraction (searchsorted + combined gathers + fill + sub)
    def extract(skeys2_, tbuf_):
        tflat = tbuf_.reshape(3, L, 8 * n8)
        coltot = tbuf_[:, (R - 1) * F8:].reshape(3, L, Wg, C)
        inf_c = kernels.inf_stacked(curve, (Wg, 1))
        excl = jnp.concatenate([inf_c, coltot[..., :-1]], axis=-1)
        from tpu_msm.cuzk.pipeline_pallas import _hs_scan_last
        S = _hs_scan_last(excl, curve)
        Sflat = S.reshape(3, L, Wg * C)
        qs = jnp.arange(1, B + 2, dtype=I32) << 1
        cnt = jax.vmap(
            lambda sk: jnp.searchsorted(sk, qs, side="left"))(skeys2_)
        e = cnt[:, 1:] - 1
        empty = cnt[:, 1:] == cnt[:, :B]
        n0 = cnt[:, 0]
        p_all = jnp.concatenate(
            [jnp.maximum(n0 - 1, 0)[:, None], jnp.maximum(e, 0)], axis=1)
        c_all = p_all // R

        def flat_gather(src, idx):
            pm = src.reshape(3 * L, src.shape[-1]).T
            rows_ = jnp.take(pm, idx.reshape(-1), axis=0)
            return rows_.T.reshape((3, L) + idx.shape)

        f_all = wv * C + c_all
        jt = (f_all // F8) * n8 + (p_all % R) * F8 + (f_all % F8)
        Tall = flat_gather(tflat, jt)
        Sall = flat_gather(Sflat, f_all)
        Gall = kernels.padd_batch(Tall, Sall, curve)
        Ge = Gall[..., 1:]
        inf_b = kernels.inf_stacked(curve, (Wg, B))
        G0 = jnp.where((n0 == 0)[None, None, :, None],
                       inf_b[..., :1], Gall[..., :1])
        vals = jnp.concatenate([G0, Ge[..., :-1]], axis=-1)
        valid = jnp.concatenate(
            [jnp.ones((Wg, 1), bool), (~empty)[..., :-1]], axis=-1)
        k = 1
        while k < B:
            pad_v = jnp.broadcast_to(inf_b[..., :k], vals[..., :k].shape)
            sh_vals = jnp.concatenate([pad_v, vals[..., :-k]], axis=-1)
            sh_valid = jnp.concatenate(
                [jnp.zeros((Wg, k), bool), valid[..., :-k]], axis=-1)
            vals = jnp.where(valid[None, None], vals, sh_vals)
            valid = valid | sh_valid
            k *= 2
        bucket = kernels.psub_batch(Ge, vals, curve)
        return jnp.where(empty[None, None], inf_b, bucket)
    ms, bucket = timeit(jax.jit(extract), (skeys2, tbuf), args.runs)
    emit("extract_group", ms, f"x{G} groups = {ms*G:.1f}")

    # stage 4: PBPR (full)
    buckets = jnp.broadcast_to(
        bucket[:, :, :1, :], (3, L, cfg.padded_windows, B)).copy()
    T = min(cfg.pbpr_threads, B)

    def pbpr_full(bk):
        m, g = kernels.pbpr_stage1(bk, curve, T)
        bits = max((T - 1).bit_length(), 1)
        t_ids = jnp.arange(T, dtype=I32)
        inf_t = kernels.inf_stacked(curve, (cfg.padded_windows, 1, T))
        masked = [g[:, :, :, None, :]]
        for k in range(bits):
            has = ((t_ids >> k) & 1).astype(bool)
            masked.append(jnp.where(has[None, None, None, None],
                                    m[:, :, :, None, :], inf_t))
        allm = jnp.concatenate(masked, axis=3)
        from tpu_msm.cuzk.pipeline_pallas import _hs_scan_last
        totals = _hs_scan_last(allm, curve)[..., -1]
        return totals
    ms, _ = timeit(jax.jit(pbpr_full), (buckets,), args.runs)
    emit("pbpr_full", ms, f"{cfg.padded_windows}x{B} buckets")

    # e2e for reference
    t0 = time.perf_counter()
    pipe.window_sums(np.asarray(xs), np.asarray(ys), np.asarray(hw))
    first = (time.perf_counter() - t0) * 1e3
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        pipe.window_sums(np.asarray(xs), np.asarray(ys), np.asarray(hw))
        times.append((time.perf_counter() - t0) * 1e3)
    emit("e2e_device_pipeline", statistics.median(times),
         f"first(incl compile) {first:.0f}")


if __name__ == "__main__":
    main()
