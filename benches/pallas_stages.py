#!/usr/bin/env python
"""Per-stage timing of the PRODUCTION pallas pipeline
(cuzk/pipeline_pallas.py) — the breakdown the e2e number hides.

Times each sub-piece of _windows_device_pallas with the exact shapes and
kernels the pipeline uses at the given (n, config): encode_mont,
decompose_digits, the hoisted batched sort, the double-sort boundary
counts, and then per window group the permutation row-gather, the
prefix_scan kernel, col_prefix, the no-fill boundary extraction
(gathers + padd + psub), and finally the one-kernel pbpr_full. The
pieces deliberately mirror pipeline_pallas.py's internals (same
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


def _drain(out):
    """True completion barrier. On the axon runtime block_until_ready
    can return before queued device work drains (r5: the scan kernel
    'measured' 0.075 ms against a >=7 ms device-trace floor); a scalar
    readback of every output leaf is the only reliable fence."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[-1:]))
    return out


def timeit(fn, args, runs):
    out = _drain(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = _drain(fn(*args))
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
    from tpu_msm.cuzk import kernels
    from tpu_msm.cuzk.pipeline import get_pipeline
    from tpu_msm.cuzk.pipeline_pallas import _bucket_counts
    from tpu_msm.utils import preprocess

    curve = BN254_S12
    cfg = default_config(args.n, curve)
    pipe = get_pipeline(cfg)
    n = min(pipe.padded_size(args.n), cfg.max_points_per_pass)
    L = curve.num_limbs
    W, Wg, G = cfg.num_windows, cfg.subtask_group, cfg.num_groups
    Wp = cfg.padded_windows
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

    # stage 1b: fused decompose kernel to int16 digits, padded
    def dec(h):
        d = kernels.decompose_digits(h.astype(I32), cfg.window_size,
                                     W).astype(jnp.int16)
        if Wp > W:
            d = jnp.concatenate(
                [d, jnp.zeros((Wp - W, n), jnp.int16)], axis=0)
        return d
    ms, digits = timeit(jax.jit(dec), (hw,), args.runs)
    emit("decompose_digits", ms, f"{W*n} digits")

    # stage 2: ONE hoisted batched sort (sign packed into the key)
    def sort_all(d):
        d32 = d.astype(I32)
        keys2 = (jnp.abs(d32) << 1) | (d32 < 0).astype(I32)
        iota = jnp.broadcast_to(jnp.arange(n, dtype=I32), (Wp, n))
        return jax.lax.sort((keys2, iota), dimension=-1, num_keys=1,
                            is_stable=False)
    ms, (skeys2_all, perm_all) = timeit(jax.jit(sort_all), (digits,),
                                        args.runs)
    emit("sort_global", ms, f"{Wp}x{n} keys")

    # stage 2b: double-sort bucket boundary counts, all windows
    def counts(k2):
        return _bucket_counts(k2, n, B)
    ms, cnt_all = timeit(jax.jit(counts), (skeys2_all,), args.runs)
    emit("bucket_counts", ms, f"{Wp}x{B+1} boundaries")

    p_all = jnp.maximum(cnt_all - 1, 0)
    c_all = p_all // R
    f_all = (jnp.arange(Wp, dtype=I32) % Wg)[:, None] * C + c_all
    jt_all = (f_all // F8) * n8 + (p_all % R) * F8 + (f_all % F8)

    def to_kernel8(a):
        return (a.reshape(Wg, C, R).transpose(2, 0, 1)
                .reshape(R, 8, F8).swapaxes(0, 1).reshape(8, n8))

    skeys2 = skeys2_all[:Wg]
    perm = perm_all[:Wg]

    # stage 3a: permutation row-gather of the point stream (one group) —
    # same packed-int32 row form as the pipeline at n >= 2^18
    # (pipeline_pallas.py group_body)
    packed = (L % 2 == 0) and n >= (1 << 18)

    def gather_stream(pm, xm_, ym_):
        rows16 = jnp.concatenate([xm_, ym_], axis=0).astype(jnp.int16).T
        if packed:
            pts = jax.lax.bitcast_convert_type(
                rows16.reshape(rows16.shape[0], L, 2), jnp.int32)
        else:
            pts = rows16
        perm8 = to_kernel8(pm)
        srows = jnp.take(pts, perm8.reshape(-1), axis=0)
        nw = pts.shape[1]
        sxy = srows.reshape(8, n8, nw).transpose(2, 0, 1)
        return (sxy[:nw // 2].reshape(nw // 2 * 8, n8),
                sxy[nw // 2:].reshape(nw // 2 * 8, n8))
    ms, (sx8, sy8) = timeit(jax.jit(gather_stream), (perm, xm, ym),
                            args.runs)
    emit("gather_stream_group", ms, f"x{G} groups = {ms*G:.1f}"
         + (" (packed i32)" if packed else ""))

    # stage 3b: prefix-scan kernel (one group)
    sign8 = to_kernel8(skeys2.astype(I32)) & 1
    scan = jax.jit(functools.partial(kernels.prefix_scan, curve=curve,
                                     f8=F8, packed=packed))
    ms, tbuf = timeit(scan, (sx8, sy8, sign8), args.runs)
    emit("prefix_scan_group", ms, f"x{G} groups = {ms*G:.1f}")

    # stage 3c: col_prefix kernel + no-fill boundary extraction (one group)
    inf_b1 = kernels.inf_stacked(curve, (Wg, 1))

    def extract(tbuf_, cnt_g, f_g, jt_g):
        tflat = tbuf_.reshape(3, L, 8 * n8)
        coltot = tbuf_[:, (R - 1) * F8:].reshape(3, L, Wg, C)
        S = kernels.col_prefix(coltot, curve)
        Sflat = S.reshape(3, L, Wg * C)

        def flat_gather(src, idx):
            pm = src.reshape(3 * L, src.shape[-1]).T
            rows = jnp.take(pm, idx.reshape(-1), axis=0)
            return rows.T.reshape((3, L) + idx.shape)

        Tall = flat_gather(tflat, jt_g)
        Sall = flat_gather(Sflat, f_g)
        Gall = kernels.padd_batch(Tall, Sall, curve)
        Gp = jnp.where((cnt_g == 0)[None, None], inf_b1, Gall)
        return kernels.psub_batch(Gp[..., 1:], Gp[..., :-1], curve)
    ms, bucket = timeit(jax.jit(extract),
                        (tbuf, cnt_all[:Wg], f_all[:Wg], jt_all[:Wg]),
                        args.runs)
    emit("extract_group", ms, f"x{G} groups = {ms*G:.1f}")

    # stage 4: the one-kernel full PBPR
    buckets = jnp.broadcast_to(
        bucket[:, :, :1, :], (3, L, Wp, B)).copy()
    T = min(cfg.pbpr_threads, B)
    pb = jax.jit(functools.partial(kernels.pbpr_full, curve=curve,
                                   threads=T))
    ms, _ = timeit(pb, (buckets,), args.runs)
    emit("pbpr_full_kernel", ms, f"{Wp}x{B} buckets, T={T}")

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
