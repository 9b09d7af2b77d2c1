#!/usr/bin/env python
"""Probe 12: resolve the round-1 extract-cost contradiction.

Round-1 numbers disagree: four extract sub-pieces each measured ~25 ms
standalone (benches/tpu_session2.jsonl probe_extract) yet the whole
extract stage measures 27.6 ms/group inside pallas_stages.  This probe
re-measures with controls on the live TPU:

  * per-call floor controls (identity / elementwise programs at the same
    shapes) to expose fixed dispatch cost of NON-pallas programs;
  * padd vs psub at identical shapes (isolating pneg_stacked);
  * gather formulations: rows-66, rows-128-padded, lane-axis,
    sorted-flag, fori+dynamic_slice, and a Pallas column-gather kernel;
  * searchsorted vs the double-sort (merge) counting trick;
  * the current extract vs a no-fill reformulation
    (bucket[b] = G(cnt[b+1]-1) - G(cnt[b]-1) as a consecutive
    difference of ONE gathered array — the fill-forward loop is
    mathematically redundant);
  * each candidate extract inside a lax.scan over G groups (in-program
    per-group cost, the number that actually hits e2e).

Usage: python benches/probe12.py [--runs 10] [--n 65536]
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

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
    print(f"[p12] {name:26s} {ms:9.3f} ms  {note}", file=sys.stderr)
    print(json.dumps({"probe": name, "ms": round(ms, 3), "note": note}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--n", type=int, default=1 << 16)
    args = ap.parse_args()

    from tpu_msm.config import default_config
    from tpu_msm.constants import BN254_S12
    from tpu_msm.cuzk import kernels
    from tpu_msm.cuzk.pipeline_pallas import _hs_scan_last

    n = args.n
    curve = BN254_S12
    cfg = default_config(n, curve)
    L = curve.num_limbs
    Wg = cfg.subtask_group
    C = min(cfg.columns, n)
    R = n // C
    B = cfg.half_columns
    G = cfg.num_groups
    F8 = Wg * C // 8
    n8 = R * F8
    print(f"[p12] L={L} Wg={Wg} C={C} R={R} B={B} G={G} "
          f"dev={jax.devices()[0].device_kind}", file=sys.stderr)

    rng = np.random.default_rng(7)

    def rand_pts(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 12, size=(3, L) + shape, dtype=np.int64)
            .astype(np.int32))

    # ---------------- controls ----------------
    a = rand_pts((Wg, B))
    b = rand_pts((Wg, B))
    ms, _ = timeit(jax.jit(lambda x: x * 1), (a,), args.runs)
    emit("ctl_identity", ms, "x*1 on (3,L,Wg,B)")
    ms, _ = timeit(jax.jit(lambda x, y: x + y), (a, b), args.runs)
    emit("ctl_elementwise", ms, "x+y on (3,L,Wg,B)")
    ms, _ = timeit(jax.jit(functools.partial(kernels.padd_batch,
                                             curve=curve)), (a, b), args.runs)
    emit("padd_WgB", ms, "padd_batch (Wg,B) batch")
    ms, _ = timeit(jax.jit(functools.partial(kernels.psub_batch,
                                             curve=curve)), (a, b), args.runs)
    emit("psub_WgB", ms, "psub_batch (Wg,B) batch")
    ms, _ = timeit(jax.jit(functools.partial(kernels.pneg_stacked,
                                             curve=curve)), (a,), args.runs)
    emit("pneg_only", ms, "pneg_stacked (Wg,B)")

    # ---------------- counting: searchsorted vs double sort ----------------
    skeys_np = np.sort(rng.integers(0, 2 * B, size=(Wg, n), dtype=np.int64)
                       .astype(np.int32), axis=-1)
    sk = jnp.asarray(skeys_np)
    qs = jnp.arange(1, B + 2, dtype=I32) << 1

    def cnt_searchsorted(sk):
        return jax.vmap(lambda s: jnp.searchsorted(s, qs, side="left"))(sk)
    ms, cnt_ref = timeit(jax.jit(cnt_searchsorted), (sk,), args.runs)
    emit("cnt_searchsorted", ms, f"{Wg}x{B+1} queries")

    def cnt_double_sort(sk):
        # queries tagged 0 sort before equal stream keys (side='left');
        # 2-operand sorts only (3-operand falls off the fast path)
        keyq = jnp.broadcast_to(qs * 2, (Wg, B + 1))
        keys_aug = jnp.concatenate([sk * 2 + 1, keyq], axis=-1)
        bigpay = jnp.full((Wg, n), n + B + 1, I32)
        qpay = jnp.broadcast_to(jnp.arange(B + 1, dtype=I32), (Wg, B + 1))
        pay = jnp.concatenate([bigpay, qpay], axis=-1)
        _, pay_sorted = jax.lax.sort((keys_aug, pay), num_keys=1,
                                     is_stable=False)
        pos = jnp.broadcast_to(jnp.arange(n + B + 1, dtype=I32),
                               (Wg, n + B + 1))
        pay2, pos2 = jax.lax.sort((pay_sorted, pos), num_keys=1,
                                  is_stable=False)
        return pos2[:, :B + 1] - jnp.arange(B + 1, dtype=I32)
    ms, cnt_ds = timeit(jax.jit(cnt_double_sort), (sk,), args.runs)
    emit("cnt_double_sort", ms, "2 extra lax.sorts")
    assert np.array_equal(np.asarray(cnt_ref), np.asarray(cnt_ds)), \
        "double-sort cnt != searchsorted"
    print("[p12] double-sort cnt verified", file=sys.stderr)

    # ---------------- gathers ----------------
    N = 8 * n8
    tflat = rand_pts((N,))
    idx_np = rng.integers(0, N, size=(Wg, B + 1), dtype=np.int64).astype(
        np.int32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np, axis=-1))

    def g_rows66(tflat, idx):
        pm = tflat.reshape(3 * L, N).T
        rows = jnp.take(pm, idx.reshape(-1), axis=0)
        return rows.T.reshape((3, L) + idx.shape)
    ms, _ = timeit(jax.jit(g_rows66), (tflat, idx), args.runs)
    emit("gather_rows66", ms, "(N,66) row take")

    def g_rows128(tflat, idx):
        pm = tflat.reshape(3 * L, N).T
        pm = jnp.pad(pm, ((0, 0), (0, 128 - 3 * L)))
        rows = jnp.take(pm, idx.reshape(-1), axis=0)
        return rows[:, :3 * L].T.reshape((3, L) + idx.shape)
    ms, _ = timeit(jax.jit(g_rows128), (tflat, idx), args.runs)
    emit("gather_rows128", ms, "(N,128) padded row take")

    def g_lane(tflat, idx):
        return tflat.reshape(3, L, N)[:, :, idx.reshape(-1)].reshape(
            (3, L) + idx.shape)
    ms, _ = timeit(jax.jit(g_lane), (tflat, idx), args.runs)
    emit("gather_lane", ms, "lane-axis take")

    def g_rows66_sorted(tflat, idx):
        pm = tflat.reshape(3 * L, N).T
        rows = jnp.take(pm, idx.reshape(-1), axis=0,
                        indices_are_sorted=True)
        return rows.T.reshape((3, L) + idx.shape)
    ms, _ = timeit(jax.jit(g_rows66_sorted), (tflat, idx_sorted), args.runs)
    emit("gather_rows66_sorted", ms, "sorted idx + flag")

    def g_dynslice(tflat, idx):
        pm = tflat.reshape(3 * L, N).T

        def body(c, k):
            return c, jax.lax.dynamic_slice(pm, (k, 0), (1, 3 * L))[0]
        _, rows = jax.lax.scan(body, None, idx.reshape(-1))
        return rows.T.reshape((3, L) + idx.shape)
    ms, _ = timeit(jax.jit(g_dynslice), (tflat, idx), args.runs)
    emit("gather_dynslice_scan", ms, f"{Wg*(B+1)} dynamic_slices")

    # Pallas column-gather: tbuf native (3L8, n8); block = one column per
    # grid step chosen by a prefetched scalar index; out (3L8, K) columns.
    tbuf = rand_pts((8 * n8,)).reshape(3 * L * 8, n8)
    K = Wg * (B + 1)
    colidx_np = rng.integers(0, n8, size=(K,), dtype=np.int64).astype(
        np.int32)
    colidx = jnp.asarray(colidx_np)

    def col_kernel(idx_ref, t_ref, o_ref):
        o_ref[:, :] = t_ref[:, :]

    def g_pallas_cols(tbuf, colidx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(K,),
            in_specs=[pl.BlockSpec((3 * L * 8, 1),
                                   lambda k, idx_ref: (0, idx_ref[k]),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3 * L * 8, 1), lambda k, idx_ref: (0, k),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            col_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((3 * L * 8, K), I32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(colidx, tbuf)
    try:
        ms, out = timeit(jax.jit(g_pallas_cols), (tbuf, colidx), args.runs)
        ok = np.array_equal(np.asarray(out[:, :5]),
                            np.asarray(tbuf)[:, colidx_np[:5]])
        emit("gather_pallas_cols", ms, f"{K} column DMAs verified={ok}")
    except Exception as e:  # pragma: no cover
        emit("gather_pallas_cols", -1.0, f"FAILED {type(e).__name__}: {e}")

    # ---------------- fill loop vs none ----------------
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

    # ---------------- whole-extract candidates ----------------
    wv = jnp.arange(Wg, dtype=I32)[:, None]
    tbuf_native = rand_pts((8 * n8,)).reshape(3 * L * 8, n8)

    def extract_current(skeys2_, tbuf_):
        tflat = tbuf_.reshape(3, L, 8 * n8)
        coltot = tbuf_[:, (R - 1) * F8:].reshape(3, L, Wg, C)
        inf_c = kernels.inf_stacked(curve, (Wg, 1))
        excl = jnp.concatenate([inf_c, coltot[..., :-1]], axis=-1)
        S = _hs_scan_last(excl, curve)
        Sflat = S.reshape(3, L, Wg * C)
        cnt = cnt_searchsorted(skeys2_)
        e = cnt[:, 1:] - 1
        empty = cnt[:, 1:] == cnt[:, :B]
        n0 = cnt[:, 0]
        p_all = jnp.concatenate(
            [jnp.maximum(n0 - 1, 0)[:, None], jnp.maximum(e, 0)], axis=1)
        c_all = p_all // R

        def flat_gather(src, sidx):
            pm = src.reshape(3 * L, src.shape[-1]).T
            rows = jnp.take(pm, sidx.reshape(-1), axis=0)
            return rows.T.reshape((3, L) + sidx.shape)

        f_all = wv * C + c_all
        jt = (f_all // F8) * n8 + (p_all % R) * F8 + (f_all % F8)
        Tall = flat_gather(tflat, jt)
        Sall = flat_gather(Sflat, f_all)
        Gall = kernels.padd_batch(Tall, Sall, curve)
        Ge = Gall[..., 1:]
        G0 = jnp.where((n0 == 0)[None, None, :, None],
                       inf_b[..., :1], Gall[..., :1])
        vals2 = jnp.concatenate([G0, Ge[..., :-1]], axis=-1)
        valid = jnp.concatenate(
            [jnp.ones((Wg, 1), bool), (~empty)[..., :-1]], axis=-1)
        k = 1
        while k < B:
            pad_v = jnp.broadcast_to(inf_b[..., :k], vals2[..., :k].shape)
            sh_vals = jnp.concatenate([pad_v, vals2[..., :-k]], axis=-1)
            sh_valid = jnp.concatenate(
                [jnp.zeros((Wg, k), bool), valid[..., :-k]], axis=-1)
            vals2 = jnp.where(valid[None, None], vals2, sh_vals)
            valid = valid | sh_valid
            k *= 2
        bucket = kernels.psub_batch(Ge, vals2, curve)
        return jnp.where(empty[None, None], inf_b, bucket)

    def extract_nofill(skeys2_, tbuf_):
        tflat = tbuf_.reshape(3, L, 8 * n8)
        coltot = tbuf_[:, (R - 1) * F8:].reshape(3, L, Wg, C)
        inf_c = kernels.inf_stacked(curve, (Wg, 1))
        excl = jnp.concatenate([inf_c, coltot[..., :-1]], axis=-1)
        S = _hs_scan_last(excl, curve)
        Sflat = S.reshape(3, L, Wg * C)
        cnt = cnt_double_sort(skeys2_)
        p_all = jnp.maximum(cnt - 1, 0)
        c_all = p_all // R

        def flat_gather(src, sidx):
            pm = src.reshape(3 * L, src.shape[-1]).T
            rows = jnp.take(pm, sidx.reshape(-1), axis=0)
            return rows.T.reshape((3, L) + sidx.shape)

        f_all = wv * C + c_all
        jt = (f_all // F8) * n8 + (p_all % R) * F8 + (f_all % F8)
        Tall = flat_gather(tflat, jt)
        Sall = flat_gather(Sflat, f_all)
        Gall = kernels.padd_batch(Tall, Sall, curve)
        inf_b1 = kernels.inf_stacked(curve, (Wg, B + 1))
        Gall = jnp.where((cnt == 0)[None, None], inf_b1, Gall)
        return kernels.psub_batch(Gall[..., 1:], Gall[..., :-1], curve)

    sk2 = jnp.asarray(skeys_np)  # reuse sorted keys as key2-space stand-in
    for name, fn in (("extract_current", extract_current),
                     ("extract_nofill", extract_nofill)):
        ms, _ = timeit(jax.jit(fn), (sk2, tbuf_native), args.runs)
        emit(name, ms, "one group, standalone jit")

        def scanned(sk_, tb_, fn=fn):
            def body(c, _):
                return c, fn(sk_, tb_)
            _, out = jax.lax.scan(body, None, jnp.arange(G))
            return out
        ms, _ = timeit(jax.jit(scanned), (sk2, tbuf_native), args.runs)
        emit(name + "_scanG", ms / G, f"per-group inside lax.scan x{G}")


if __name__ == "__main__":
    main()
