#!/usr/bin/env python
"""Probe 11: separate per-dispatch overhead from device time.

Probe 10 measured six heterogeneous jits at a uniform ~25-33 ms while
others measured ~0.07 ms, and extract's sub-pieces summed to 3x the
whole extract — the signature of a fixed per-dispatch cost (axon tunnel
RPC round-trip), not device time. For each piece, time
  (a) K back-to-back calls, blocking once at the end (pipelined
      dispatch: per-call ~= device time), vs
  (b) K calls blocking after each (per-call = device + round-trip).
All jits hit the persistent compile cache from probe10.
"""

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
K = 20


def measure(name, fn, args):
    out = jax.block_until_ready(fn(*args))      # warmup (compile cached)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    jax.block_until_ready(out)
    piped = (time.perf_counter() - t0) * 1e3 / K
    t0 = time.perf_counter()
    for _ in range(K):
        jax.block_until_ready(fn(*args))
    synced = (time.perf_counter() - t0) * 1e3 / K
    print(json.dumps({"stage": name, "piped_ms": round(piped, 3),
                      "synced_ms": round(synced, 3)}), flush=True)
    print(f"[probe11] {name:14s} piped {piped:8.3f} ms   "
          f"synced {synced:8.3f} ms", file=sys.stderr)


def main():
    n = int(os.environ.get("PROBE_N", 1 << 16))
    from tpu_msm.config import default_config
    from tpu_msm.constants import BN254_S12
    from tpu_msm.cuzk import decompose, kernels
    from tpu_msm.cuzk.pipeline import get_pipeline
    from tpu_msm.utils import preprocess

    curve = BN254_S12
    cfg = default_config(n, curve)
    pipe = get_pipeline(cfg)
    n = min(pipe.padded_size(n), cfg.max_points_per_pass)
    L = curve.num_limbs
    W, Wg, G = cfg.num_windows, cfg.subtask_group, cfg.num_groups
    C = min(cfg.columns, n)
    R = n // C
    B = cfg.half_columns
    F = Wg * C
    F8 = F // 8
    n8 = R * F8

    xs, ys, hw, _ = preprocess.gen_planar_inputs(curve, n, seed=3)
    hw = np.concatenate([hw, np.zeros((2, n), np.uint32)], axis=0)
    xs = jnp.asarray(xs.astype(np.int32))
    ys = jnp.asarray(ys.astype(np.int32))
    hw = jnp.asarray(hw)

    xm = kernels.encode_mont(xs, curve)
    ym = kernels.encode_mont(ys, curve)
    digits = decompose.decompose(hw, cfg).astype(jnp.int16)
    if cfg.padded_windows > W:
        digits = jnp.concatenate(
            [digits, jnp.zeros((cfg.padded_windows - W, n), jnp.int16)], 0)
    d32 = digits.astype(I32)
    keys2_all = (jnp.abs(d32) << 1) | (d32 < 0).astype(I32)
    iota_all = jnp.broadcast_to(jnp.arange(n, dtype=I32),
                                (cfg.padded_windows, n))
    skeys2_all, perm_all = jax.lax.sort(
        (keys2_all, iota_all), dimension=-1, num_keys=1, is_stable=False)
    skeys2 = jax.block_until_ready(skeys2_all[:Wg])
    perm = perm_all[:Wg]

    def to_kernel8(a):
        return (a.reshape(Wg, C, R).transpose(2, 0, 1)
                .reshape(R, 8, F8).swapaxes(0, 1).reshape(8, n8))

    perm8 = to_kernel8(perm)
    sign8 = to_kernel8(skeys2.astype(I32)) & 1
    sx8 = xm[:, perm8].reshape(L * 8, n8)
    sy8 = ym[:, perm8].reshape(L * 8, n8)
    tbuf = jax.block_until_ready(
        kernels.prefix_scan(sx8, sy8, sign8, curve, F8))
    wv = jnp.arange(Wg, dtype=I32)[:, None]

    # identical bodies to probe10 (cache hits) -------------------------
    def sscan(tbuf_):
        from tpu_msm.cuzk.pipeline_pallas import _hs_scan_last
        coltot = tbuf_[:, (R - 1) * F8:].reshape(3, L, Wg, C)
        inf_c = kernels.inf_stacked(curve, (Wg, 1))
        excl = jnp.concatenate([inf_c, coltot[..., :-1]], axis=-1)
        return _hs_scan_last(excl, curve)
    measure("sscan", jax.jit(sscan), (tbuf,))

    def search(skeys2_):
        qs = jnp.arange(1, B + 2, dtype=I32) << 1
        cnt = jax.vmap(
            lambda sk: jnp.searchsorted(sk, qs, side="left"))(skeys2_)
        e = cnt[:, 1:] - 1
        empty = cnt[:, 1:] == cnt[:, :B]
        n0 = cnt[:, 0]
        p_all = jnp.concatenate(
            [jnp.maximum(n0 - 1, 0)[:, None], jnp.maximum(e, 0)], axis=1)
        c_all = p_all // R
        f_all = wv * C + c_all
        jt = (f_all // F8) * n8 + (p_all % R) * F8 + (f_all % F8)
        return jt, f_all, empty, n0
    jsearch = jax.jit(search)
    measure("search", jsearch, (skeys2,))
    jt, f_all, empty, n0 = jax.block_until_ready(jsearch(skeys2))

    def transpose_t(tbuf_):
        tflat = tbuf_.reshape(3, L, 8 * n8)
        return tflat.reshape(3 * L, 8 * n8).T.copy()
    jtr = jax.jit(transpose_t)
    measure("transpose", jtr, (tbuf,))
    pm = jax.block_until_ready(jtr(tbuf))

    from tpu_msm.cuzk.pipeline_pallas import _hs_scan_last
    S = jax.block_until_ready(jax.jit(sscan)(tbuf))
    Sflat = jax.block_until_ready(S.reshape(3, L, Wg * C))

    def gathers(pm_, Sflat_, jt_, f_all_):
        rows_t = jnp.take(pm_, jt_.reshape(-1), axis=0)
        Tall = rows_t.T.reshape((3, L) + jt_.shape)
        sm = Sflat_.reshape(3 * L, Wg * C).T
        rows_s = jnp.take(sm, f_all_.reshape(-1), axis=0)
        Sall = rows_s.T.reshape((3, L) + f_all_.shape)
        return kernels.padd_batch(Tall, Sall, curve)
    jg = jax.jit(gathers)
    measure("gathers", jg, (pm, Sflat, jt, f_all))
    Gall = jax.block_until_ready(jg(pm, Sflat, jt, f_all))

    def fillsub(Gall_, empty_, n0_):
        inf_b = kernels.inf_stacked(curve, (Wg, B))
        Ge = Gall_[..., 1:]
        G0 = jnp.where((n0_ == 0)[None, None, :, None],
                       inf_b[..., :1], Gall_[..., :1])
        vals = jnp.concatenate([G0, Ge[..., :-1]], axis=-1)
        valid = jnp.concatenate(
            [jnp.ones((Wg, 1), bool), (~empty_)[..., :-1]], axis=-1)
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
        return jnp.where(empty_[None, None], inf_b, bucket)
    jf = jax.jit(fillsub)
    measure("fill+sub", jf, (Gall, empty, n0))
    bucket = jax.block_until_ready(jf(Gall, empty, n0))

    buckets = jax.block_until_ready(jnp.broadcast_to(
        bucket[:, :, :1, :], (3, L, cfg.padded_windows, B)).copy())
    T = min(cfg.pbpr_threads, B)
    jp1 = jax.jit(functools.partial(kernels.pbpr_stage1, curve=curve,
                                    threads=T))
    measure("pbpr_stage1", jp1, (buckets,))
    m, g = jax.block_until_ready(jp1(buckets))

    def stage2(m_, g_):
        bits = max((T - 1).bit_length(), 1)
        t_ids = jnp.arange(T, dtype=I32)
        inf_t = kernels.inf_stacked(curve, (cfg.padded_windows, 1, T))
        masked = [g_[:, :, :, None, :]]
        for k in range(bits):
            has = ((t_ids >> k) & 1).astype(bool)
            masked.append(jnp.where(has[None, None, None, None],
                                    m_[:, :, :, None, :], inf_t))
        allm = jnp.concatenate(masked, axis=3)
        return _hs_scan_last(allm, curve)[..., -1]
    measure("pbpr_stage2", jax.jit(stage2), (m, g))


if __name__ == "__main__":
    main()
