"""Pallas-backed MSM device pipeline (the production TPU path).

Same five-stage structure as cuzk/pipeline.py (the XLA reference path)
but with the hot kernels in Pallas (cuzk/kernels.py) and the SMVP
re-formulated as **prefix sums + group subtraction**:

  Stage 1  encode_mont kernel + decompose (XLA bit-slicing)
  Stage 2  per window: stable argsort of bucket keys (XLA sort — the
           counting-sort transpose of transpose.metal:8-65)
  Stage 3  prefix_scan kernel: ONE sequential grid over the sorted point
           stream computing unsegmented running prefix sums T.
           Bucket b of window w = G(e_b) - G(s_b - 1), where
           G(p) = T[p] + S[col(p)] (S = exclusive column-total prefix)
           and s_b/e_b come from searchsorted on the sorted keys.
           The subtraction is one complete-add with negated y — so the
           signed-bucket handling of smvp.metal:46-105, the atomic
           transpose, and the reference's per-bucket serial loops all
           collapse into gathers + three batched point adds.
  Stage 4  pbpr_stage1 kernel (cuZK Alg.4 m/g split, pbpr.metal:33-96)
           + stage-2 offset combination via a bit-decomposed weighted
           sum: sum_t t*m_t = sum_k 2^k * (sum_{t: bit k} m_t), computed
           with log-depth Hillis-Steele scans of padd_batch — replacing
           the reference's per-thread double_and_add (pbpr.metal:16-31).
  Stage 5  host Horner over per-window sums (pipeline.py MSMPipeline).

Everything from stage 1-4 runs inside ONE jitted program; only the W
window sums leave the device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MSMConfig
from ..constants import CurveParams
from ..ops.complete import ProjPoint
from . import decompose, kernels

I32 = jnp.int32


def _hs_scan_last(p: jnp.ndarray, curve: CurveParams,
                  inclusive: bool = True) -> jnp.ndarray:
    """Hillis-Steele inclusive prefix scan of points along the last axis.

    p: (3, L, ..., K) stacked lazy points. log2(K) padd_batch calls, all
    at full width (shifted-in lanes are infinity, the monoid identity)."""
    K = p.shape[-1]
    inf = kernels.inf_stacked(curve, p.shape[2:])
    k = 1
    while k < K:
        shifted = jnp.concatenate(
            [inf[..., :k], p[..., :-k]], axis=-1)
        p = kernels.padd_batch(p, shifted, curve)
        k *= 2
    return p


def _windows_device_pallas(xs: jnp.ndarray, ys: jnp.ndarray,
                           halfwords: jnp.ndarray, *,
                           cfg: MSMConfig) -> ProjPoint:
    curve = cfg.curve
    L = curve.num_limbs
    n = (2 if cfg.glv else 1) * xs.shape[-1]   # stream lanes (2x under glv)
    W, Wg, G = cfg.num_windows, cfg.subtask_group, cfg.num_groups
    C = min(cfg.columns, n)
    R = n // C
    B = cfg.half_columns

    F = Wg * C                  # lanes per kernel step
    if F % 1024 and n != F:
        # Mosaic block constraint: the (8, F/8) kernel tile needs its lane
        # dim divisible by 128 unless the block spans the whole array
        # (R == 1). Too-narrow streams (only n < 1024 with the default
        # schedule) take the XLA path — tiny inputs are dispatch-latency
        # bound anyway, the kernels buy nothing there.
        from .pipeline import _windows_device
        return _windows_device(xs, ys, halfwords, cfg=cfg)

    # ---- stage 1: Montgomery encode + signed decompose ----
    xm = kernels.encode_mont(xs, curve)
    ym = kernels.encode_mont(ys, curve)
    if cfg.glv:
        from . import glv as glv_dev
        xm, ym, digits = glv_dev.apply_glv(xm, ym, halfwords, cfg)
        digits = digits.astype(jnp.int16)
    else:
        # digits stored int16 (|d| <= 2^(s-1) <= 2^15 fits exactly) — at
        # 2^24 the digit buffer is 0.5 GB instead of 1 GB
        digits = decompose.decompose(halfwords, cfg).astype(jnp.int16)
    if cfg.padded_windows > W:
        digits = jnp.concatenate(
            [digits, jnp.zeros((cfg.padded_windows - W, n), jnp.int16)],
            axis=0)

    inf_b = kernels.inf_stacked(curve, (Wg, B))

    F8 = F // 8                 # kernel tile is (8, F8) — full sublanes
    n8 = R * F8
    wv = jnp.arange(Wg, dtype=I32)[:, None]

    def to_kernel8(a):
        """(Wg, n) global-order per-window array -> (8, n8) kernel-layout:
        element (s, r*F8 + v) = a[w, c*R + r] with f = s*F8+v = w*C+c.
        Pure index-space transposes — cheap next to the limb gathers."""
        return (a.reshape(Wg, C, R).transpose(2, 0, 1)
                .reshape(R, 8, F8).swapaxes(0, 1).reshape(8, n8))

    # ---- stage 2: ONE batched sort for ALL windows (hoisted out of the
    # group loop — per-group sorts of few rows run sublane-starved). The
    # sign bit is packed INTO the sort key (key2 = |d|<<1 | sign) so one
    # fast 2-operand sort yields keys, signs, and the permutation
    # together: element-gathers of keys/signs by perm cost ~100 ns/el on
    # this chip, and a 3-operand lax.sort falls off the fast bitonic
    # path entirely (all profiled).
    d32 = digits.astype(I32)                                 # (Wp, n)
    keys2_all = (jnp.abs(d32) << 1) | (d32 < 0).astype(I32)
    iota_all = jnp.broadcast_to(jnp.arange(n, dtype=I32),
                                (cfg.padded_windows, n))
    skeys2_all, perm_all = jax.lax.sort(
        (keys2_all, iota_all), dimension=-1, num_keys=1, is_stable=False)

    def group_body(_, xs_slices):
        skeys2, perm = xs_slices                             # (Wg, n) each
        perm8 = to_kernel8(perm)
        sign8 = to_kernel8(skeys2) & 1
        sx8 = xm[:, perm8].reshape(L * 8, n8)
        sy8 = ym[:, perm8].reshape(L * 8, n8)

        # ---- stage 3: prefix scan + bucket extraction ----
        tbuf = kernels.prefix_scan(sx8, sy8, sign8, curve, F8)  # (3L8, n8)
        tflat = tbuf.reshape(3, L, 8 * n8)

        # S = exclusive column-total prefix; extraction gathers T and S
        # separately at the same bucket-end slots and combines with one
        # (Wg, B+1)-lane padd (cheaper than adding S to all n positions)
        coltot = tbuf[:, (R - 1) * F8:].reshape(3, L, Wg, C)
        inf_c = kernels.inf_stacked(curve, (Wg, 1))
        excl = jnp.concatenate([inf_c, coltot[..., :-1]], axis=-1)
        S = _hs_scan_last(excl, curve)                       # exclusive
        Sflat = S.reshape(3, L, Wg * C)

        qs = jnp.arange(1, B + 2, dtype=I32) << 1            # key2 space
        cnt = jax.vmap(
            lambda sk: jnp.searchsorted(sk, qs, side="left"))(skeys2)
        e = cnt[:, 1:] - 1                                   # (Wg, B)
        empty = cnt[:, 1:] == cnt[:, :B]
        n0 = cnt[:, 0]                                       # |key-0 region|

        # one combined gather: slot 0 is the key-0 region end (the G0
        # seed), slots 1..B the bucket ends — a separate 1-element G0
        # gather serializes the pipeline for ~30 ms/group (profiled)
        p_all = jnp.concatenate(
            [jnp.maximum(n0 - 1, 0)[:, None], jnp.maximum(e, 0)], axis=1)
        c_all = p_all // R                                   # (Wg, B+1)

        def flat_gather(src, idx):                           # idx (Wg, K)
            # points-major row gather: transpose the (3, L, N) stream to
            # (N, 3L) and fetch whole point rows. take_along_axis along
            # the last axis lowers to a ~48 ns/element scalar loop in
            # this context (67% of device time at 2^16, profiled); the
            # row form costs ~nothing over the no-gather floor.
            pm = src.reshape(3 * L, src.shape[-1]).T         # (N, 3L)
            rows = jnp.take(pm, idx.reshape(-1), axis=0)     # (K, 3L)
            return rows.T.reshape((3, L) + idx.shape)

        f_all = wv * C + c_all
        jt = (f_all // F8) * n8 + (p_all % R) * F8 + (f_all % F8)
        Tall = flat_gather(tflat, jt)                        # (3,L,Wg,B+1)
        Sall = flat_gather(Sflat, f_all)
        Gall = kernels.padd_batch(Tall, Sall, curve)

        Ge = Gall[..., 1:]                                   # (3,L,Wg,B)
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
        bucket = jnp.where(empty[None, None], inf_b, bucket)
        return None, bucket                                  # (3,L,Wg,B)

    _, bk = jax.lax.scan(
        group_body, None,
        (skeys2_all.reshape(G, Wg, n), perm_all.reshape(G, Wg, n)))
    # (G, 3, L, Wg, B) -> (3, L, Wp, B)
    buckets = jnp.moveaxis(bk, 0, 2).reshape(3, L, cfg.padded_windows, B)

    # ---- stage 4: PBPR ----
    T = min(cfg.pbpr_threads, B)
    Bt = B // T
    m, g = kernels.pbpr_stage1(buckets, curve, T)            # (3,L,Wp,T)

    # stage 4b: G_w = sum_t g_t + Bt * sum_t t*m_t
    bits = max((T - 1).bit_length(), 1)
    t_ids = jnp.arange(T, dtype=I32)
    inf_t = kernels.inf_stacked(curve, (cfg.padded_windows, 1, T))
    masked = [g[:, :, :, None, :]]
    for k in range(bits):
        has = ((t_ids >> k) & 1).astype(bool)
        masked.append(jnp.where(has[None, None, None, None],
                                m[:, :, :, None, :], inf_t))
    allm = jnp.concatenate(masked, axis=3)       # (3,L,Wp,bits+1,T)
    totals = _hs_scan_last(allm, curve)[..., -1]  # (3,L,Wp,bits+1)
    g_tot = totals[..., 0]
    acc = kernels.inf_stacked(curve, (cfg.padded_windows,))
    for k in range(bits - 1, -1, -1):             # Horner: sum 2^k S_k
        acc = kernels.pdbl_batch(acc, curve)
        acc = kernels.padd_batch(acc, totals[..., 1 + k], curve)
    for _ in range(max(Bt.bit_length() - 1, 0)):  # * Bt
        acc = kernels.pdbl_batch(acc, curve)
    gw = kernels.padd_batch(g_tot, acc, curve)    # (3, L, Wp)
    return ProjPoint(gw[0], gw[1], gw[2])
