"""Pallas-backed MSM device pipeline (the production TPU path).

Same five-stage structure as cuzk/pipeline.py (the XLA reference path)
but with the hot kernels in Pallas (cuzk/kernels.py) and the SMVP
re-formulated as **prefix sums + group subtraction**:

  Stage 1  encode_mont kernel + decompose_digits kernel (signed windows,
           carry, fused — convert_...metal:16-122).
  Stage 2  ONE batched stable sort of (sign-packed) bucket keys for ALL
           windows (the counting-sort transpose of transpose.metal:8-65),
           plus a BLOCK-LEVEL double-sort rank computation producing
           every bucket boundary cnt[w, b] = #(keys < b) from the
           sorted keys' per-64-element block maxima (n/64 + B + 1 sort
           lanes instead of the r4 full-size n + B + 1 — roofline item
           2) — replacing per-group searchsorted (a log2(n)-step while
           loop on device).
  Stage 3  prefix_scan kernel: ONE sequential grid over the sorted point
           stream computing unsegmented running prefix sums T, then the
           col_prefix kernel for the exclusive column-total prefix S.
           The global prefix at sorted position p is
           G(p) = T[p] + S[col(p)]. Bucket b of window w is the
           CONSECUTIVE DIFFERENCE G(cnt[b+1]-1) - G(cnt[b]-1): one
           gather + one point add + one point subtract. Empty buckets
           need no masking at all — both gathers hit the same position
           and the complete-formula subtraction yields the identity
           (P - P = inf is exact under RCB complete adds). This replaces
           round 1's log2(B)-round fill-forward chain, the validity
           masks, and the signed-bucket scatter of smvp.metal:46-105.
  Stage 4  pbpr_full kernel: the whole cuZK Alg.4 bucket reduction —
           stage 1 m/g running sums (pbpr.metal:33-96) AND the weighted
           combination sum_t t*m_t (pbpr.metal:98-148) — in ONE kernel,
           using the suffix-sum identity sum_t t*m_t = sum_{j>=1} S_j
           (S = suffix sums of m) instead of per-thread double_and_add.
  Stage 5  host Horner over per-window sums (pipeline.py MSMPipeline).

Everything from stage 1-4 runs inside ONE jitted program; only the W
window sums leave the device. The whole program dispatches ~40 + ~30 per
window-group op executions — the round-1 formulation dispatched ~2,400,
and on this runtime wall time is host-dispatch-bound at ~47 us/op
(benches/probe13.py, benches/trace_e2e.py), not device-bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MSMConfig
from ..constants import CurveParams
from ..ops.complete import ProjPoint
from . import kernels

I32 = jnp.int32


def _hs_scan_last(p: jnp.ndarray, curve: CurveParams,
                  inclusive: bool = True) -> jnp.ndarray:
    """Hillis-Steele inclusive prefix scan of points along the last axis.

    p: (3, L, ..., K) stacked lazy points. log2(K) padd_batch calls, all
    at full width (shifted-in lanes are infinity, the monoid identity).
    Kept for benches and as the XLA twin of the col_prefix kernel."""
    K = p.shape[-1]
    inf = kernels.inf_stacked(curve, p.shape[2:])
    k = 1
    while k < K:
        shifted = jnp.concatenate(
            [inf[..., :k], p[..., :-k]], axis=-1)
        p = kernels.padd_batch(p, shifted, curve)
        k *= 2
    return p


def _rank_queries(data: jnp.ndarray, B: int) -> jnp.ndarray:
    """r[w, j] = #(data[w, :] < 2*(j+1)) for j = 0..B via the double-sort
    rank trick: data keys map to odd slots 2k+1 and the B+1 grid queries
    to even slots 4(q+1), so a query's sorted position equals (#data
    below it) + (its own rank). The second sort brings the query
    payloads back to the front in rank order. On this runtime two flat
    sorts are ~50x cheaper than searchsorted's log2(n)-iteration while
    loop (benches/probe12.py, probe13.py)."""
    Wp, m = data.shape
    qs2 = (jnp.arange(1, B + 2, dtype=I32) << 2)          # queries, even
    keys_aug = jnp.concatenate(
        [data * 2 + 1, jnp.broadcast_to(qs2, (Wp, B + 1))], axis=-1)
    pay = jnp.concatenate(
        [jnp.full((Wp, m), m + B + 1, I32),
         jnp.broadcast_to(jnp.arange(B + 1, dtype=I32), (Wp, B + 1))],
        axis=-1)
    _, pay_s = jax.lax.sort((keys_aug, pay), num_keys=1, is_stable=False)
    pos = jnp.broadcast_to(jnp.arange(m + B + 1, dtype=I32),
                           (Wp, m + B + 1))
    _, pos2 = jax.lax.sort((pay_s, pos), num_keys=1, is_stable=False)
    return pos2[:, :B + 1] - jnp.arange(B + 1, dtype=I32)


_CNT_BLOCK = 64


def _bucket_counts(keys2: jnp.ndarray, n: int, B: int,
                   skeys2: jnp.ndarray | None = None) -> jnp.ndarray:
    """cnt[w, j] = #(keys2[w, :] < 2*(j+1)) for j = 0..B — i.e. the end
    of the digit-0 region (j=0) and of every bucket's key region
    (j = bucket value), for all windows at once.

    When the ALREADY-SORTED keys are available (`skeys2`, free from the
    pipeline's main sort), the ranks are computed at BLOCK level: the
    per-K-element block maxima M[w, t] = skeys2[w, (t+1)K-1] are a
    sorted summary, and #(keys < q) = K * b + #(els < q in block b)
    where b = #(block maxima < q) — sortedness makes block b the unique
    straddler (every later block's min >= block b's max >= q). The
    double-sort rank trick then runs on n/K + B + 1 lanes instead of
    n + B + 1 (16-57x less sort traffic at the headline sizes — the r4
    roofline's item 2, two of three full-size sorts were redundant),
    plus one (B+1)-row gather of the straddling blocks and a K-lane
    compare-reduce. Falls back to flat ranks on tiny/odd sizes."""
    K = _CNT_BLOCK
    if skeys2 is None or n % K or n // K < 2:
        return _rank_queries(keys2, B)
    Wp = keys2.shape[0]
    nb = n // K
    blocks = skeys2.reshape(Wp, nb, K)
    cnt_b = _rank_queries(blocks[:, :, K - 1], B)            # (Wp, B+1)
    b = jnp.minimum(cnt_b, nb - 1)
    flat_idx = (jnp.arange(Wp, dtype=I32)[:, None] * nb + b).reshape(-1)
    rows = jnp.take(blocks.reshape(Wp * nb, K), flat_idx, axis=0)
    rows = rows.reshape(Wp, B + 1, K)                        # straddlers
    q = (jnp.arange(1, B + 2, dtype=I32) * 2)[None, :, None]
    partial = jnp.sum((rows < q).astype(I32), axis=-1)
    return b * K + partial


def _windows_device_pallas(xs: jnp.ndarray, ys: jnp.ndarray,
                           halfwords: jnp.ndarray, *,
                           cfg: MSMConfig, w_shards: int = 1,
                           w_index=None) -> ProjPoint:
    curve = cfg.curve
    L = curve.num_limbs
    # narrow wire dtypes widen on device (see cuzk/pipeline.py): lets
    # callers stage xs/ys int16 + halfwords uint16 at half the h2d bytes
    xs = xs.astype(I32)
    ys = ys.astype(I32)
    halfwords = halfwords.astype(jnp.uint32)
    n = (2 if cfg.glv else 1) * xs.shape[-1]   # stream lanes (2x under glv)
    W, Wg, G = cfg.num_windows, cfg.subtask_group, cfg.num_groups
    C = min(cfg.columns, n)
    R = n // C
    B = cfg.half_columns
    Wp = cfg.padded_windows

    F = Wg * C                  # lanes per kernel step
    if F % 1024 and n != F:
        # Mosaic block constraint: the (8, F/8) kernel tile needs its lane
        # dim divisible by 128 unless the block spans the whole array
        # (R == 1). Too-narrow streams (only n < 1024 with the default
        # schedule) take the XLA path — tiny inputs are dispatch-latency
        # bound anyway, the kernels buy nothing there.
        from .pipeline import _windows_device
        return _windows_device(xs, ys, halfwords, cfg=cfg,
                               w_shards=w_shards, w_index=w_index)

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
        digits = kernels.decompose_digits(
            halfwords.astype(I32), cfg.window_size, W).astype(jnp.int16)
    if Wp > W:
        digits = jnp.concatenate(
            [digits, jnp.zeros((Wp - W, n), jnp.int16)], axis=0)
    if w_shards > 1:
        # window-axis shard: keep only this shard's contiguous block of
        # window GROUPS — every later stage (sort, boundary counts,
        # extraction, PBPR) then runs on Wp/w_shards windows. Group
        # granularity keeps the in-group lane math (f = (w % Wg)*C + c)
        # identical because Wg | Wp_local.
        if G % w_shards:
            raise ValueError("w_shards must divide num_groups")
        Wp = Wp // w_shards
        G = G // w_shards
        digits = jax.lax.dynamic_slice_in_dim(
            digits, w_index * Wp, Wp, axis=0)

    F8 = F // 8                 # kernel tile is (8, F8) — full sublanes
    n8 = R * F8

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
    # payload = (original index << 1) | sign: the sign bit rides the
    # permutation, so the group loop needs ONE kernel-layout transpose
    # (of the payload) instead of two (perm + skeys-for-sign) and never
    # slices the sorted keys per group — saves a (Wg, n) transpose +
    # dynamic-slice pair per window group (was ~15 ms of the 42 ms
    # to_kernel8 formatting at 2^20). perm < max_points_per_pass
    # <= 2^23, so (perm << 1 | sign) fits int32.
    iota2_all = (jnp.broadcast_to(
        jnp.arange(n, dtype=I32), (Wp, n)) << 1) | (keys2_all & 1)
    skeys2_all, pay_all = jax.lax.sort(
        (keys2_all, iota2_all), dimension=-1, num_keys=1, is_stable=False)

    # ---- stage 2b: every bucket boundary for every window, hoisted ----
    cnt_all = _bucket_counts(keys2_all, n, B, skeys2_all)    # (Wp, B+1)
    p_all = jnp.maximum(cnt_all - 1, 0)
    c_all = p_all // R
    f_all = (jnp.arange(Wp, dtype=I32) % Wg)[:, None] * C + c_all
    jt_all = (f_all // F8) * n8 + (p_all % R) * F8 + (f_all % F8)

    inf_b1 = kernels.inf_stacked(curve, (Wg, 1))

    def flat_gather(src, idx):                               # idx (Wg, K)
        # points-major row gather: transpose the (3, L, N) stream to
        # (N, 3L) and fetch whole point rows. take_along_axis along
        # the last axis lowers to a ~48 ns/element scalar loop in
        # this context (67% of device time at 2^16, profiled); the
        # row form costs ~nothing over the no-gather floor.
        pm = src.reshape(3 * L, src.shape[-1]).T             # (N, 3L)
        rows = jnp.take(pm, idx.reshape(-1), axis=0)         # (K, 3L)
        return rows.T.reshape((3, L) + idx.shape)

    # points-major row table for the BIG stream gather: one row per
    # point (x limbs || y limbs). `xm[:, perm8]` element-gathers
    # L*8*n8 independent lookups per coordinate per group (the same
    # ~48-100 ns/element scalar-loop lowering flat_gather documents);
    # fetching whole point ROWS by sorted position and transposing back
    # to the kernel layout moves the identical bytes as one
    # vectorizable take + transpose. The row gather is PER-ROW latency
    # bound (~35 ns/row, fusion.34 = 558 ms of the 834 ms @2^20 —
    # benches/probe15.py), so rows are packed as int32 words holding a
    # limb PAIR each (canonical limbs < 2^w <= 2^13 fit 16 bits
    # exactly): half the gathered elements per point, same bytes; the
    # scan kernel unpacks with VPU shifts (kernels.prefix_scan
    # packed=True). Only a win when the row table outgrows on-chip
    # caching and the gather goes latency-bound: measured 2^20
    # 834.7 -> 753.7 ms, but 2^16 60.1 -> 67.5 ms (small table, gather
    # already fast, the per-limb unpack only taxes the compute-bound
    # scan) — so gated on stream size. Odd-L curves use the int16 rows.
    packed = (L % 2 == 0) and n >= (1 << 18)
    rows16 = jnp.concatenate([xm, ym], axis=0).astype(jnp.int16).T
    if packed:
        pts_rows = jax.lax.bitcast_convert_type(
            rows16.reshape(rows16.shape[0], L, 2), jnp.int32)  # (n, L)
    else:
        pts_rows = rows16                                      # (n, 2L)

    def group_body(slices):
        pay, cnt_g, f_g, jt_g = slices                       # (Wg, ...) each
        p8 = to_kernel8(pay)
        perm8 = p8 >> 1
        sign8 = p8 & 1
        srows = jnp.take(pts_rows, perm8.reshape(-1), axis=0)
        nw = pts_rows.shape[1]                               # L or 2L words
        sxy = srows.reshape(8, n8, nw).transpose(2, 0, 1)    # (nw, 8, n8)
        sx8 = sxy[:nw // 2].reshape(nw // 2 * 8, n8)
        sy8 = sxy[nw // 2:].reshape(nw // 2 * 8, n8)

        # ---- stage 3: prefix scan + no-fill bucket extraction ----
        # tbuf and S come back int16 (limb bound (-2^w, 2^(w+1)), see
        # kernels.prefix_scan) — the scan output, its boundary gathers,
        # and the bucket stream below are the pipeline's biggest
        # custom-call byte streams, and on this runtime wall overhead
        # scales with custom-call boundary bytes (r3/r4 traces).
        tbuf = kernels.prefix_scan(sx8, sy8, sign8, curve, F8,
                                   packed=packed)            # (3L8, n8)
        tflat = tbuf.reshape(3, L, 8 * n8)
        coltot = tbuf[:, (R - 1) * F8:].reshape(3, L, Wg, C)
        S = kernels.col_prefix(coltot, curve)                # exclusive
        Sflat = S.reshape(3, L, Wg * C)

        # G(p) gathered ONLY at the B+1 region ends: combine T and S at
        # the gathered slots with one (Wg, B+1)-lane padd (cheaper than
        # adding S to all n positions)
        Tall = flat_gather(tflat, jt_g)                      # (3,L,Wg,B+1)
        Sall = flat_gather(Sflat, f_g)
        Gall = kernels.padd_batch(Tall, Sall, curve)
        # cnt == 0 means nothing sorts below this boundary: G(-1) = inf
        Gp = jnp.where((cnt_g == 0)[None, None], inf_b1, Gall)

        # bucket b (multiplier b+1) = G(end of its region) - G(end of
        # the previous region); empty buckets cancel to inf by the
        # complete-subtraction identity — no masks, no fill. int16 out:
        # halves the (3, L, Wp, B) bucket stream into PBPR (and the fori
        # carry that accumulates it).
        bucket = kernels.psub_batch(Gp[..., 1:], Gp[..., :-1], curve,
                                    out_dtype=tbuf.dtype)
        return bucket                                        # (3,L,Wg,B)

    bdt = jnp.int16 if curve.log_limb_size <= 13 else I32

    if G == 1:
        buckets = group_body((pay_all, cnt_all, f_all, jt_all))
        buckets = buckets.reshape(3, L, Wp, B)
    elif cfg.group_loop == "fori":
        # lax.fori_loop: ONE traced/lowered body regardless of G (the
        # unrolled form's host lowering and executable size scale with
        # G — ~75 s and ~1.5 MB of embedded Mosaic per group at L=22).
        # NOT lax.scan: a scan whose body contains pallas custom-calls
        # wedges this runtime's first execution indefinitely (bisected
        # on-device in r3); fori lowers to a while-op instead.
        def fbody(g, bks):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(
                a, g * Wg, Wg, axis=0)
            bucket = group_body((sl(pay_all), sl(cnt_all),
                                 sl(f_all), sl(jt_all)))
            return jax.lax.dynamic_update_slice_in_dim(
                bks, bucket, g * Wg, axis=2)
        buckets = jax.lax.fori_loop(
            0, G, fbody, jnp.zeros((3, L, Wp, B), bdt))
    else:
        # STATIC python unroll over window groups, NOT lax.scan: a scan
        # whose body contains pallas custom-calls wedges this runtime's
        # first execution indefinitely (bisected on-device in r3:
        # every kernel runs standalone, the G=1 pipeline runs, any
        # G>1 scan-wrapped pipeline never completes — while the pure-
        # XLA scan body is fine). The unrolled graphs are ~30 XLA ops
        # per group and the Mosaic kernels compile once per shape, so
        # compile cost stays modest; XLA serializes the group
        # subgraphs, keeping the peak-memory profile of the scan.
        parts = [group_body((pay_all[g * Wg:(g + 1) * Wg],
                             cnt_all[g * Wg:(g + 1) * Wg],
                             f_all[g * Wg:(g + 1) * Wg],
                             jt_all[g * Wg:(g + 1) * Wg]))
                 for g in range(G)]
        # G x (3, L, Wg, B) -> (3, L, Wp, B)
        buckets = jnp.concatenate(parts, axis=2)

    # ---- stage 4: PBPR, one kernel ----
    T = min(cfg.pbpr_threads, B)
    gw = kernels.pbpr_full(buckets, curve, T)                # (3, L, Wp)
    return ProjPoint(gw[0], gw[1], gw[2])
