"""Pipeline stage 3: bucket accumulation (the SMVP).

Analogue of shader/cuzk/smvp.metal:14-107 — where the reference assigns one
GPU thread per (subtask, bucket-pair) and serially walks that bucket's CSC
row (`sum = sum + b`, smvp.metal:61-71), the TPU formulation turns the
whole thing into one fixed-shape segmented reduction over the sorted point
stream (SURVEY.md §7 "SMVP becomes ... a masked segmented reduction"):

  1. sort each window's points by bucket key (cuzk/sort.py);
  2. lay the sorted stream out column-major as an (R rows x C columns)
     grid and run ONE sequential segmented scan down the rows with
     `lax.fori_loop` — each step is a single complete mixed-add
     (ops/complete.py pmadd) vectorized over (subtask_group x C) lanes,
     so total work is exactly n point-adds per window (work-optimal; an
     associative_scan would do ~2n and unroll log(n) levels into the
     graph);
  3. lanes that finish a bucket run (key != next key in global order)
     scatter their running sum into the bucket array — conflict-free,
     because each bucket's run ends at exactly one global position;
  4. runs crossing column boundaries are stitched by a segmented
     associative_scan over the C per-column trailing sums (log2(C)
     levels of cheap (Wg x C)-wide complete adds), whose prefixes are
     then injected into the first-run bucket of each continuing column.

The signed-bucket fold of smvp.metal:46-105 (negative digit => add -P to
bucket |d|) is one lane select of y vs 2p-y at element construction.
Digit-0 elements land in bucket slot 0, a discard slot dropped on return
(their sums are real curve points — just meaningless — so no special
encoding is needed; the complete formulas have no invalid inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MSMConfig
from ..ops import lazy
from ..ops.complete import ProjPoint, padd, pmadd, proj_infinity, select
from . import sort

I32 = jnp.int32


def _dyn(arr, i):
    return jax.lax.dynamic_index_in_dim(arr, i, axis=0, keepdims=False)


def bucket_accumulate(xs_m: jnp.ndarray, ys_m: jnp.ndarray,
                      digits: jnp.ndarray, cfg: MSMConfig) -> ProjPoint:
    """Accumulate bucket sums for one window group.

    xs_m, ys_m: (L, n) int32 Montgomery affine coordinates (canonical
    limbs, value < 2p), shared across windows.
    digits:     (Wg, n) int32 signed digits for this group's windows.
    Returns bucket sums as a ProjPoint with batch shape (Wg, B), slot b
    holding the sum for bucket b+1 (multiplier b+1).
    """
    curve = cfg.curve
    C = min(cfg.columns, digits.shape[-1])
    L = curve.num_limbs
    Wg, n = digits.shape
    if n % C:
        raise ValueError(f"n={n} must be a multiple of columns={C}")
    R = n // C
    B = cfg.half_columns

    keys, neg_mask = sort.bucket_keys(digits)
    skeys, perm = sort.sort_by_bucket(keys)
    ssign = jnp.take_along_axis(neg_mask, perm, axis=-1)

    # negate y where the digit was negative (2p - y keeps values positive)
    sy_all = ys_m[:, perm]                                       # (L,Wg,n)
    sy_all = jnp.where(ssign[None], lazy.neg(sy_all, curve, 2), sy_all)

    # gather and lay out column-major: global position g = c*R + r
    sx = jnp.moveaxis(xs_m[:, perm].reshape(L, Wg, C, R), -1, 0)  # (R,L,Wg,C)
    sy = jnp.moveaxis(sy_all.reshape(L, Wg, C, R), -1, 0)
    kt = jnp.moveaxis(skeys.reshape(Wg, C, R), -1, 0)             # (R,Wg,C)

    # run-boundary masks (global order: down each column, then next column)
    first_next = jnp.concatenate(
        [kt[0, :, 1:], jnp.full((Wg, 1), -1, I32)], axis=-1)      # (Wg, C)
    next_keys = jnp.concatenate([kt[1:], first_next[None]], axis=0)
    ends = kt != next_keys                                        # (R,Wg,C)
    brk = jnp.concatenate(
        [jnp.ones((1, Wg, C), bool), kt[1:] != kt[:-1]], axis=0)  # local starts
    allsame = ~jnp.any(brk[1:], axis=0)                           # (Wg, C)

    one_m = jnp.broadcast_to(lazy.mont_one(curve, 2), (L, Wg, C))
    w_idx = jnp.arange(Wg)[:, None]
    sentinel = jnp.int32(B + 1)

    def body(r, state):
        carry, bucket = state
        k = _dyn(kt, r)
        x = _dyn(sx, r)
        y = _dyn(sy, r)
        summed = pmadd(carry, x, y, curve, unroll=cfg.unroll_resolved)
        val = select(_dyn(brk, r), ProjPoint(x, y, one_m), summed)
        idx = jnp.where(_dyn(ends, r), k, sentinel)
        bucket = ProjPoint(
            bucket.x.at[:, w_idx, idx].set(val.x, mode="drop"),
            bucket.y.at[:, w_idx, idx].set(val.y, mode="drop"),
            bucket.z.at[:, w_idx, idx].set(val.z, mode="drop"))
        return val, bucket

    carry0 = proj_infinity(curve, (Wg, C))
    bucket0 = proj_infinity(curve, (Wg, B + 1))
    trailing, bucket = jax.lax.fori_loop(0, R, body, (carry0, bucket0))

    # ---- cross-column stitching (phase 2) ----
    key_first, key_last = kt[0], kt[-1]
    cont = jnp.concatenate(
        [jnp.zeros((Wg, 1), bool), key_last[:, :-1] == key_first[:, 1:]],
        axis=-1)                                                  # (Wg, C)
    segflag = (~allsame) | (~cont)

    def comb(a, b):
        # leaves carry the scan (column) axis FIRST: points (c, L, Wg),
        # flags (c, Wg); point ops expect limb axis first
        pa = ProjPoint(*(jnp.moveaxis(a[k], 1, 0) for k in ("x", "y", "z")))
        pb = ProjPoint(*(jnp.moveaxis(b[k], 1, 0) for k in ("x", "y", "z")))
        s = padd(pa, pb, curve, unroll=False)
        v = select(b["f"], pb, s)
        return {"x": jnp.moveaxis(v.x, 0, 1), "y": jnp.moveaxis(v.y, 0, 1),
                "z": jnp.moveaxis(v.z, 0, 1), "f": a["f"] | b["f"]}

    elems = {"x": jnp.moveaxis(trailing.x, -1, 0),   # (C, L, Wg)
             "y": jnp.moveaxis(trailing.y, -1, 0),
             "z": jnp.moveaxis(trailing.z, -1, 0),
             "f": jnp.moveaxis(segflag, -1, 0)}      # (C, Wg)
    scanned = jax.lax.associative_scan(comb, elems, axis=0)
    sx_s = jnp.moveaxis(scanned["x"], 0, -1)         # (L, Wg, C)
    sy_s = jnp.moveaxis(scanned["y"], 0, -1)
    sz_s = jnp.moveaxis(scanned["z"], 0, -1)
    # exclusive prefix: P_c = trailing-chain sum arriving at column c
    inf1 = proj_infinity(curve, (Wg, 1))
    P = ProjPoint(jnp.concatenate([inf1.x, sx_s[..., :-1]], -1),
                  jnp.concatenate([inf1.y, sy_s[..., :-1]], -1),
                  jnp.concatenate([inf1.z, sz_s[..., :-1]], -1))

    cont_next = jnp.concatenate([cont[:, 1:], jnp.zeros((Wg, 1), bool)], -1)
    inject = cont & ((~allsame) | (~cont_next))

    cur = ProjPoint(bucket.x[:, w_idx, key_first],
                    bucket.y[:, w_idx, key_first],
                    bucket.z[:, w_idx, key_first])
    fixed = padd(cur, P, curve, unroll=False)
    vals = select(inject, fixed, cur)
    iidx = jnp.where(inject, key_first, sentinel)
    bucket = ProjPoint(bucket.x.at[:, w_idx, iidx].set(vals.x, mode="drop"),
                       bucket.y.at[:, w_idx, iidx].set(vals.y, mode="drop"),
                       bucket.z.at[:, w_idx, iidx].set(vals.z, mode="drop"))

    # drop the discard slot (digit == 0)
    return ProjPoint(bucket.x[..., 1:], bucket.y[..., 1:], bucket.z[..., 1:])
