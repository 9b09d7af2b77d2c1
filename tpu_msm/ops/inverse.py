"""Batched modular inversion and projective→affine normalization.

The reference has no device-side inversion: `metal_variable_base_msm`
returns a projective point (metal_msm.rs:642-695) and leans on arkworks
for any normalization in tests/consumers. Here inversion is a first-class
device op because (a) the public API can hand back affine coordinates
without a host bignum round-trip, and (b) batch-affine bucket
accumulation (docs/perf_notes.md, candidate #4) needs batched inversions
of pair denominators at every reduction level.

Two pieces, both in the Montgomery domain on signed lazy limbs (ops/lazy):

  * `fermat_inv` — a^(p-2) via left-to-right square-and-multiply over the
    static exponent bits. The bit table is a trace-time constant and the
    254-step walk is a `lax.fori_loop` whose body is two scan-form
    mont_muls, so the compiled graph stays tiny (no 500-mul unroll).
    Maps 0 → 0 (0^(p-2) = 0), which is exactly what Z-normalization wants.

  * `batch_inverse` — product-tree batched inversion: ~3 mont_muls per
    element at log2(K) *vector* depth plus one `fermat_inv` at the root.
    This is Montgomery's inversion trick re-shaped for SIMD: the textbook
    serial prefix-product form has the same mul count but O(K) sequential
    depth, which would idle a machine with 8x128 lanes per op. Zeros are
    substituted with 1 on the way up and zeroed back in the result, so
    semantics match elementwise `fermat_inv`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import CurveParams, int_to_limbs
from . import lazy
from .complete import ProjPoint

I32 = jnp.int32


def is_zero_val(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Value-level zero test for lazy limbs with value in [0, 2p):
    zero is represented by limb-canonical 0 or p."""
    c = lazy.canonicalize(a, curve)
    p_limbs = lazy.const_limbs(curve.p, curve, a.ndim - 1)
    return jnp.all(c == 0, axis=0) | jnp.all(c == p_limbs, axis=0)


def reduce_once(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Canonical limbs with value < 2p -> fully reduced value < p.
    Branchless: compare against p lexicographically from the top limb,
    subtract p where >=, and re-ripple (the select-based ff_reduce of
    shader/field/ff.metal:9-16, on the signed-lazy representation)."""
    c = lazy.canonicalize(a, curve)
    p_limbs = lazy.const_limbs(curve.p, curve, a.ndim - 1)
    # lexicographic >= built least-significant limb first: in the
    # recurrence the limb processed LAST dominates, so ascending order
    # gives the top limb top priority
    gte = jnp.ones(c.shape[1:], bool)
    for j in range(c.shape[0]):
        pj = p_limbs[j]
        gte = (c[j] > pj) | ((c[j] == pj) & gte)
    return lazy.canonicalize(jnp.where(gte[None], c - p_limbs, c), curve)


def fermat_inv(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Montgomery-domain inverse by Fermat: given a*R (value < 32p),
    returns a^(-1)*R as canonical limbs < 2p; zero maps to zero."""
    e = curve.p - 2
    nbits = e.bit_length()
    bits = jnp.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], I32)
    batch = a.shape[1:]
    a_c = lazy.canonicalize(a, curve)
    one = jnp.broadcast_to(lazy.mont_one(curve, len(batch)), a.shape)

    def body(i, acc):
        acc = lazy.mont_mul(acc, acc, curve, unroll=False)
        mul = lazy.mont_mul(acc, a_c, curve, unroll=False)
        return jnp.where(bits[i] == 1, mul, acc)

    return jax.lax.fori_loop(0, nbits, body, one)


def batch_inverse(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Elementwise Montgomery-domain inverse of a (L, *batch) array via a
    product tree; zeros map to zero. Output canonical limbs, value < 2p."""
    L = a.shape[0]
    batch_shape = a.shape[1:]
    K = 1
    for d in batch_shape:
        K *= d
    flat = a.reshape(L, K)
    zero = is_zero_val(flat, curve)
    one = jnp.broadcast_to(lazy.mont_one(curve, 1), (L, K))
    flat = jnp.where(zero[None], one, lazy.canonicalize(flat, curve))

    Kp = 1 << max((K - 1).bit_length(), 0)
    if Kp != K:
        pad = jnp.broadcast_to(lazy.mont_one(curve, 1), (L, Kp - K))
        flat = jnp.concatenate([flat, pad], axis=1)

    # up-sweep: pairwise products, keep every level for the down-sweep
    levels = [flat]
    cur = flat
    while cur.shape[1] > 1:
        cur = lazy.mont_mul(cur[:, 0::2], cur[:, 1::2], curve, unroll=False)
        levels.append(cur)

    inv = fermat_inv(levels[-1], curve)
    # down-sweep: children inverses from the parent inverse and the
    # sibling's (stored) subtree product
    for lvl in range(len(levels) - 2, -1, -1):
        v = levels[lvl]
        left = lazy.mont_mul(inv, v[:, 1::2], curve, unroll=False)
        right = lazy.mont_mul(inv, v[:, 0::2], curve, unroll=False)
        inv = jnp.stack([left, right], axis=2).reshape(L, v.shape[1])

    inv = inv[:, :K]
    inv = jnp.where(zero[None], jnp.zeros_like(inv), inv)
    return inv.reshape(a.shape)


def to_affine(p: ProjPoint, curve: CurveParams
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Projective (X : Y : Z) -> affine (X/Z, Y/Z) plus infinity mask.

    Coordinates come back fully reduced (< p) in the Montgomery domain;
    infinity lanes (Z value 0) return (0, 0, True). This is the
    normalization the reference delegates to arkworks after
    metal_variable_base_msm returns G1Projective."""
    zinv = batch_inverse(p.z, curve)
    inf = is_zero_val(p.z, curve)
    x = reduce_once(lazy.mont_mul(p.x, zinv, curve, unroll=False), curve)
    y = reduce_once(lazy.mont_mul(p.y, zinv, curve, unroll=False), curve)
    x = jnp.where(inf[None], jnp.zeros_like(x), x)
    y = jnp.where(inf[None], jnp.zeros_like(y), y)
    return x, y, inf
