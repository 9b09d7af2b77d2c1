"""Montgomery multiplication (CIOS) on planar limb arrays.

Analogue of shader/mont_backend/mont.metal `mont_mul_cios` (:105-181) — the
production multiplier for 16-bit limbs — plus the encode/decode helpers.
The reference Montgomery-encodes points via a Barrett `field_mul(x, R)`
(shader/cuzk/barrett_reduction.metal:114-118); we instead encode with one
`mont_mul(x, R^2)`, which SURVEY.md §7 explicitly allows ("drop Barrett
entirely and Montgomery-encode with a mont-mul by R^2") — Barrett is still
provided for parity in ops/barrett.py.

Algorithm: textbook CIOS (Koc-Acar-Kaliski) with word size w = 16 in uint32
accumulators. Every intermediate provably fits uint32:
    t[j] + a[j]*b[i] + c  <=  (2^w-1) + (2^w-1)^2 + (2^w-1)  =  2^32 - 1.
The i/j loops run over the *static* limb count and unroll at trace time;
the batch axis is vectorized on the VPU. The reference's mont_mul_optimised
(12-13 bit limbs) and mont_mul_modified (14-15 bit, NSAFE carry deferral)
variants exist for narrower limb widths; see mont_mul_modified below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CurveParams
from . import limbs

U32 = jnp.uint32


def mont_mul_cios(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """(a * b * R^-1) mod p for a, b < p; output fully reduced (< p).

    Mirrors mont.metal mont_mul_cios (:105-181). Limb constants p[j] and n0
    enter as Python ints so XLA folds them into immediates."""
    L = curve.num_limbs
    w = curve.log_limb_size
    mask = U32(curve.limb_mask)
    p = curve.p_limbs()
    n0 = curve.n0

    batch = a.shape[1:]
    zero = jnp.zeros(batch, U32)
    t = [zero] * (L + 2)

    for i in range(L):
        bi = b[i]
        # multiplication step: t += a * b[i]
        c = zero
        for j in range(L):
            cs = t[j] + a[j] * bi + c
            t[j] = cs & mask
            c = cs >> w
        cs = t[L] + c
        t[L] = cs & mask
        t[L + 1] = cs >> w
        # reduction step: t += m * p, then shift one limb
        m = (t[0] * n0) & mask
        cs = t[0] + m * p[0]
        c = cs >> w
        for j in range(1, L):
            cs = t[j] + m * p[j] + c
            t[j - 1] = cs & mask
            c = cs >> w
        cs = t[L] + c
        t[L - 1] = cs & mask
        t[L] = t[L + 1] + (cs >> w)

    # t[0..L] < 2p (t[L] in {0,1}); one conditional subtract gives < p.
    wide = jnp.stack(t[: L + 1])
    p_wide = jnp.array(curve.p_wide_limbs(), U32).reshape(
        (L + 1,) + (1,) * len(batch))
    d, borrow = limbs.sub_with_borrow(wide, jnp.broadcast_to(p_wide, wide.shape), w)
    res = limbs.select(borrow == 0, d, wide)
    return res[:L]


def mont_mul_deferred(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams,
                      unroll: bool = True) -> jnp.ndarray:
    """Deferred-carry Montgomery multiply for narrow limbs (w <= 13).

    TPU-native counterpart of the reference's narrow-limb multipliers
    (mont.metal mont_mul_optimised :24-54 / mont_mul_modified :59-100):
    with w-bit limbs, 2*L products of (2^w-1)^2 accumulate in uint32
    without intermediate carry propagation (constants.deferred_carry_headroom
    asserts the bound per profile), so the inner j-loop becomes ONE
    vectorized multiply-add over the limb axis per step — no carry chains,
    ~10x smaller XLA graphs and ~4x fewer VPU ops than unrolled CIOS.

    Per outer iteration i (operating on the redundant accumulator
    t: (L+1, batch) uint32):
        t   += a * b[i]                (vector MAC over limbs)
        m    = (t[0] * n0) & mask
        t   += p * m                   (vector MAC; makes t[0] % 2^w == 0)
        t    = shift-down-one-limb, folding carry t[0] >> w into new t[0]
    followed by one canonicalizing carry ripple and one conditional
    subtract (result < 2p as in standard Montgomery).

    unroll=False wraps the i-loop in lax.fori_loop: much smaller graphs
    (fast compiles, used by CPU tests), at the cost of a loop-carried
    accumulator that XLA cannot fuse across iterations (use unroll=True in
    the production pipeline)."""
    L = curve.num_limbs
    w = curve.log_limb_size
    if w > 13:
        raise ValueError("mont_mul_deferred requires log_limb_size <= 13")
    mask = U32(curve.limb_mask)
    n0 = curve.n0
    batch = a.shape[1:]
    zero_row = jnp.zeros((1,) + batch, U32)
    a_pad = jnp.concatenate([a, zero_row], axis=0)             # (L+1, batch)
    p_pad = jnp.array(curve.p_wide_limbs(), U32).reshape(
        (L + 1,) + (1,) * len(batch))

    def body(i, t):
        bi = jax.lax.dynamic_index_in_dim(b, i, axis=0, keepdims=False)
        t = t + a_pad * bi[None]
        m = (t[0] * n0) & mask
        t = t + p_pad * m[None]
        c0 = t[0] >> w
        return jnp.concatenate([(t[1] + c0)[None], t[2:], zero_row], axis=0)

    t = jnp.zeros((L + 1,) + batch, U32)
    if unroll:
        for i in range(L):
            bi = b[i]
            t = t + a_pad * bi[None]
            m = (t[0] * n0) & mask
            t = t + p_pad * m[None]
            c0 = t[0] >> w
            t = jnp.concatenate([(t[1] + c0)[None], t[2:], zero_row], axis=0)
    else:
        t = jax.lax.fori_loop(0, L, body, t)

    # canonicalize: ripple multi-bit carries down to w-bit limbs
    out = []
    c = jnp.zeros(batch, U32)
    for j in range(L + 1):
        s = t[j] + c
        out.append(s & mask)
        c = s >> w
    wide = jnp.stack(out)  # < 2p, top limb small, final carry provably 0

    p_wide = jnp.broadcast_to(p_pad, wide.shape)
    d, borrow = limbs.sub_with_borrow(wide, p_wide, w)
    res = limbs.select(borrow == 0, d, wide)
    return res[:L]


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams,
             unroll: bool = True) -> jnp.ndarray:
    """Profile dispatcher: deferred-carry multiplier for narrow-limb
    profiles (w <= 13, e.g. BN254_F13), CIOS for the 16x16 parity profile —
    the same roles mont_mul_optimised / mont_mul_cios play in the reference
    (mont.metal), selected by log_limb_size."""
    if curve.log_limb_size <= 13:
        return mont_mul_deferred(a, b, curve, unroll=unroll)
    return mont_mul_cios(a, b, curve)


def mont_sqr(a: jnp.ndarray, curve: CurveParams, unroll: bool = True) -> jnp.ndarray:
    """Squaring; currently an alias of mont_mul (a dedicated ~1.5x
    squaring kernel is a planned optimization)."""
    return mont_mul(a, a, curve, unroll=unroll)


def to_mont(a: jnp.ndarray, curve: CurveParams, unroll: bool = True) -> jnp.ndarray:
    """Standard -> Montgomery form: mont_mul(a, R^2) = a*R mod p."""
    r2 = _const(curve.r2_limbs(), curve, a.shape[1:])
    return mont_mul(a, jnp.broadcast_to(r2, a.shape), curve, unroll=unroll)


def from_mont(a: jnp.ndarray, curve: CurveParams, unroll: bool = True) -> jnp.ndarray:
    """Montgomery -> standard form: mont_mul(a, 1) = a*R^-1 mod p.

    CPU-side decode in the reference is utils/mont_reduction.rs raw_reduction
    (:15-40); on-device we reuse the same multiplier with b = 1."""
    one = [1] + [0] * (curve.num_limbs - 1)
    onev = _const(one, curve, a.shape[1:])
    return mont_mul(a, jnp.broadcast_to(onev, a.shape), curve, unroll=unroll)


def mont_mul_modified(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """NSAFE carry-deferred Montgomery multiply for mid-width limbs
    (mont.metal mont_mul_modified :59-100): carries are deferred across
    several outer iterations and folded with a full ripple only when the
    uint32 accumulation headroom is about to run out — the unsigned
    counterpart of the signed mid-loop fold in ops/rows.py mont_mul_rows.

    Dispatch mirrors the reference's width gates: w == 16 (NSAFE == 1)
    forces a ripple after every term, which IS CIOS, so it falls through
    to mont_mul_cios; w <= 13 has headroom for full deferral and takes
    mont_mul_deferred; w in {14, 15} runs the gated-fold loop below."""
    if curve.nsafe <= 1:
        return mont_mul_cios(a, b, curve)
    if curve.log_limb_size <= 13:
        return mont_mul_deferred(a, b, curve)
    L = curve.num_limbs
    w = curve.log_limb_size
    mask = U32(curve.limb_mask)
    n0 = curve.n0
    batch = a.shape[1:]
    zero_row = jnp.zeros((1,) + batch, U32)
    a_pad = jnp.concatenate([a, zero_row], axis=0)             # (L+1, batch)
    p_pad = jnp.array(curve.p_wide_limbs(), U32).reshape(
        (L + 1,) + (1,) * len(batch))
    # Safe iterations between folds: each outer step adds two w-bit-limb
    # products per slot plus the t[0]-carry fold-in (bounded well below
    # 2^(w+5) per step); headroom must stay inside uint32.
    max_prod = ((1 << w) - 1) ** 2
    fold_every = max(1, ((1 << 32) - (1 << w))
                     // (2 * max_prod + (1 << (w + 5))))

    t = jnp.zeros((L + 1,) + batch, U32)
    for i in range(L):
        t = t + a_pad * b[i][None]
        # m needs only t[0] mod 2^w, which deferred carries never corrupt
        # (limb 0 has no carry-in from below; uint32 wraparound preserves
        # the low w bits of the true value)
        m = (t[0] * n0) & mask
        t = t + p_pad * m[None]
        c0 = t[0] >> w
        t = jnp.concatenate([(t[1] + c0)[None], t[2:], zero_row], axis=0)
        if (i + 1) % fold_every == 0 and (i + 1) < L:
            # value-preserving ripple; Montgomery keeps value(t) far below
            # 2^(w*(L+1)), so the carry out of the top slot is zero
            out = []
            c = jnp.zeros(batch, U32)
            for j in range(L + 1):
                s = t[j] + c
                out.append(s & mask)
                c = s >> w
            t = jnp.stack(out)

    out = []
    c = jnp.zeros(batch, U32)
    for j in range(L + 1):
        s = t[j] + c
        out.append(s & mask)
        c = s >> w
    wide = jnp.stack(out)  # < 2p; one conditional subtract gives < p
    d, borrow = limbs.sub_with_borrow(
        wide, jnp.broadcast_to(p_pad, wide.shape), w)
    res = limbs.select(borrow == 0, d, wide)
    return res[:L]


def _const(limb_list, curve: CurveParams, batch_shape) -> jnp.ndarray:
    return jnp.array(limb_list, U32).reshape(
        (len(limb_list),) + (1,) * len(batch_shape))
