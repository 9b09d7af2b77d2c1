"""Signed lazy-reduction field arithmetic — the production compute path.

Re-designs the reference's per-thread bignum discipline (strict 16-bit
limbs, carry chains in every op — bigint.metal / ff.metal / mont.metal)
into the form SIMD/vector hardware actually wants:

  * limbs are int32 holding ~12-bit digits, planar (L, ...batch);
  * ADD/SUB/NEG/smallscale are SINGLE vector ops — no carry chains.
    Subtraction adds a k*p offset so field VALUES stay non-negative while
    individual limbs go transiently negative (harmless in int32);
  * `fold` re-bounds limbs with 4 vector ops (mask/shift/shift-up/add),
    value-preserving, no ripple;
  * `mont_mul` is the deferred-carry Montgomery multiplier (see
    ops/mont.py for the unsigned variant and the headroom argument) with
    a single canonicalizing ripple at the end. Outputs are canonical-limb
    ([0, 2^w)) with value < 2p, and since values are non-negative by
    construction the final ripple's carry-out is provably zero — no
    conditional subtract, no comparison, ever.

Bound ledger (w=12, L=22, BN254): mul inputs must satisfy
value <= 32p and limbs |.| <= 2^13; then products <= (2^13)^2 = 2^26,
2L+eps accumulations < 2^31 (int32 safe), and
T = (ab + Np)/R <= 1024 p^2 / 2^264 + p < 2p. Callers (ops/complete.py)
keep values within budget with per-site offsets; tests drive extremes.

The reference's analogue of this headroom bookkeeping is NSAFE
(mont_params.rs calc_nsafe :19-29, mont.metal mont_mul_modified :59-100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CurveParams

I32 = jnp.int32


def const_limbs(value: int, curve: CurveParams, batch_ndim: int = 1,
                num_limbs: int | None = None) -> jnp.ndarray:
    """A non-negative constant as broadcastable canonical int32 limbs."""
    from ..constants import int_to_limbs
    L = num_limbs or curve.num_limbs
    return jnp.array(int_to_limbs(value, L, curve.log_limb_size),
                     I32).reshape((L,) + (1,) * batch_ndim)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lazy add: one vector op. Values add; limb bounds add."""
    return a + b


def sub(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams, k: int) -> jnp.ndarray:
    """a - b + k*p: value stays non-negative provided value(b) < k*p.
    Limbs may go negative transiently; fold before multiplying."""
    off = const_limbs(k * curve.p, curve, a.ndim - 1)
    return a - b + off


def neg(a: jnp.ndarray, curve: CurveParams, k: int) -> jnp.ndarray:
    """k*p - a (the lazy analogue of ff_neg; value(b) < k*p required)."""
    return const_limbs(k * curve.p, curve, a.ndim - 1) - a


def smallmul(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply by a small non-negative integer (e.g. 3b = 9 for BN254):
    one vector op; limb bound scales by c — fold before use."""
    return a * jnp.int32(c)


def fold(a: jnp.ndarray, curve: CurveParams, passes: int = 1) -> jnp.ndarray:
    """Re-bound limbs toward [0, 2^w) without changing the value:
    r = a mod 2^w, carries (arithmetic-shifted, so negative limbs borrow)
    move up one limb. One pass shrinks limb magnitude by ~2^w. The top
    limb must stay clear — guaranteed for values < 2^(w*L) with the
    profile's slack bits (wL - bits(p) >= 8)."""
    w = curve.log_limb_size
    mask = jnp.int32((1 << w) - 1)
    for _ in range(passes):
        c = a >> w
        r = a & mask
        a = r + jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    return a


def canonicalize(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Full carry ripple -> canonical limbs in [0, 2^w). Valid for any
    signed limbs whose value lies in [0, 2^(w*L)) (arithmetic shifts
    propagate borrows; the final carry-out is provably zero). The
    stacked twin of rows.canon_rows."""
    w = curve.log_limb_size
    mask = jnp.int32((1 << w) - 1)
    out = []
    c = jnp.zeros(a.shape[1:], I32)
    for j in range(a.shape[0]):
        s = a[j] + c
        out.append(s & mask)
        c = s >> w
    return jnp.stack(out)


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams,
             unroll: bool = True) -> jnp.ndarray:
    """Deferred-carry Montgomery multiply on signed lazy limbs.

    Inputs: any signed limbs with values in [0, 32p] (both operands are
    ripple-canonicalized first — on TPU this makes every limb product a
    provably narrow w-bit multiply, the VPU fast path, and it pins the
    m-digit sequence to the VALUE of b so all backends produce
    bit-identical outputs). Output: canonical limbs in [0, 2^w), value
    in [0, 2p); the final ripple's carry-out is provably zero."""
    L = curve.num_limbs
    w = curve.log_limb_size
    mask = jnp.int32((1 << w) - 1)
    n0 = jnp.int32(curve.n0)
    batch = a.shape[1:]
    zero_row = jnp.zeros((1,) + batch, I32)
    a_pad = jnp.concatenate([canonicalize(a, curve), zero_row], axis=0)
    b = canonicalize(b, curve)
    p_pad = const_limbs(curve.p, curve, len(batch), num_limbs=L + 1)

    def step(t, bi):
        t = t + a_pad * bi[None]
        m = ((t[0] & mask) * n0) & mask
        t = t + p_pad * m[None]
        c0 = t[0] >> w
        return jnp.concatenate([(t[1] + c0)[None], t[2:], zero_row], axis=0)

    # mid-loop carry fold for 13-bit profiles (signed_fold_interval < L):
    # value-preserving, m digits unchanged (they read t[0] mod 2^w), top
    # slot provably zero — outputs bit-identical across fold schedules.
    from ..constants import signed_fold_interval
    fold_every = signed_fold_interval(w)

    def fold_t(tt):
        cs = tt >> w
        return (tt & mask) + jnp.concatenate(
            [jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)

    t = jnp.zeros((L + 1,) + batch, I32)
    if unroll:
        for i in range(L):
            t = step(t, b[i])
            if (i + 1) % fold_every == 0 and (i + 1) < L:
                t = fold_t(t)
    else:
        def body(i, tt):
            tt = step(tt, jax.lax.dynamic_index_in_dim(
                b, i, axis=0, keepdims=False))
            if fold_every <= L:
                need = ((i + 1) % fold_every == 0) & (i + 1 < L)
                tt = jnp.where(need, fold_t(tt), tt)
            return tt
        t = jax.lax.fori_loop(0, L, body, t)

    # exact canonicalizing ripple: value >= 0 => final carry-out == 0,
    # so truncating to L limbs is exact (value < 2p < 2^(wL))
    out = []
    c = jnp.zeros(batch, I32)
    for j in range(L + 1):
        s = t[j] + c
        out.append(s & mask)
        c = s >> w
    return jnp.stack(out[:L])


def to_mont(a: jnp.ndarray, curve: CurveParams, unroll: bool = True) -> jnp.ndarray:
    """Canonical standard-form limbs -> Montgomery form (mul by R^2)."""
    r2 = const_limbs(curve.r2_mod_p, curve, a.ndim - 1)
    return mont_mul(a, jnp.broadcast_to(r2, a.shape), curve, unroll=unroll)


def mont_one(curve: CurveParams, batch_ndim: int = 1) -> jnp.ndarray:
    """1 in Montgomery form (R mod p), canonical limbs."""
    return const_limbs(curve.r_mod_p, curve, batch_ndim)
