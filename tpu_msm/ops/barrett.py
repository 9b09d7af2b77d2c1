"""Barrett reduction and full-width field multiply on planar limbs.

Analogue of shader/cuzk/barrett_reduction.metal: schoolbook wide multiply
(`mul` :16-37), 512-bit add/sub helpers (:39-71), and `barrett_reduce`
(:84-112) / `field_mul` (:114-118). The reference uses this only to
Montgomery-encode point coordinates in pipeline stage 1; our production
path encodes with mont_mul-by-R^2 instead (ops/mont.py), so this module
exists for capability parity, cross-checking, and standard-form multiplies.

Barrett with base b = 2^w, k = num_limbs (p < b^k), mu = floor(b^2k / p):
    q  = floor( floor(x / b^(k-1)) * mu / b^(k+1) )
    r  = x - q*p   (computed mod b^(k+1); r < 3p, two conditional subtracts)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import CurveParams, int_to_limbs
from . import limbs

U32 = jnp.uint32


def mul_wide(a: jnp.ndarray, b: jnp.ndarray, log_limb_size: int = 16) -> jnp.ndarray:
    """Schoolbook La x Lb limb multiply -> La+Lb limbs (barrett_reduction.metal
    `mul` :16-37). Row-wise carry ripple keeps every accumulator < 2^32."""
    mask = U32((1 << log_limb_size) - 1)
    la, lb = a.shape[0], b.shape[0]
    batch = a.shape[1:]
    zero = jnp.zeros(batch, U32)
    t = [zero] * (la + lb)
    for i in range(la):
        ai = a[i]
        c = zero
        for j in range(lb):
            cs = t[i + j] + ai * b[j] + c
            t[i + j] = cs & mask
            c = cs >> log_limb_size
        t[i + lb] = c
    return jnp.stack(t)


def barrett_reduce(x: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Reduce a 2L-limb product mod p -> L limbs (barrett_reduce :84-112).

    The reference shifts with SLACK=2 to align its 254-bit modulus to limb
    boundaries; this formulation works directly at limb granularity with
    mu = floor(b^2k/p) (17 limbs for BN254, matching BARRETT_MU's length in
    shader/constants.metal)."""
    L = curve.num_limbs
    w = curve.log_limb_size
    batch = x.shape[1:]

    mu = jnp.broadcast_to(
        jnp.array(curve.mu_limbs(), U32).reshape((L + 1,) + (1,) * len(batch)),
        (L + 1,) + batch)

    q1 = x[L - 1:]                      # floor(x / b^(k-1)) -> L+1 limbs
    q2 = mul_wide(q1, mu, w)            # 2L+2 limbs
    q3 = q2[L + 1:]                     # floor(q2 / b^(k+1)) -> L+1 limbs

    p_wide = jnp.broadcast_to(
        jnp.array(curve.p_wide_limbs(), U32).reshape((L + 1,) + (1,) * len(batch)),
        (L + 1,) + batch)
    # q3 * p mod b^(k+1): low L+1 limbs of the product suffice since r < b^(k+1)
    qp = mul_wide(q3, p_wide, w)[: L + 1]
    r = limbs.sub_with_borrow(x[: L + 1], qp, w)[0]  # exact: x - q*p >= 0

    # r < 3p: at most two conditional subtracts (reference loops the same way)
    for _ in range(2):
        d, borrow = limbs.sub_with_borrow(r, p_wide, w)
        r = limbs.select(borrow == 0, d, r)
    return r[:L]


def field_mul(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Full (a*b) mod p in standard form via Barrett (field_mul :114-118)."""
    return barrett_reduce(mul_wide(a, b, curve.log_limb_size), curve)


def to_mont_barrett(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Montgomery-encode via Barrett: field_mul(a, R mod p) — the exact
    encoding path of reference pipeline stage 1
    (convert_point_coords_and_decompose_scalars.metal:72-88)."""
    batch = a.shape[1:]
    r = jnp.broadcast_to(
        jnp.array(curve.r_limbs(), U32).reshape((curve.num_limbs,) + (1,) * len(batch)),
        a.shape)
    return field_mul(a, r, curve)
