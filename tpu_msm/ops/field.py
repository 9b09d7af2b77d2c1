"""Prime-field arithmetic (mod p) on planar limb arrays — branchless.

Analogue of shader/field/ff.metal (ff_reduce :9-16, ff_add :18-21,
ff_sub :23-35), generalized over `CurveParams` and with the reference's
data-dependent branches replaced by selects (required for XLA).

Invariant: every function maps fully-reduced inputs (< p) to fully-reduced
outputs (< p), so limbwise equality of representatives is field equality —
the property the curve kernels' U1==U2 / S1==S2 shortcut tests rely on.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import CurveParams
from . import limbs

U32 = jnp.uint32


def p_array(curve: CurveParams, batch_shape=()) -> jnp.ndarray:
    """Modulus as a broadcastable (L,) + (1,)*len(batch_shape) constant."""
    p = jnp.array(curve.p_limbs(), U32)
    return p.reshape((curve.num_limbs,) + (1,) * len(batch_shape))


def ff_reduce(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """Reduce-once: a - p if a >= p (ff.metal ff_reduce :9-16), branchless."""
    p = p_array(curve, a.shape[1:])
    d, borrow = limbs.sub_with_borrow(a, jnp.broadcast_to(p, a.shape),
                                      curve.log_limb_size)
    return limbs.select(borrow == 0, d, a)


def ff_add(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """(a + b) mod p for a, b < p (ff.metal ff_add :18-21).

    a + b < 2p < 2^(L*w), so add_unsafe + reduce-once is exact."""
    return ff_reduce(limbs.add_unsafe(a, b, curve.log_limb_size), curve)


def ff_sub(a: jnp.ndarray, b: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """(a - b) mod p for a, b < p (ff.metal ff_sub :23-35), branchless:
    compute a-b and a-b+p, select on the borrow."""
    d, borrow = limbs.sub_with_borrow(a, b, curve.log_limb_size)
    p = jnp.broadcast_to(p_array(curve, a.shape[1:]), a.shape)
    d_plus_p = limbs.add_unsafe(d, p, curve.log_limb_size)
    return limbs.select(borrow == 0, d, d_plus_p)


def ff_neg(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """(-a) mod p, with -0 == 0 (used for point negation; the curve groups
    here have odd prime order so y==0 only occurs for garbage/infinity
    coordinates, which the point-level selects guard — see ops/curve.py)."""
    p = jnp.broadcast_to(p_array(curve, a.shape[1:]), a.shape)
    d = limbs.sub(p, a, curve.log_limb_size)
    return limbs.select(limbs.is_zero(a), a, d)


def ff_double(a: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    return ff_add(a, a, curve)
