"""Complete projective point arithmetic (Renes-Costello-Batina) on lazy limbs.

The production point backend. Where the reference's Jacobian kernels
(shader/curve/jacobian.metal:46-100) branch on zero/equal operands — and
our XLA port of them (ops/curve.py) pays limbwise equality ripples and
per-lane selects for those cases — the RCB complete addition formulas
("Complete addition formulas for prime order elliptic curves",
Renes-Costello-Batina, EUROCRYPT 2016, a=0 specializations Algs 7-9) have
NO exceptional cases: one straight-line formula is correct for every input
pair including doubling, cancellation, and the point at infinity (0:1:0).
That removes every comparison and select from the MSM hot loop — the
TPU-idiomatic resolution of SURVEY.md §7 "hard part (2)".

Representation: projective (X:Y:Z), Montgomery-form signed-lazy limbs
(ops/lazy.py). Coordinate values stay < 4p (closed under all three ops —
see the bound ledgers in each function); limbs are folded at mul inputs.
b3 = 3*b enters as a small-integer limb scale where the ledger allows
(< 2p operands) and as a Montgomery constant multiply where operands are
relaxed (mixed add's b3*Z1, dbl's b3*Z^2).

Group-law equality with the Jacobian backend and the python oracle is
established in tests/test_complete.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import CurveParams
from . import lazy

I32 = jnp.int32


class ProjPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def proj_infinity(curve: CurveParams, batch_shape=()) -> ProjPoint:
    """(0 : 1 : 0) with 1 in Montgomery form."""
    zero = jnp.zeros((curve.num_limbs,) + batch_shape, I32)
    one = jnp.broadcast_to(lazy.mont_one(curve, len(batch_shape)), zero.shape)
    return ProjPoint(zero, one, zero)


def select(cond: jnp.ndarray, a: ProjPoint, b: ProjPoint) -> ProjPoint:
    return ProjPoint(jnp.where(cond[None], a.x, b.x),
                     jnp.where(cond[None], a.y, b.y),
                     jnp.where(cond[None], a.z, b.z))


def _b3_mont(curve: CurveParams, batch_ndim: int) -> jnp.ndarray:
    """3b in Montgomery form (canonical limbs)."""
    return lazy.const_limbs(curve.to_mont(3 * curve.b_coeff), curve, batch_ndim)


def padd(p1: ProjPoint, p2: ProjPoint, curve: CurveParams,
         unroll: bool = True) -> ProjPoint:
    """RCB Algorithm 7 (complete add, a = 0). 12M + 2 small-scale.

    Ledger (inputs < 4p): internal sums < 8p, b3-scaled terms < 54p; every
    product pair <= 400p^2 < R*p/4 so mul outputs stay < 2p; outputs < 4p.
    """
    b3 = 3 * curve.b_coeff

    def mul(a, b):
        # mont_mul canonicalizes its operands itself (ripple + mask)
        return lazy.mont_mul(a, b, curve, unroll=unroll)

    x1, y1, z1 = p1
    x2, y2, z2 = p2
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(lazy.add(x1, y1), lazy.add(x2, y2))
    t3 = lazy.sub(t3, lazy.add(t0, t1), curve, 4)        # x1y2 + x2y1
    t4 = mul(lazy.add(y1, z1), lazy.add(y2, z2))
    t4 = lazy.sub(t4, lazy.add(t1, t2), curve, 4)        # y1z2 + y2z1
    xz = mul(lazy.add(x1, z1), lazy.add(x2, z2))
    xz = lazy.sub(xz, lazy.add(t0, t2), curve, 4)        # x1z2 + x2z1
    t0 = lazy.smallmul(t0, 3)                             # 3 x1x2
    t2 = lazy.smallmul(t2, b3)                            # 3b z1z2
    z3 = lazy.add(t1, t2)                                 # y1y2 + 3b z1z2
    t1 = lazy.sub(t1, t2, curve, 2 * b3)                  # y1y2 - 3b z1z2
    yz = lazy.smallmul(xz, b3)                            # 3b (x1z2+x2z1)
    x3 = lazy.sub(mul(t3, t1), mul(t4, yz), curve, 2)
    y3 = lazy.add(mul(t1, z3), mul(yz, t0))
    z3 = lazy.add(mul(z3, t4), mul(t0, t3))
    return ProjPoint(x3, y3, z3)


def pmadd(p1: ProjPoint, x2: jnp.ndarray, y2: jnp.ndarray,
          curve: CurveParams, unroll: bool = True) -> ProjPoint:
    """RCB Algorithm 8 (complete mixed add, a = 0, Z2 == 1). 12M.

    Complete for every p1 (including infinity); (x2, y2) must be an affine
    (never-infinity) point in Montgomery form — exactly the shape of the
    sorted point stream in the SMVP scan (cuzk/smvp.py). The b3*Z1 term
    uses a Montgomery constant multiply because Z1 is relaxed (< 4p) and a
    small-scale would overflow the product ledger."""
    def mul(a, b):
        # mont_mul canonicalizes its operands itself (ripple + mask)
        return lazy.mont_mul(a, b, curve, unroll=unroll)

    b3 = 3 * curve.b_coeff
    x1, y1, z1 = p1
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = mul(lazy.add(x1, y1), lazy.add(x2, y2))
    t3 = lazy.sub(t3, lazy.add(t0, t1), curve, 4)        # x1y2 + x2y1
    t4 = lazy.add(mul(y2, z1), y1)                        # y1 + y2 z1
    xz = lazy.add(mul(x2, z1), x1)                        # x1 + x2 z1
    t0 = lazy.smallmul(t0, 3)
    t2 = mul(z1, _b3_mont(curve, z1.ndim - 1))            # 3b z1, < 2p
    z3 = lazy.add(t1, t2)
    t1 = lazy.sub(t1, t2, curve, 2)
    yz = lazy.smallmul(xz, b3)
    x3 = lazy.sub(mul(t3, t1), mul(t4, yz), curve, 2)
    y3 = lazy.add(mul(t1, z3), mul(yz, t0))
    z3 = lazy.add(mul(z3, t4), mul(t0, t3))
    return ProjPoint(x3, y3, z3)


def pdbl(p: ProjPoint, curve: CurveParams, unroll: bool = True) -> ProjPoint:
    """RCB Algorithm 9 (complete doubling, a = 0). 6M + 2S + 1 const-mul."""
    def mul(a, b):
        # mont_mul canonicalizes its operands itself (ripple + mask)
        return lazy.mont_mul(a, b, curve, unroll=unroll)

    x, y, z = p
    t0 = mul(y, y)
    z3 = lazy.smallmul(t0, 8)                             # 8 y^2, < 16p
    t1 = mul(y, z)
    t2 = mul(mul(z, z), _b3_mont(curve, z.ndim - 1))      # 3b z^2, < 2p
    x3 = mul(t2, z3)
    y3 = lazy.add(t0, t2)
    z3 = mul(t1, z3)
    t2 = lazy.smallmul(t2, 3)                             # 9b z^2, < 6p
    t0 = lazy.sub(t0, t2, curve, 6)                       # y^2 - 9b z^2
    y3 = lazy.add(x3, mul(t0, y3))
    x3 = lazy.smallmul(mul(t0, mul(x, y)), 2)
    return ProjPoint(x3, y3, z3)
