"""Jacobian curve arithmetic on planar Montgomery-form limb arrays.

Analogue of shader/curve/jacobian.metal (jacobian_dbl_2009_l :11-44,
jacobian_add_2007_bl :46-100, jacobian_madd_2007_bl :104-166,
jacobian_scalar_mul :168-193, jacobian_neg :195-210) and
shader/curve/utils.metal (is_jacobian_zero :9-14, jacobian_eq :16-31),
re-designed for XLA: the reference's data-dependent early returns (zero /
equal-point shortcuts) become branchless selects over all outcome
candidates, or a `lax.cond` fast path that only pays for the doubling
branch when some lane actually needs it (SURVEY.md §7 "hard parts" (2)).

A point batch is a `JacPoint(x, y, z)` of three (num_limbs, ...batch)
uint32 arrays holding Montgomery-form coordinates; z == 0 encodes infinity
(any x, y). All ops are vectorized over the batch axes and jit-safe.

Group-law identities (used by every kernel above):
    y^2 = x^3 + b has odd prime group order => no 2-torsion => y == 0
    never occurs on-curve, so dbl's z3 = 2*y*z is zero only at infinity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import CurveParams
from . import limbs
from .field import ff_add, ff_sub, ff_neg
from .mont import mont_mul

U32 = jnp.uint32


class JacPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def infinity(curve: CurveParams, batch_shape=()) -> JacPoint:
    """Canonical infinity: all-zero coordinates (z == 0 is what matters)."""
    z = jnp.zeros((curve.num_limbs,) + batch_shape, U32)
    return JacPoint(z, z, z)


def is_inf(pt: JacPoint) -> jnp.ndarray:
    """z == 0 test (curve/utils.metal is_jacobian_zero :9-14)."""
    return limbs.is_zero(pt.z)


def select_point(cond: jnp.ndarray, a: JacPoint, b: JacPoint) -> JacPoint:
    """Lane-wise point select: cond has batch shape."""
    return JacPoint(limbs.select(cond, a.x, b.x),
                    limbs.select(cond, a.y, b.y),
                    limbs.select(cond, a.z, b.z))


def jac_eq_limbwise(a: JacPoint, b: JacPoint) -> jnp.ndarray:
    """Representative (limbwise) equality — parity with the reference's
    jacobian_eq (curve/utils.metal:16-31), which is NOT projective
    equality. Group-element equality lives in the python oracle."""
    return limbs.eq(a.x, b.x) & limbs.eq(a.y, b.y) & limbs.eq(a.z, b.z)


def jac_neg(pt: JacPoint, curve: CurveParams) -> JacPoint:
    """(x, -y, z) (jacobian.metal jacobian_neg :195-210). ff_neg maps the
    all-zero y of canonical infinity to itself."""
    return JacPoint(pt.x, ff_neg(pt.y, curve), pt.z)


def jac_dbl(pt: JacPoint, curve: CurveParams, unroll: bool = True) -> JacPoint:
    """dbl-2009-l (jacobian.metal jacobian_dbl_2009_l :11-44).

    Needs no infinity select: z3 = 2*y1*z1 vanishes exactly when z1 == 0
    (no 2-torsion => y1 == 0 only alongside z1 == 0)."""
    x1, y1, z1 = pt

    def mul(a, b):
        return mont_mul(a, b, curve, unroll=unroll)

    a = mul(x1, x1)
    b = mul(y1, y1)
    c = mul(b, b)
    t = ff_add(x1, b, curve)
    t = mul(t, t)
    d = ff_sub(ff_sub(t, a, curve), c, curve)
    d = ff_add(d, d, curve)
    e = ff_add(ff_add(a, a, curve), a, curve)
    f = mul(e, e)
    x3 = ff_sub(f, ff_add(d, d, curve), curve)
    c2 = ff_add(c, c, curve)
    c4 = ff_add(c2, c2, curve)
    c8 = ff_add(c4, c4, curve)
    y3 = ff_sub(mul(e, ff_sub(d, x3, curve)), c8, curve)
    z3 = mul(ff_add(y1, y1, curve), z1)
    return JacPoint(x3, y3, z3)


def jac_add(p1: JacPoint, p2: JacPoint, curve: CurveParams,
            unroll: bool = True, dbl_mode: str = "cond") -> JacPoint:
    """add-2007-bl with branchless handling of the exceptional cases
    (jacobian.metal jacobian_add_2007_bl :46-100):

        p1 == inf            -> p2
        p2 == inf            -> p1
        U1 == U2, S1 == S2   -> dbl(p1)
        U1 == U2, S1 != S2   -> inf        (p1 == -p2)
        otherwise            -> generic add

    dbl_mode:
      "cond"   — compute the doubling candidate under lax.cond(any(is_dbl)):
                 zero extra per-lane cost on the (overwhelmingly common)
                 no-doubling path, one extra pass when some lane doubles.
      "select" — always compute dbl and select (deterministic cost; used to
                 cross-check the cond path and inside contexts where a
                 scalar predicate is unavailable).
    """
    def mul(a, b):
        return mont_mul(a, b, curve, unroll=unroll)

    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(mul(y1, z2), z2z2)
    s2 = mul(mul(y2, z1), z1z1)

    h = ff_sub(u2, u1, curve)
    h2 = ff_add(h, h, curve)
    i = mul(h2, h2)
    j = mul(h, i)
    r = ff_sub(s2, s1, curve)
    r = ff_add(r, r, curve)
    v = mul(u1, i)
    x3 = ff_sub(ff_sub(mul(r, r), j, curve), ff_add(v, v, curve), curve)
    s1j = mul(s1, j)
    y3 = ff_sub(mul(r, ff_sub(v, x3, curve)), ff_add(s1j, s1j, curve), curve)
    zz = ff_sub(ff_sub(mul(ff_add(z1, z2, curve), ff_add(z1, z2, curve)),
                       z1z1, curve), z2z2, curve)
    z3 = mul(zz, h)
    res = JacPoint(x3, y3, z3)

    p1_inf = is_inf(p1)
    p2_inf = is_inf(p2)
    both = jnp.logical_and(~p1_inf, ~p2_inf)
    x_eq = limbs.eq(u1, u2)
    y_eq = limbs.eq(s1, s2)
    is_dbl = both & x_eq & y_eq
    is_cancel = both & x_eq & ~y_eq

    if dbl_mode == "select":
        res = select_point(is_dbl, jac_dbl(p1, curve, unroll=unroll), res)
    elif dbl_mode == "cond":
        res = jax.lax.cond(
            jnp.any(is_dbl),
            lambda pr: select_point(is_dbl, jac_dbl(p1, curve, unroll=unroll), pr),
            lambda pr: pr,
            res)
    else:
        raise ValueError(f"unknown dbl_mode {dbl_mode!r}")

    inf = infinity(curve, x1.shape[1:])
    res = select_point(is_cancel, inf, res)
    res = select_point(p2_inf, p1, res)
    res = select_point(p1_inf, p2, res)
    return res


def jac_madd(p1: JacPoint, x2: jnp.ndarray, y2: jnp.ndarray,
             curve: CurveParams, unroll: bool = True,
             p2_inf: jnp.ndarray | None = None,
             dbl_mode: str = "cond") -> JacPoint:
    """madd-2007-bl: mixed add with affine p2 (z2 == 1 implicit), in
    Montgomery form (jacobian.metal jacobian_madd_2007_bl :104-166).
    `p2_inf` optionally marks lanes whose affine operand is the identity
    (the affine form has no natural infinity encoding)."""
    def mul(a, b):
        return mont_mul(a, b, curve, unroll=unroll)

    x1, y1, z1 = p1
    z1z1 = mul(z1, z1)
    u2 = mul(x2, z1z1)
    s2 = mul(mul(y2, z1), z1z1)

    h = ff_sub(u2, x1, curve)
    hh = mul(h, h)
    i2 = ff_add(hh, hh, curve)
    i = ff_add(i2, i2, curve)
    j = mul(h, i)
    r = ff_sub(s2, y1, curve)
    r = ff_add(r, r, curve)
    v = mul(x1, i)
    x3 = ff_sub(ff_sub(mul(r, r), j, curve), ff_add(v, v, curve), curve)
    y1j = mul(y1, j)
    y3 = ff_sub(mul(r, ff_sub(v, x3, curve)), ff_add(y1j, y1j, curve), curve)
    z1h = ff_add(z1, h, curve)
    z3 = ff_sub(ff_sub(mul(z1h, z1h), z1z1, curve), hh, curve)
    res = JacPoint(x3, y3, z3)

    p1_inf = is_inf(p1)
    if p2_inf is None:
        p2_inf = jnp.zeros(x2.shape[1:], bool)
    both = jnp.logical_and(~p1_inf, ~p2_inf)
    x_eq = limbs.eq(x1, u2)
    y_eq = limbs.eq(y1, s2)
    is_dbl = both & x_eq & y_eq
    is_cancel = both & x_eq & ~y_eq

    if dbl_mode == "select":
        res = select_point(is_dbl, jac_dbl(p1, curve, unroll=unroll), res)
    else:
        res = jax.lax.cond(
            jnp.any(is_dbl),
            lambda pr: select_point(is_dbl, jac_dbl(p1, curve, unroll=unroll), pr),
            lambda pr: pr,
            res)

    one = jnp.array(curve.r_limbs(), U32).reshape(
        (curve.num_limbs,) + (1,) * (x2.ndim - 1))
    p2_as_jac = JacPoint(x2, y2, jnp.broadcast_to(one, x2.shape))
    res = select_point(is_cancel, infinity(curve, x2.shape[1:]), res)
    res = select_point(p2_inf, p1, res)
    res = select_point(p1_inf & ~p2_inf, p2_as_jac, res)
    return res


def jac_scalar_mul_u32(pt: JacPoint, k: jnp.ndarray, curve: CurveParams,
                       unroll: bool = False) -> JacPoint:
    """Per-lane u32 double-and-add (jacobian.metal jacobian_scalar_mul
    :168-193 / pbpr.metal double_and_add :16-31): 32 fixed iterations of
    conditional-add + double, branchless per lane. k: uint32 batch array."""
    def body(i, state):
        acc, base, kk = state
        bit = (kk & 1) == 1
        acc = select_point(bit, jac_add(acc, base, curve, unroll=unroll,
                                        dbl_mode="select"), acc)
        base = jac_dbl(base, curve, unroll=unroll)
        return acc, base, kk >> 1

    acc0 = infinity(curve, pt.x.shape[1:])
    acc, _, _ = jax.lax.fori_loop(0, 32, body, (acc0, pt, k))
    return acc
