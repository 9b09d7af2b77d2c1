"""List-form ("rows") signed-lazy field and point arithmetic.

The production compute path for Pallas kernels. Identical mathematics to
ops/lazy.py (signed lazy limbs) and ops/complete.py (Renes-Costello-Batina
complete projective formulas) — same bound ledger, same constants — but
every multi-limb value is a **python list of per-limb arrays** instead of
one stacked (L, ...) array. The limb axis therefore exists only at trace
time: there are no concatenates, rolls, or limb-axis slices in the
compiled program, just flat elementwise dataflow. On v5e this is the
difference between ~0.1 ns and ~100 ns per limb-multiply (see
benches/primitives.py; the stacked per-step concat shift de-vectorizes
inside loops).

Mirrors the reference kernels the same way lazy.py/complete.py do:
mont_mul_rows <-> mont.metal mont_mul_* (:24-181), point ops <-> the role
of jacobian.metal (:11-166) but with complete formulas (no exceptional
branches). Bound ledger as ops/lazy.py: mul inputs value <= 32p with
limbs |.| <= 2^13; outputs canonical limbs < 2p.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax.numpy as jnp

from ..constants import CurveParams, int_to_limbs, signed_fold_interval

Rows = List[jnp.ndarray]


class ProjRows(NamedTuple):
    """Projective point with each coordinate as per-limb rows."""
    x: Rows
    y: Rows
    z: Rows


def zeros_like_rows(a: Rows) -> Rows:
    return [jnp.zeros_like(a[0]) for _ in a]


def const_rows(value: int, curve: CurveParams, like: jnp.ndarray,
               num_limbs: int | None = None) -> Rows:
    """Non-negative constant, broadcast to `like`'s shape per limb."""
    L = num_limbs or curve.num_limbs
    limbs = int_to_limbs(value, L, curve.log_limb_size)
    return [jnp.full_like(like, v) for v in limbs]


def from_stacked(a: jnp.ndarray) -> Rows:
    return [a[i] for i in range(a.shape[0])]


def to_stacked(a: Rows) -> jnp.ndarray:
    return jnp.stack(a)


def add_rows(a: Rows, b: Rows) -> Rows:
    return [x + y for x, y in zip(a, b)]


def sub_rows(a: Rows, b: Rows, curve: CurveParams, k: int) -> Rows:
    """a - b + k*p (lazy subtract; requires value(b) < k*p)."""
    kp = int_to_limbs(k * curve.p, curve.num_limbs, curve.log_limb_size)
    return [x - y + v if v else x - y for x, y, v in zip(a, b, kp)]


def neg_rows(a: Rows, curve: CurveParams, k: int) -> Rows:
    """k*p - a."""
    kp = int_to_limbs(k * curve.p, curve.num_limbs, curve.log_limb_size)
    return [v - x for x, v in zip(a, kp)]


def smallmul_rows(a: Rows, c: int) -> Rows:
    return [x * jnp.int32(c) for x in a]


def fold_rows(a: Rows, curve: CurveParams, passes: int = 1) -> Rows:
    """Re-bound limbs toward [0, 2^w), value-preserving (lazy.fold)."""
    w = curve.log_limb_size
    mask = jnp.int32((1 << w) - 1)
    for _ in range(passes):
        carries = [x >> w for x in a]
        a = [(x & mask) for x in a]
        for j in range(1, len(a)):
            a[j] = a[j] + carries[j - 1]
    return a


def canon_rows(a: Rows, curve: CurveParams) -> Rows:
    """Full carry ripple -> canonical limbs in [0, 2^w).

    Valid for any signed limbs whose VALUE lies in [0, 2^(w*L)) — the
    arithmetic shift propagates borrows, and a non-negative in-range
    value makes the final carry-out zero. Every limb leaves through an
    `& mask`, so Mosaic's range analysis can prove all downstream
    multiplies are narrow (the 12x12 fast multiply path — unbounded
    32-bit VPU multiplies are ~20x slower, see benches/probe9.py)."""
    w = curve.log_limb_size
    mask = jnp.int32((1 << w) - 1)
    out = []
    c = jnp.zeros_like(a[0])
    for x in a:
        s = x + c
        out.append(s & mask)
        c = s >> w
    return out


def select_rows(cond: jnp.ndarray, a: Rows, b: Rows) -> Rows:
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def mont_mul_rows(a: Rows, b: Rows, curve: CurveParams) -> Rows:
    """Deferred-carry Montgomery multiply (lazy.mont_mul, list form).

    Inputs: any signed limbs with values in [0, 32p]. Both operands are
    ripple-canonicalized first so every product is a PROVABLY narrow
    w-bit x w-bit multiply (Mosaic fast path; see canon_rows). The
    m-digit sequence is value-determined once b is canonical, so this
    stays bit-identical to the stacked twin (ops/lazy.py mont_mul).
    Output: canonical limbs, value in [0, 2p)."""
    L = curve.num_limbs
    w = curve.log_limb_size
    mask = jnp.int32((1 << w) - 1)
    n0 = jnp.int32(curve.n0)
    p_pad = int_to_limbs(curve.p, L + 1, curve.log_limb_size)
    z = jnp.zeros_like(a[0])
    a_pad = canon_rows(a, curve) + [z]
    b = canon_rows(b, curve)
    t = [z] * (L + 1)
    fold_every = signed_fold_interval(w)
    for i in range(L):
        bi = b[i]
        t = [tj + aj * bi for tj, aj in zip(t, a_pad)]
        m = ((t[0] & mask) * n0) & mask
        t = [tj + m * pj if pj else tj for tj, pj in zip(t, p_pad)]
        c0 = t[0] >> w
        t = t[1:] + [z]
        t[0] = t[0] + c0
        if (i + 1) % fold_every == 0 and (i + 1) < L:
            # mid-loop carry fold: 13-bit profiles overflow int32 after
            # ~15 deferred iterations; one value-preserving fold pass
            # (m digits read t[0] mod 2^w — unchanged, so outputs stay
            # bit-identical across fold schedules). Top slot is zero
            # (a_pad[L] == p_pad[L] == 0), so no carry-out is dropped.
            cs = [x >> w for x in t]
            t = [x & mask for x in t]
            for j in range(1, L + 1):
                t[j] = t[j] + cs[j - 1]
    out = []
    c = z
    for j in range(L + 1):
        s = t[j] + c
        out.append(s & mask)
        c = s >> w
    return out[:L]


def mont_one_rows(curve: CurveParams, like: jnp.ndarray) -> Rows:
    return const_rows(curve.r_mod_p, curve, like)


def to_mont_rows(a: Rows, curve: CurveParams) -> Rows:
    r2 = const_rows(curve.r2_mod_p, curve, a[0])
    return mont_mul_rows(a, r2, curve)


def proj_infinity_rows(curve: CurveParams, like: jnp.ndarray) -> ProjRows:
    zero = [jnp.zeros_like(like) for _ in range(curve.num_limbs)]
    return ProjRows(zero, mont_one_rows(curve, like), list(zero))


def select_proj(cond: jnp.ndarray, a: ProjRows, b: ProjRows) -> ProjRows:
    return ProjRows(select_rows(cond, a.x, b.x),
                    select_rows(cond, a.y, b.y),
                    select_rows(cond, a.z, b.z))


def _b3m(curve: CurveParams, like: jnp.ndarray) -> Rows:
    return const_rows(curve.to_mont(3 * curve.b_coeff), curve, like)


def _mul(a: Rows, b: Rows, curve: CurveParams) -> Rows:
    # mont_mul_rows canonicalizes its operands itself (ripple + mask)
    return mont_mul_rows(a, b, curve)


def padd_rows(p1: ProjRows, p2: ProjRows, curve: CurveParams) -> ProjRows:
    """RCB Algorithm 7 (complete add, a=0) — mirrors complete.padd with
    the same bound ledger (inputs < 4p, outputs < 4p)."""
    b3 = 3 * curve.b_coeff
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    t0 = _mul(x1, x2, curve)
    t1 = _mul(y1, y2, curve)
    t2 = _mul(z1, z2, curve)
    t3 = _mul(add_rows(x1, y1), add_rows(x2, y2), curve)
    t3 = sub_rows(t3, add_rows(t0, t1), curve, 4)
    t4 = _mul(add_rows(y1, z1), add_rows(y2, z2), curve)
    t4 = sub_rows(t4, add_rows(t1, t2), curve, 4)
    xz = _mul(add_rows(x1, z1), add_rows(x2, z2), curve)
    xz = sub_rows(xz, add_rows(t0, t2), curve, 4)
    t0 = smallmul_rows(t0, 3)
    t2 = smallmul_rows(t2, b3)
    z3 = add_rows(t1, t2)
    t1 = sub_rows(t1, t2, curve, 2 * b3)
    yz = smallmul_rows(xz, b3)
    x3 = sub_rows(_mul(t3, t1, curve), _mul(t4, yz, curve), curve, 2)
    y3 = add_rows(_mul(t1, z3, curve), _mul(yz, t0, curve))
    z3 = add_rows(_mul(z3, t4, curve), _mul(t0, t3, curve))
    return ProjRows(x3, y3, z3)


def pmadd_rows(p1: ProjRows, x2: Rows, y2: Rows,
               curve: CurveParams) -> ProjRows:
    """RCB Algorithm 8 (complete mixed add, a=0, Z2==1) — mirrors
    complete.pmadd. (x2, y2) must be a real affine Montgomery point."""
    b3 = 3 * curve.b_coeff
    x1, y1, z1 = p1
    t0 = _mul(x1, x2, curve)
    t1 = _mul(y1, y2, curve)
    t3 = _mul(add_rows(x1, y1), add_rows(x2, y2), curve)
    t3 = sub_rows(t3, add_rows(t0, t1), curve, 4)
    t4 = add_rows(_mul(y2, z1, curve), y1)
    xz = add_rows(_mul(x2, z1, curve), x1)
    t0 = smallmul_rows(t0, 3)
    t2 = _mul(z1, _b3m(curve, z1[0]), curve)
    z3 = add_rows(t1, t2)
    t1 = sub_rows(t1, t2, curve, 2)
    yz = smallmul_rows(xz, b3)
    x3 = sub_rows(_mul(t3, t1, curve), _mul(t4, yz, curve), curve, 2)
    y3 = add_rows(_mul(t1, z3, curve), _mul(yz, t0, curve))
    z3 = add_rows(_mul(z3, t4, curve), _mul(t0, t3, curve))
    return ProjRows(x3, y3, z3)


def pdbl_rows(p: ProjRows, curve: CurveParams) -> ProjRows:
    """RCB Algorithm 9 (complete doubling, a=0) — mirrors complete.pdbl."""
    x, y, z = p
    t0 = _mul(y, y, curve)
    z3 = smallmul_rows(t0, 8)
    t1 = _mul(y, z, curve)
    t2 = _mul(_mul(z, z, curve), _b3m(curve, z[0]), curve)
    x3 = _mul(t2, z3, curve)
    y3 = add_rows(t0, t2)
    z3 = _mul(t1, z3, curve)
    t2 = smallmul_rows(t2, 3)
    t0 = sub_rows(t0, t2, curve, 6)
    y3 = add_rows(x3, _mul(t0, y3, curve))
    x3 = smallmul_rows(_mul(t0, _mul(x, y, curve), curve), 2)
    return ProjRows(x3, y3, z3)


def pneg_rows(p: ProjRows, curve: CurveParams, k: int = 4) -> ProjRows:
    """Point negation: (X, kp - Y, Z). For Y < kp the ledger is kept."""
    return ProjRows(p.x, neg_rows(p.y, curve, k), p.z)
