"""Curve-op layer — analogue of reference tests/curve/jacobian_*.rs: random
points in Montgomery-limb form through the device kernels vs the oracle's
projective arithmetic, plus branchless special-case coverage the
reference's early-return shaders get for free."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BN254, BN254_F13
from tpu_msm.ops import curve as jc
from tpu_msm.reference import curve as ref
from tpu_msm.utils.testing import jac_to_planar_mont, planar_mont_to_jac

CURVES = [BN254_F13, BN254]  # fast profile first; 16x16 CIOS parity second


def make_points(c, seed, n):
    """n oracle Jacobian points with non-trivial z, plus edge lanes."""
    rng = random.Random(seed)
    g = (c.gen_x, c.gen_y, 1)
    pts = []
    for _ in range(n):
        k = rng.randrange(1, c.scalar_modulus)
        p = ref.scalar_mul(c, g, k)
        if rng.random() < 0.5:  # rescale z to exercise z != 1 paths
            lam = rng.randrange(2, c.p)
            x, y, z = p
            p = ((x * lam * lam) % c.p, (y * lam ** 3) % c.p, (z * lam) % c.p)
        pts.append(p)
    return pts


def to_dev(pts, c):
    x, y, z = jac_to_planar_mont(pts, c)
    return jc.JacPoint(jnp.array(x), jnp.array(y), jnp.array(z))


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_jac_dbl(c):
    pts = make_points(c, 21, 16) + [ref.INF]
    got = planar_mont_to_jac(*jax.jit(lambda p: jc.jac_dbl(p, c, unroll=False))(
        to_dev(pts, c)), curve=c)
    for g, p in zip(got, pts):
        assert ref.jac_eq(c, g, ref.dbl(c, p))


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
@pytest.mark.parametrize("dbl_mode", ["cond", "select"])
def test_jac_add_generic_and_special(c, dbl_mode):
    # the 16x16 CIOS profile (BN254) pathologically stalls the XLA *CPU*
    # pipeline compiler on the jac_add graph (>60 min for a 12-lane batch
    # in BOTH dbl modes, while jac_dbl and every F13-profile variant
    # compile in ~100 s). Full numeric coverage of jac_add runs on the
    # F13 profile here; the 16x16 parity profile runs on the real chip
    # (TPU_MSM_TEST_TPU=1, scripts/tpu_verify.py).
    if c is BN254 and jax.default_backend() != "tpu":
        pytest.skip("16x16-profile jac_add stalls the XLA CPU compiler")
    rng = random.Random(22)
    pts = make_points(c, 22, 12)
    # lanes: generic x8, p1=inf, p2=inf, equal points (different z-scales!),
    # p1 = -p2 (cancel)
    lam = rng.randrange(2, c.p)
    eq_a = pts[0]
    eq_b = ((pts[0][0] * lam * lam) % c.p, (pts[0][1] * lam ** 3) % c.p,
            (pts[0][2] * lam) % c.p)
    p1 = pts[:8] + [ref.INF, pts[8], eq_a, pts[9]]
    p2 = pts[4:12] + [pts[8], ref.INF, eq_b, ref.neg(c, pts[9])]
    f = jax.jit(lambda a, b: jc.jac_add(a, b, c, unroll=False, dbl_mode=dbl_mode))
    got = planar_mont_to_jac(*f(to_dev(p1, c), to_dev(p2, c)), curve=c)
    for g, a, b in zip(got, p1, p2):
        assert ref.jac_eq(c, g, ref.add(c, a, b))


def test_jac_add_no_dbl_lane_cond_path():
    # all-generic batch: the cond fast path must not execute the dbl fix
    c = BN254_F13
    pts = make_points(c, 23, 8)
    f = jax.jit(lambda a, b: jc.jac_add(a, b, c, unroll=False, dbl_mode="cond"))
    got = planar_mont_to_jac(*f(to_dev(pts[:4], c), to_dev(pts[4:], c)), curve=c)
    for g, a, b in zip(got, pts[:4], pts[4:]):
        assert ref.jac_eq(c, g, ref.add(c, a, b))


@pytest.mark.parametrize("c", [BN254_F13], ids=lambda c: c.name)
def test_jac_madd(c):
    from tpu_msm.utils.testing import affine_to_planar_mont
    pts = make_points(c, 24, 8) + [ref.INF, make_points(c, 25, 1)[0]]
    aff_src = make_points(c, 26, 9)
    affs = [ref.to_affine(c, p) for p in aff_src]
    # one lane where p2 is marked infinity
    affs.append((c.gen_x, c.gen_y))
    p2_inf = jnp.array([False] * 9 + [True])
    # one equal-lane: p1 = jacobian form of affs[0]
    pts[0] = (*affs[0], 1)
    ax, ay = affine_to_planar_mont(affs, c)
    f = jax.jit(lambda p, x, y, m: jc.jac_madd(p, x, y, c, unroll=False, p2_inf=m))
    got = planar_mont_to_jac(*f(to_dev(pts, c), jnp.array(ax), jnp.array(ay), p2_inf),
                             curve=c)
    for i, (g, p) in enumerate(zip(got, pts)):
        want = p if i == 9 else ref.madd(c, p, affs[i])
        assert ref.jac_eq(c, g, want), f"lane {i}"


def test_jac_neg_and_eq_limbwise():
    c = BN254_F13
    pts = make_points(c, 27, 8) + [ref.INF]
    dev = to_dev(pts, c)
    got = planar_mont_to_jac(*jc.jac_neg(dev, c), curve=c)
    for g, p in zip(got, pts):
        assert ref.jac_eq(c, g, ref.neg(c, p))
    assert bool(jnp.all(jc.jac_eq_limbwise(dev, dev)))
    # non-infinity lanes differ from their negation limbwise; the canonical
    # infinity lane (all zeros) is its own negation
    eq_neg = np.array(jc.jac_eq_limbwise(dev, jc.jac_neg(dev, c)))
    assert list(eq_neg) == [False] * 8 + [True]


def test_jac_scalar_mul_u32():
    c = BN254_F13
    rng = random.Random(28)
    pts = make_points(c, 28, 6)
    ks = [0, 1, 2, 0xFFFFFFFF, rng.randrange(1 << 32), rng.randrange(1 << 32)]
    f = jax.jit(lambda p, k: jc.jac_scalar_mul_u32(p, k, c))
    got = planar_mont_to_jac(*f(to_dev(pts, c), jnp.array(ks, jnp.uint32)), curve=c)
    for g, p, k in zip(got, pts, ks):
        assert ref.jac_eq(c, g, ref.scalar_mul(c, p, k))
