"""Sanity tests for the pure-python oracle itself (the trust anchor).

Cross-checks the EFD Jacobian formulas against independent affine-coordinate
arithmetic, verifies group laws, and checks the Pippenger oracle against the
naive oracle — so every higher layer can safely compare against it."""

import random

import pytest

from tpu_msm.constants import BLS12_377, BN254
from tpu_msm.reference import curve as ref

CURVES = [BN254, BLS12_377]


def affine_add(c, a, b):
    """Independent textbook affine addition (not the EFD Jacobian path)."""
    if a is None:
        return b
    if b is None:
        return a
    p = c.p
    (x1, y1), (x2, y2) = a, b
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return (x3, (lam * (x1 - x3) - y1) % p)


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_formulas_vs_affine(c):
    rng = random.Random(1)
    g = (c.gen_x, c.gen_y, 1)
    pts = [ref.scalar_mul(c, g, rng.randrange(1, c.scalar_modulus)) for _ in range(6)]
    for a in pts:
        for b in pts:
            got = ref.to_affine(c, ref.add(c, a, b))
            want = affine_add(c, ref.to_affine(c, a), ref.to_affine(c, b))
            assert got == want
        got = ref.to_affine(c, ref.dbl(c, a))
        aa = ref.to_affine(c, a)
        assert got == affine_add(c, aa, aa)
        # madd agrees with add for z2=1
        assert ref.jac_eq(c, ref.madd(c, a, ref.to_affine(c, pts[0])),
                          ref.add(c, a, (*ref.to_affine(c, pts[0]), 1)))


def test_special_cases():
    c = BN254
    g = (c.gen_x, c.gen_y, 1)
    p2 = ref.dbl(c, g)
    assert ref.add(c, ref.INF, g) == g
    assert ref.add(c, g, ref.INF) == g
    assert ref.is_inf(ref.add(c, g, ref.neg(c, g)))
    assert ref.jac_eq(c, ref.add(c, g, g), p2)  # equal -> dbl shortcut
    assert ref.is_inf(ref.dbl(c, ref.INF))
    # scalar_mul edge cases
    assert ref.is_inf(ref.scalar_mul(c, g, 0))
    assert ref.jac_eq(c, ref.scalar_mul(c, g, c.scalar_modulus), ref.INF)
    assert ref.jac_eq(c, ref.scalar_mul(c, g, c.scalar_modulus + 5),
                      ref.scalar_mul(c, g, 5))


def test_decompose_signed_reconstructs():
    c = BN254
    rng = random.Random(2)
    for s in (8, 13, 15, 16):
        nw = -(-c.scalar_bits // s)
        for _ in range(50):
            k = rng.randrange(0, c.scalar_modulus)
            digits = ref.decompose_signed(c, k, s, nw)
            assert all(abs(d) <= (1 << (s - 1)) for d in digits)
            assert sum(d << (i * s) for i, d in enumerate(digits)) == k


@pytest.mark.parametrize("window", [8, 13])
def test_pippenger_vs_naive(window):
    c = BN254
    pts, scalars = ref.gen_points_scalars(c, 50, seed=3)
    want = ref.msm_naive(c, pts, scalars)
    got = ref.msm_pippenger_signed(c, pts, scalars, window=window)
    assert ref.jac_eq(c, got, want)


def test_pippenger_duplicates_and_zeros():
    c = BN254
    pts, scalars = ref.gen_points_scalars(c, 16, seed=4)
    pts = pts + pts  # duplicates stress the equal-points shortcut
    scalars = scalars + scalars
    scalars[3] = 0
    scalars[17] = 0
    want = ref.msm_naive(c, pts, scalars)
    got = ref.msm_pippenger_signed(c, pts, scalars, window=8)
    assert ref.jac_eq(c, got, want)


def test_gen_points_on_curve():
    c = BN254
    pts, scalars = ref.gen_points_scalars(c, 20, seed=5)
    assert len(pts) == len(scalars) == 20
    for x, y in pts:
        assert (y * y - (x * x * x + c.b_coeff)) % c.p == 0
