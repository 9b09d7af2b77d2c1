"""Montgomery layer — analogue of reference tests/mont_backend/mont_mul_cios.rs
(host computes a*b*R^-1 via big ints and compares)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BLS12_377, BN254
from tpu_msm.ops import mont
from tpu_msm.utils.limbs_conversion import ints_to_planar, planar_to_ints

rng = random.Random(13)


def rand_field(curve, n):
    return [rng.randrange(0, curve.p) for _ in range(n)]


@pytest.mark.parametrize("curve", [BN254, BLS12_377], ids=lambda c: c.name)
def test_mont_mul_cios_random(curve):
    a, b = rand_field(curve, 128), rand_field(curve, 128)
    got = mont.mont_mul_cios(jnp.array(ints_to_planar(a, curve.num_limbs)),
                             jnp.array(ints_to_planar(b, curve.num_limbs)), curve)
    want = [(x * y * curve.rinv) % curve.p for x, y in zip(a, b)]
    assert planar_to_ints(np.array(got)) == want


def test_mont_mul_boundary():
    c = BN254
    cases = [(0, 0), (0, c.p - 1), (c.p - 1, c.p - 1), (1, 1),
             (c.r_mod_p, 1), (c.r_mod_p, c.r_mod_p)]
    a = [x for x, _ in cases]
    b = [y for _, y in cases]
    got = mont.mont_mul_cios(jnp.array(ints_to_planar(a, 16)),
                             jnp.array(ints_to_planar(b, 16)), c)
    want = [(x * y * c.rinv) % c.p for x, y in cases]
    assert planar_to_ints(np.array(got)) == want


def test_to_from_mont_roundtrip():
    c = BN254
    vals = rand_field(c, 64)
    enc = mont.to_mont(jnp.array(ints_to_planar(vals, 16)), c)
    assert planar_to_ints(np.array(enc)) == [c.to_mont(v) for v in vals]
    dec = mont.from_mont(enc, c)
    assert planar_to_ints(np.array(dec)) == vals


def test_mont_mul_is_field_mul_in_domain():
    # mont(x)*mont(y) --cios--> mont(x*y): the homomorphism the curve ops use
    c = BN254
    xs, ys = rand_field(c, 32), rand_field(c, 32)
    xm = [c.to_mont(v) for v in xs]
    ym = [c.to_mont(v) for v in ys]
    got = mont.mont_mul_cios(jnp.array(ints_to_planar(xm, 16)),
                             jnp.array(ints_to_planar(ym, 16)), c)
    want = [c.to_mont(x * y % c.p) for x, y in zip(xs, ys)]
    assert planar_to_ints(np.array(got)) == want


def test_mont_outputs_fully_reduced():
    c = BN254
    vals = [c.p - 1] * 16 + rand_field(c, 48)
    got = np.array(mont.mont_mul_cios(jnp.array(ints_to_planar(vals, 16)),
                                      jnp.array(ints_to_planar(vals, 16)), c))
    for v in planar_to_ints(got):
        assert 0 <= v < c.p


def test_mont_mul_jit_matches_eager():
    c = BN254
    a = jnp.array(ints_to_planar(rand_field(c, 16), 16))
    b = jnp.array(ints_to_planar(rand_field(c, 16), 16))
    f = jax.jit(lambda x, y: mont.mont_mul_cios(x, y, c))
    np.testing.assert_array_equal(np.array(f(a, b)),
                                  np.array(mont.mont_mul_cios(a, b, c)))


def test_mont_mul_modified_dispatches():
    c = BN254
    a = rand_field(c, 8)
    b = rand_field(c, 8)
    got = mont.mont_mul_modified(jnp.array(ints_to_planar(a, 16)),
                                 jnp.array(ints_to_planar(b, 16)), c)
    want = [(x * y * c.rinv) % c.p for x, y in zip(a, b)]
    assert planar_to_ints(np.array(got)) == want


@pytest.mark.parametrize("w,L", [(14, 19), (15, 17)])
def test_mont_mul_modified_midwidth(w, L):
    # the NSAFE-gated fold path proper (mont.metal:59-100): 14/15-bit
    # limb profiles where carries defer across several iterations
    import dataclasses
    c = dataclasses.replace(BN254, name=f"bn254_m{w}", num_limbs=L,
                            log_limb_size=w)
    assert c.nsafe > 1
    a = rand_field(c, 64) + [0, c.p - 1, 1, c.r_mod_p]
    b = rand_field(c, 64) + [c.p - 1, c.p - 1, 1, c.r_mod_p]
    got = mont.mont_mul_modified(jnp.array(ints_to_planar(a, L, w)),
                                 jnp.array(ints_to_planar(b, L, w)), c)
    want = [(x * y * c.rinv) % c.p for x, y in zip(a, b)]
    assert planar_to_ints(np.array(got), w) == want
