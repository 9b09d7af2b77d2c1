"""Barrett layer — analogue of reference tests/cuzk/{kernel_field_mul,
kernel_barrett_reduction} tests (GPU field_mul vs host (a*b) mod p)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BLS12_377, BN254
from tpu_msm.ops import barrett
from tpu_msm.utils.limbs_conversion import ints_to_planar, planar_to_ints

rng = random.Random(17)


def test_mul_wide():
    a = [rng.randrange(0, 1 << 256) for _ in range(32)]
    b = [rng.randrange(0, 1 << 256) for _ in range(32)]
    got = barrett.mul_wide(jnp.array(ints_to_planar(a, 16)),
                           jnp.array(ints_to_planar(b, 16)))
    assert got.shape[0] == 32
    assert planar_to_ints(np.array(got)) == [x * y for x, y in zip(a, b)]


def test_mul_wide_rectangular():
    # 17-limb x 17-limb (the mu product inside barrett_reduce)
    a = [rng.randrange(0, 1 << 270) for _ in range(8)]
    b = [rng.randrange(0, 1 << 270) for _ in range(8)]
    got = barrett.mul_wide(jnp.array(ints_to_planar(a, 17)),
                           jnp.array(ints_to_planar(b, 17)))
    assert planar_to_ints(np.array(got)) == [x * y for x, y in zip(a, b)]


@pytest.mark.parametrize("curve", [BN254, BLS12_377], ids=lambda c: c.name)
def test_field_mul(curve):
    a = [rng.randrange(0, curve.p) for _ in range(64)]
    b = [rng.randrange(0, curve.p) for _ in range(64)]
    got = barrett.field_mul(jnp.array(ints_to_planar(a, curve.num_limbs)),
                            jnp.array(ints_to_planar(b, curve.num_limbs)), curve)
    assert planar_to_ints(np.array(got)) == [x * y % curve.p for x, y in zip(a, b)]


def test_field_mul_boundary():
    c = BN254
    cases = [(0, 0), (1, 1), (c.p - 1, c.p - 1), (c.p - 1, 1), (0, c.p - 1)]
    got = barrett.field_mul(jnp.array(ints_to_planar([x for x, _ in cases], 16)),
                            jnp.array(ints_to_planar([y for _, y in cases], 16)), c)
    assert planar_to_ints(np.array(got)) == [x * y % c.p for x, y in cases]


def test_to_mont_barrett_matches_cios_encoding():
    # The two encode paths (Barrett field_mul(x,R) vs mont_mul(x,R^2)) must
    # agree — the cross-check SURVEY.md §7 step 2 calls for.
    from tpu_msm.ops import mont
    c = BN254
    vals = [rng.randrange(0, c.p) for _ in range(32)]
    arr = jnp.array(ints_to_planar(vals, 16))
    np.testing.assert_array_equal(np.array(barrett.to_mont_barrett(arr, c)),
                                  np.array(mont.to_mont(arr, c)))
