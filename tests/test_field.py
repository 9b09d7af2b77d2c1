"""Field-op layer — analogue of reference tests/field/{ff_add,ff_sub,ff_reduce}.rs
(random elements below p vs host arithmetic)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BLS12_377, BN254
from tpu_msm.ops import field
from tpu_msm.utils.limbs_conversion import ints_to_planar, planar_to_ints

rng = random.Random(11)


def rand_field(curve, n):
    return [rng.randrange(0, curve.p) for _ in range(n)]


@pytest.mark.parametrize("curve", [BN254, BLS12_377], ids=lambda c: c.name)
def test_ff_add(curve):
    a, b = rand_field(curve, 64), rand_field(curve, 64)
    got = field.ff_add(jnp.array(ints_to_planar(a, curve.num_limbs)),
                       jnp.array(ints_to_planar(b, curve.num_limbs)), curve)
    assert planar_to_ints(np.array(got)) == [(x + y) % curve.p for x, y in zip(a, b)]


@pytest.mark.parametrize("curve", [BN254, BLS12_377], ids=lambda c: c.name)
def test_ff_sub(curve):
    a, b = rand_field(curve, 64), rand_field(curve, 64)
    got = field.ff_sub(jnp.array(ints_to_planar(a, curve.num_limbs)),
                       jnp.array(ints_to_planar(b, curve.num_limbs)), curve)
    assert planar_to_ints(np.array(got)) == [(x - y) % curve.p for x, y in zip(a, b)]


def test_ff_reduce():
    curve = BN254
    # values in [0, 2p): exercise both branches, incl. boundary cases
    vals = [0, 1, curve.p - 1, curve.p, curve.p + 1, 2 * curve.p - 1]
    vals += [rng.randrange(0, 2 * curve.p) for _ in range(58)]
    got = field.ff_reduce(jnp.array(ints_to_planar(vals, curve.num_limbs)), curve)
    assert planar_to_ints(np.array(got)) == [v % curve.p for v in vals]


def test_ff_neg():
    curve = BN254
    vals = [0, 1, curve.p - 1] + rand_field(curve, 29)
    got = field.ff_neg(jnp.array(ints_to_planar(vals, curve.num_limbs)), curve)
    assert planar_to_ints(np.array(got)) == [(-v) % curve.p for v in vals]


def test_ff_add_boundary():
    curve = BN254
    # p-1 + 1 == 0, p-1 + p-1 == p-2
    a = [curve.p - 1, curve.p - 1, 0]
    b = [1, curve.p - 1, 0]
    got = field.ff_add(jnp.array(ints_to_planar(a, 16)),
                       jnp.array(ints_to_planar(b, 16)), curve)
    assert planar_to_ints(np.array(got)) == [0, curve.p - 2, 0]
