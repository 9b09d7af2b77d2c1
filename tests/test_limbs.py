"""BigInt op layer — analogue of reference tests/bigint/*.rs (random pairs
vs host big-int arithmetic, limb arrays AND reconstructed ints compared)."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_msm.constants import BN254, int_to_limbs
from tpu_msm.ops import limbs
from tpu_msm.utils.limbs_conversion import ints_to_planar, planar_to_ints

L, W = 16, 16
LIMIT = 1 << (L * W)
rng = random.Random(7)


def rand_ints(n, limit=LIMIT):
    return [rng.randrange(0, limit) for _ in range(n)]


def test_pack_roundtrip():
    vals = rand_ints(33)
    arr = ints_to_planar(vals, L, W)
    assert arr.shape == (L, 33) and arr.dtype == np.uint32
    assert (arr < (1 << W)).all()
    assert planar_to_ints(arr, W) == vals


def test_add_unsafe():
    # rejection-sample non-overflowing pairs, like bigint_add_unsafe.rs:19-30
    a = rand_ints(64, LIMIT // 2)
    b = rand_ints(64, LIMIT // 2)
    got = limbs.add_unsafe(jnp.array(ints_to_planar(a, L)), jnp.array(ints_to_planar(b, L)))
    assert planar_to_ints(np.array(got)) == [x + y for x, y in zip(a, b)]


def test_add_wide():
    a, b = rand_ints(64), rand_ints(64)
    got = limbs.add_wide(jnp.array(ints_to_planar(a, L)), jnp.array(ints_to_planar(b, L)))
    assert got.shape[0] == L + 1
    assert planar_to_ints(np.array(got)) == [x + y for x, y in zip(a, b)]


def test_sub_and_borrow():
    a, b = rand_ints(64), rand_ints(64)
    hi = [max(x, y) for x, y in zip(a, b)]
    lo = [min(x, y) for x, y in zip(a, b)]
    got = limbs.sub(jnp.array(ints_to_planar(hi, L)), jnp.array(ints_to_planar(lo, L)))
    assert planar_to_ints(np.array(got)) == [x - y for x, y in zip(hi, lo)]
    # wraparound semantics (mod 2^256) when a < b
    d, borrow = limbs.sub_with_borrow(jnp.array(ints_to_planar(lo, L)),
                                      jnp.array(ints_to_planar(hi, L)))
    want = [(x - y) % LIMIT for x, y in zip(lo, hi)]
    assert planar_to_ints(np.array(d)) == want
    assert all((bo == 1) == (x < y) for bo, x, y in zip(np.array(borrow), lo, hi))


def test_gte_eq_is_zero():
    a, b = rand_ints(64), rand_ints(64)
    a[0] = b[0]  # force one equal pair
    a[1] = 0
    aj, bj = jnp.array(ints_to_planar(a, L)), jnp.array(ints_to_planar(b, L))
    assert list(np.array(limbs.gte(aj, bj))) == [x >= y for x, y in zip(a, b)]
    assert list(np.array(limbs.eq(aj, bj))) == [x == y for x, y in zip(a, b)]
    assert list(np.array(limbs.is_zero(aj))) == [x == 0 for x in a]


def test_wide_roundtrip_and_select():
    a = rand_ints(8)
    aj = jnp.array(ints_to_planar(a, L))
    assert planar_to_ints(np.array(limbs.from_wide(limbs.to_wide(aj), L))) == a
    b = rand_ints(8)
    bj = jnp.array(ints_to_planar(b, L))
    cond = jnp.array([True, False] * 4)
    sel = limbs.select(cond, aj, bj)
    want = [x if c else y for c, x, y in zip([True, False] * 4, a, b)]
    assert planar_to_ints(np.array(sel)) == want


def test_ops_jittable():
    a = jnp.array(ints_to_planar(rand_ints(16), L))
    b = jnp.array(ints_to_planar(rand_ints(16), L))
    jit_add = jax.jit(limbs.add_wide)
    np.testing.assert_array_equal(np.array(jit_add(a, b)), np.array(limbs.add_wide(a, b)))
