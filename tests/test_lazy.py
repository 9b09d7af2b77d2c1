"""Signed lazy-field layer (ops/lazy.py): the production multiplier under
relaxed inputs — extremes of the bound ledger, negative limbs, fold
behavior — validated against python-int arithmetic."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BLS12_377_S12, BLS12_377_S13, BN254_S12, BN254_S13
from tpu_msm.ops import lazy
from tpu_msm.utils.limbs_conversion import ints_to_planar

rng = random.Random(31)
CURVES = [BN254_S12, BLS12_377_S12, BN254_S13, BLS12_377_S13]


def decode(arr, curve):
    """Signed limbs -> exact integer (no mod)."""
    arr = np.asarray(arr)
    w = curve.log_limb_size
    out = []
    for col in arr.T:
        acc = 0
        for j in range(arr.shape[0] - 1, -1, -1):
            acc = (acc << w) + int(col[j])
        out.append(acc)
    return out


def enc(vals, curve):
    return jnp.array(ints_to_planar(vals, curve.num_limbs,
                                    curve.log_limb_size).astype(np.int32))


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_mont_mul_canonical_inputs(curve):
    a = [0, 1, curve.p - 1] + [rng.randrange(0, curve.p) for _ in range(61)]
    b = [curve.p - 1, curve.p - 1, curve.p - 1] + \
        [rng.randrange(0, curve.p) for _ in range(61)]
    for unroll in (True, False):
        got = decode(lazy.mont_mul(enc(a, curve), enc(b, curve), curve,
                                   unroll=unroll), curve)
        for g, x, y in zip(got, a, b):
            assert g % curve.p == (x * y * curve.rinv) % curve.p
            assert 0 <= g < 2 * curve.p  # output value bound


def test_mont_mul_relaxed_extremes():
    # worst-ledger inputs: values near 32p with limbs near +-2^13 after fold
    c = BN254_S12
    vals_a = [32 * c.p - 1, 16 * c.p, 1, 7 * c.p + 12345]
    vals_b = [2 * c.p - 1, 2 * c.p - 1, 32 * c.p - 1, 4 * c.p + 999]
    a = lazy.fold(enc_relaxed(vals_a, c), c)
    b = lazy.fold(enc_relaxed(vals_b, c), c)
    got = decode(lazy.mont_mul(a, b, c), c)
    for g, x, y in zip(got, vals_a, vals_b):
        assert g % c.p == (x * y * c.rinv) % c.p
        assert 0 <= g < 2 * c.p


def enc_relaxed(vals, curve):
    """Encode values that exceed the canonical limb range (val < 2^(wL))."""
    from tpu_msm.constants import int_to_limbs
    L, w = curve.num_limbs, curve.log_limb_size
    cols = [int_to_limbs(v, L, w) for v in vals]
    return jnp.array(np.array(cols, np.int64).T.astype(np.int32))


def test_lazy_add_sub_neg_fold():
    c = BN254_S12
    a_v = [rng.randrange(0, 2 * c.p) for _ in range(32)]
    b_v = [rng.randrange(0, 2 * c.p) for _ in range(32)]
    a, b = enc_relaxed(a_v, c), enc_relaxed(b_v, c)
    assert decode(lazy.add(a, b), c) == [x + y for x, y in zip(a_v, b_v)]
    got = decode(lazy.sub(a, b, c, 2), c)
    assert got == [x - y + 2 * c.p for x, y in zip(a_v, b_v)]
    assert all(v >= 0 for v in got)
    assert decode(lazy.neg(a, c, 2), c) == [2 * c.p - x for x in a_v]
    assert decode(lazy.smallmul(a, 9), c) == [9 * x for x in a_v]
    # fold preserves value, bounds limbs
    x = lazy.smallmul(lazy.sub(a, b, c, 2), 9)
    f = lazy.fold(x, c, passes=2)
    assert decode(f, c) == decode(x, c)
    assert int(jnp.max(jnp.abs(f))) <= (1 << c.log_limb_size) + (1 << 7)


def test_to_mont_and_one():
    c = BN254_S12
    vals = [0, 1, c.p - 1] + [rng.randrange(0, c.p) for _ in range(13)]
    got = decode(lazy.to_mont(enc(vals, c), c), c)
    for g, v in zip(got, vals):
        assert g % c.p == c.to_mont(v)
    assert decode(lazy.mont_one(c).reshape(c.num_limbs, 1), c)[0] == c.r_mod_p


def test_negative_limb_inputs_to_mul():
    # limbs transiently negative (from lazy sub), value positive
    c = BN254_S12
    a_v = [rng.randrange(0, c.p) for _ in range(16)]
    b_v = [rng.randrange(0, c.p) for _ in range(16)]
    d_v = [rng.randrange(0, c.p) for _ in range(16)]
    a = lazy.sub(enc(a_v, c), enc(b_v, c), c, 1)  # a-b+p, negative limbs
    prod = lazy.mont_mul(lazy.fold(a, c), enc(d_v, c), c)
    got = decode(prod, c)
    for g, x, y, z in zip(got, a_v, b_v, d_v):
        assert g % c.p == ((x - y + c.p) * z * c.rinv) % c.p
