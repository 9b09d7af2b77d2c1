"""List-form ("rows") arithmetic — equality against the stacked twins
(ops/lazy.py, ops/complete.py) which are themselves pinned to the oracle.
The rows path must be bit-identical: same ledger, same outputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BN254_S12
from tpu_msm.ops import lazy, rows
from tpu_msm.ops.complete import ProjPoint, padd, pdbl, pmadd

C = BN254_S12
L = C.num_limbs
RNG = np.random.default_rng(11)


def rand_stacked(batch=(4, 8)):
    return jnp.asarray(RNG.integers(0, 1 << C.log_limb_size,
                                    (L,) + batch, dtype=np.int32))


def rand_point(batch=(4, 8)):
    return ProjPoint(rand_stacked(batch), rand_stacked(batch),
                     rand_stacked(batch))


def as_rows_point(p):
    return rows.ProjRows(rows.from_stacked(p.x), rows.from_stacked(p.y),
                         rows.from_stacked(p.z))


def test_mont_mul_rows_matches_stacked():
    a, b = rand_stacked(), rand_stacked()
    want = lazy.mont_mul(a, b, C)
    got = rows.to_stacked(rows.mont_mul_rows(
        rows.from_stacked(a), rows.from_stacked(b), C))
    assert jnp.array_equal(want, got)


def test_fold_sub_neg_rows_match():
    a, b = rand_stacked(), rand_stacked()
    assert jnp.array_equal(lazy.fold(a - 3 * b, C),
                           rows.to_stacked(rows.fold_rows(
                               rows.from_stacked(a - 3 * b), C)))
    assert jnp.array_equal(lazy.sub(a, b, C, 4),
                           rows.to_stacked(rows.sub_rows(
                               rows.from_stacked(a), rows.from_stacked(b),
                               C, 4)))
    assert jnp.array_equal(lazy.neg(a, C, 2),
                           rows.to_stacked(rows.neg_rows(
                               rows.from_stacked(a), C, 2)))


def test_to_mont_rows_matches():
    a = rand_stacked()
    assert jnp.array_equal(
        lazy.to_mont(a, C),
        rows.to_stacked(rows.to_mont_rows(rows.from_stacked(a), C)))


@pytest.mark.parametrize("op", ["padd", "pmadd", "pdbl"])
def test_point_rows_match_stacked(op):
    p1, p2 = rand_point(), rand_point()
    x2, y2 = rand_stacked(), rand_stacked()
    if op == "padd":
        want = padd(p1, p2, C)
        got = rows.padd_rows(as_rows_point(p1), as_rows_point(p2), C)
    elif op == "pmadd":
        want = pmadd(p1, x2, y2, C)
        got = rows.pmadd_rows(as_rows_point(p1), rows.from_stacked(x2),
                              rows.from_stacked(y2), C)
    else:
        want = pdbl(p1, C)
        got = rows.pdbl_rows(as_rows_point(p1), C)
    for w, g in zip(want, (rows.to_stacked(got.x), rows.to_stacked(got.y),
                           rows.to_stacked(got.z))):
        assert jnp.array_equal(w, g)


def test_infinity_rows():
    from tpu_msm.ops.complete import proj_infinity
    like = jnp.zeros((4, 8), jnp.int32)
    inf_r = rows.proj_infinity_rows(C, like)
    inf_s = proj_infinity(C, (4, 8))
    assert jnp.array_equal(inf_s.x, rows.to_stacked(inf_r.x))
    assert jnp.array_equal(inf_s.y, rows.to_stacked(inf_r.y))
    assert jnp.array_equal(inf_s.z, rows.to_stacked(inf_r.z))
