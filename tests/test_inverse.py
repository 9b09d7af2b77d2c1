"""Batched inversion / affine normalization (ops/inverse.py) vs python-int
arithmetic — the capability the reference delegates to arkworks after
returning G1Projective (metal_msm.rs:642-695)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BLS12_377_S13, BN254_S13
from tpu_msm.ops import inverse, lazy
from tpu_msm.ops.complete import ProjPoint
from tpu_msm.utils.limbs_conversion import ints_to_planar, planar_to_ints

rng = random.Random(47)
CURVES = [BN254_S13, BLS12_377_S13]


def enc(vals, curve):
    return jnp.array(ints_to_planar(vals, curve.num_limbs,
                                    curve.log_limb_size).astype(np.int32))


def dec_mont(arr, curve):
    """Canonical mont limbs (< 2p) -> standard-form ints."""
    return [curve.from_mont(v % curve.p)
            for v in planar_to_ints(np.asarray(arr), curve.log_limb_size)]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_fermat_inv(curve):
    vals = [0, 1, curve.p - 1, 2] + [rng.randrange(1, curve.p)
                                     for _ in range(4)]
    a = enc([curve.to_mont(v) for v in vals], curve)
    got = dec_mont(inverse.fermat_inv(a, curve), curve)
    for v, g in zip(vals, got):
        assert g == (pow(v, -1, curve.p) if v else 0)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_batch_inverse_with_zeros_and_odd_size(curve):
    # K = 13: exercises pow2 padding; zeros interleaved exercise the
    # substitute-and-mask path
    vals = [rng.randrange(1, curve.p) for _ in range(13)]
    vals[3] = 0
    vals[8] = 0
    a = enc([curve.to_mont(v) for v in vals], curve)
    got = dec_mont(inverse.batch_inverse(a, curve), curve)
    for v, g in zip(vals, got):
        assert g == (pow(v, -1, curve.p) if v else 0)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_batch_inverse_matches_fermat_elementwise(curve):
    vals = [1, curve.p - 1] + [rng.randrange(1, curve.p) for _ in range(6)]
    a = enc([curve.to_mont(v) for v in vals], curve)
    bi = dec_mont(inverse.batch_inverse(a, curve), curve)
    fi = dec_mont(inverse.fermat_inv(a, curve), curve)
    assert bi == fi


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_to_affine(curve):
    # random affine points scaled by random projective Z, plus one
    # infinity lane (0 : 1 : 0)
    n = 6
    pts = [(rng.randrange(1, curve.p), rng.randrange(1, curve.p))
           for _ in range(n)]
    zs = [rng.randrange(1, curve.p) for _ in range(n)]
    X = [curve.to_mont(x * z % curve.p) for (x, _), z in zip(pts, zs)]
    Y = [curve.to_mont(y * z % curve.p) for (_, y), z in zip(pts, zs)]
    Z = [curve.to_mont(z) for z in zs]
    X.append(0)
    Y.append(curve.to_mont(1))
    Z.append(0)
    p = ProjPoint(enc(X, curve), enc(Y, curve), enc(Z, curve))
    ax, ay, inf = inverse.to_affine(p, curve)
    ax_i = dec_mont(ax, curve)
    ay_i = dec_mont(ay, curve)
    inf = np.asarray(inf)
    for i, (x, y) in enumerate(pts):
        assert not inf[i]
        assert (ax_i[i], ay_i[i]) == (x, y)
    assert inf[n]
    assert ax_i[n] == 0 and ay_i[n] == 0
    # outputs are fully reduced (< p), not just < 2p
    for arr in (ax, ay):
        vals = planar_to_ints(np.asarray(arr), curve.log_limb_size)
        assert all(v < curve.p for v in vals)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_reduce_once_boundaries(curve):
    vals = [0, 1, curve.p - 1, curve.p, curve.p + 1, 2 * curve.p - 1]
    a = enc(vals, curve)
    got = planar_to_ints(np.asarray(inverse.reduce_once(a, curve)),
                         curve.log_limb_size)
    assert got == [v % curve.p for v in vals]
