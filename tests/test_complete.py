"""Complete projective formulas (ops/complete.py) vs the python oracle —
group-element equality through every exceptional case the RCB formulas
must absorb without branches: doubling, cancellation, infinity operands."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.constants import BLS12_377_S12, BN254_S12, BN254_S13
from tpu_msm.ops import complete, lazy
from tpu_msm.reference import curve as ref
from tpu_msm.utils.limbs_conversion import (ints_to_planar,
                                            planar_signed_to_ints_modp)

rng = random.Random(41)
CURVES = [BN254_S12, BLS12_377_S12, BN254_S13]


def enc_proj(pts, c):
    """Oracle Jacobian int points -> ProjPoint in Montgomery lazy limbs.
    (Jacobian (x,y,z) -> projective (x*z, y*z^2... ) — simpler: to affine
    then (x:y:1); infinity -> (0:1:0))."""
    xs, ys, zs = [], [], []
    for p in pts:
        aff = ref.to_affine(c, p)
        if aff is None:
            xs.append(0); ys.append(c.to_mont(1)); zs.append(0)
        else:
            xs.append(c.to_mont(aff[0])); ys.append(c.to_mont(aff[1]))
            zs.append(c.to_mont(1))
    mk = lambda v: jnp.array(
        ints_to_planar(v, c.num_limbs, c.log_limb_size).astype(np.int32))
    return complete.ProjPoint(mk(xs), mk(ys), mk(zs))


def dec_proj(pp, c):
    """ProjPoint -> list of oracle points (affine or INF), canonical."""
    xs = planar_signed_to_ints_modp(pp.x, c)
    ys = planar_signed_to_ints_modp(pp.y, c)
    zs = planar_signed_to_ints_modp(pp.z, c)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(ref.INF)
        else:
            zi = pow(z, -1, c.p)
            out.append(((x * zi) % c.p, (y * zi) % c.p, 1))
    return out


def rand_pts(c, n, seed):
    g = (c.gen_x, c.gen_y, 1)
    r = random.Random(seed)
    return [ref.scalar_mul(c, g, r.randrange(1, c.scalar_modulus))
            for _ in range(n)]


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_padd_all_cases(c):
    pts = rand_pts(c, 8, 51)
    p1 = pts[:4] + [ref.INF, pts[4], pts[5], pts[6]]
    p2 = pts[2:6] + [pts[4], ref.INF, pts[5], ref.neg(c, pts[6])]
    # lanes: generic x4, inf+P, P+inf, P+P (doubling), P+(-P) (cancel)
    f = jax.jit(lambda a, b: complete.padd(a, b, c, unroll=False))
    got = dec_proj(f(enc_proj(p1, c), enc_proj(p2, c)), c)
    for g, a, b in zip(got, p1, p2):
        assert ref.jac_eq(c, g, ref.add(c, a, b))


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_pmadd_all_cases(c):
    pts = rand_pts(c, 8, 52)
    p1 = pts[:4] + [ref.INF, pts[5], pts[6], pts[7]]
    aff_pts = pts[2:6] + [pts[4], pts[5], ref.neg(c, pts[6]), pts[7]]
    affs = [ref.to_affine(c, p) for p in aff_pts]
    x2 = jnp.array(ints_to_planar([c.to_mont(a[0]) for a in affs],
                                  c.num_limbs, c.log_limb_size).astype(np.int32))
    y2 = jnp.array(ints_to_planar([c.to_mont(a[1]) for a in affs],
                                  c.num_limbs, c.log_limb_size).astype(np.int32))
    f = jax.jit(lambda a, x, y: complete.pmadd(a, x, y, c, unroll=False))
    got = dec_proj(f(enc_proj(p1, c), x2, y2), c)
    for g, a, b in zip(got, p1, affs):
        assert ref.jac_eq(c, g, ref.madd(c, a, b))


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_pdbl_all_cases(c):
    pts = rand_pts(c, 6, 53) + [ref.INF]
    f = jax.jit(lambda a: complete.pdbl(a, c, unroll=False))
    got = dec_proj(f(enc_proj(pts, c)), c)
    for g, a in zip(got, pts):
        assert ref.jac_eq(c, g, ref.dbl(c, a))


def test_chained_relaxed_operands():
    # outputs (relaxed, < 4p, negative limbs) fed back in repeatedly:
    # ((P1+P2)+(P1+P2)) + (P1+P2) via padd/pdbl chains, vs oracle
    c = BN254_S12
    pts = rand_pts(c, 4, 54)
    p1, p2 = enc_proj(pts[:2], c), enc_proj(pts[2:], c)
    f = jax.jit(lambda a, b: (lambda s: complete.padd(
        complete.pdbl(s, c, unroll=False), s, c, unroll=False))(
            complete.padd(a, b, c, unroll=False)))
    got = dec_proj(f(p1, p2), c)
    for g, a, b in zip(got, pts[:2], pts[2:]):
        s = ref.add(c, a, b)
        assert ref.jac_eq(c, g, ref.add(c, ref.dbl(c, s), s))


def test_value_bounds_stay_closed():
    # decoded raw values must stay < 4p after arbitrary op chains
    c = BN254_S12
    pts = rand_pts(c, 4, 55)
    p1, p2 = enc_proj(pts[:2], c), enc_proj(pts[2:], c)
    s = complete.padd(p1, p2, c, unroll=False)
    for _ in range(3):
        s = complete.padd(complete.pdbl(s, c, unroll=False), s, c, unroll=False)
    w = c.log_limb_size
    for coord in s:
        arr = np.asarray(coord)
        for col in arr.T:
            acc = 0
            for j in range(arr.shape[0] - 1, -1, -1):
                acc = (acc << w) + int(col[j])
            assert 0 <= acc < 4 * c.p
