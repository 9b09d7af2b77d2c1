"""GLV endomorphism decomposition (tpu_msm/glv.py + cuzk/glv.py).

No reference analogue — the reference runs plain 254-bit windows
(convert_point_coords_and_decompose_scalars.metal:94-121). Pyramid:
derivation invariants (pure ints) -> device split vs the python oracle
(bit-exact, eager) -> e2e MSM with glv=True vs the trusted oracle."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm import glv as glv_host
from tpu_msm.config import MSMConfig
from tpu_msm.constants import BLS12_377_S13, BN254_S12, BN254_S13
from tpu_msm.reference import curve as ref
from tpu_msm.utils.limbs_conversion import scalars_to_planar

CURVES = [BN254_S13, BLS12_377_S13]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_derivation_invariants(curve):
    g = glv_host.derive(curve)
    r, p = curve.scalar_modulus, curve.p
    assert pow(g.lam, 3, r) == 1 and g.lam != 1
    assert pow(g.beta, 3, p) == 1 and g.beta != 1
    # endomorphism acts as [lambda] on G1
    gen = (curve.gen_x, curve.gen_y, 1)
    assert ref.jac_eq(curve, ref.scalar_mul(curve, gen, g.lam),
                      (g.beta * curve.gen_x % p, curve.gen_y, 1))
    # basis vectors lie in the lattice; det and sign normalization
    assert (g.a1 + g.b1 * g.lam) % r == 0
    assert (g.a2 + g.b2 * g.lam) % r == 0
    assert g.a1 * g.b2 - g.a2 * g.b1 == r
    assert g.b1 <= 0 <= g.b2
    assert g.max_bits <= 128  # the whole point: ~half of scalar_bits


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_decompose_oracle_fuzz(curve):
    g = glv_host.derive(curve)
    r = curve.scalar_modulus
    rng = random.Random(81)
    ks = [0, 1, 2, r - 1, r - 2, g.lam, r - g.lam] + \
         [rng.randrange(r) for _ in range(500)]
    for k in ks:
        k1, k2 = g.decompose(k)
        assert (k1 + k2 * g.lam - k) % r == 0, k
        assert abs(k1) <= g.max_abs and abs(k2) <= g.max_abs, k


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_device_split_matches_oracle(curve):
    # eager numeric check: device halfword arithmetic == python oracle
    from tpu_msm.cuzk.glv import B_LIMBS, split_scalars
    g = glv_host.derive(curve)
    r = curve.scalar_modulus
    rng = random.Random(82)
    ks = [0, 1, r - 1, g.lam] + [rng.randrange(r) for _ in range(60)]
    hw = jnp.asarray(scalars_to_planar(ks, curve))
    neg1, mag1, neg2, mag2 = split_scalars(hw, g)
    neg1, mag1 = np.asarray(neg1), np.asarray(mag1)
    neg2, mag2 = np.asarray(neg2), np.asarray(mag2)
    for i, k in enumerate(ks):
        en1, em1, en2, em2 = g.split_signed(k)
        got1 = sum(int(mag1[j, i]) << (16 * j) for j in range(B_LIMBS))
        got2 = sum(int(mag2[j, i]) << (16 * j) for j in range(B_LIMBS))
        assert (bool(neg1[i]), got1) == (en1, em1), k
        assert (bool(neg2[i]), got2) == (en2, em2), k


def _glv_cfg(curve):
    return MSMConfig(curve=curve, window_size=8, columns=32,
                     pbpr_threads=16, subtask_group=8, glv=True)


def test_glv_window_count_halves():
    cfg = _glv_cfg(BN254_S13)
    base = MSMConfig(curve=BN254_S13, window_size=8, columns=32,
                     pbpr_threads=16, subtask_group=8)
    assert cfg.num_windows <= base.num_windows // 2 + 1
    # carry-safety: top window width stays below s
    s = cfg.window_size
    assert cfg.effective_scalar_bits - s * (cfg.num_windows - 1) < s


def test_e2e_glv_bn254():
    from tpu_msm.cuzk.pipeline import tpu_variable_base_msm
    c = BN254_S13
    pts, scalars = ref.gen_points_scalars(c, 128, seed=83)
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = c.scalar_modulus - 1
    got = tpu_variable_base_msm(pts, scalars, config=_glv_cfg(c))
    assert ref.jac_eq(c, got,
                      ref.msm_pippenger_signed(c, pts, scalars, window=8))


def test_e2e_glv_bls12_377():
    from tpu_msm.cuzk.pipeline import tpu_variable_base_msm
    c = BLS12_377_S13
    pts, scalars = ref.gen_points_scalars(c, 96, seed=84)
    got = tpu_variable_base_msm(pts, scalars, config=_glv_cfg(c))
    assert ref.jac_eq(c, got,
                      ref.msm_pippenger_signed(c, pts, scalars, window=8))
