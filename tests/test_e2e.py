"""End-to-end MSM tests — analogue of reference tests/cuzk/e2e.rs:14-63
(random vectors, assert exact equality vs the trusted oracle) plus the
adversarial shapes the fixed-shape TPU formulation must survive:
duplicate points, zero scalars, equal scalars (bucket runs spanning many
scan columns), input truncation, and the BLS12-377 curve module."""

import random

import pytest

from tpu_msm.config import MSMConfig
from tpu_msm.constants import BLS12_377_S12, BN254_S12
from tpu_msm.cuzk.pipeline import tpu_variable_base_msm
from tpu_msm.reference import curve as ref

# one shared small config -> one XLA compile for most tests
CFG = MSMConfig(curve=BN254_S12, window_size=8, columns=32,
                pbpr_threads=16, subtask_group=8)


def msm_oracle(c, pts, scalars):
    return ref.msm_pippenger_signed(c, pts, scalars, window=8)


# NB: persistent-cache writes are disabled suite-wide in conftest.py (the
# XLA CPU executable serializer segfaults on several e2e-sized programs).


def test_e2e_random_256():
    c = BN254_S12
    pts, scalars = ref.gen_points_scalars(c, 256, seed=71)
    got = tpu_variable_base_msm(pts, scalars, config=CFG)
    assert ref.jac_eq(c, got, msm_oracle(c, pts, scalars))


def test_e2e_adversarial_lanes():
    c = BN254_S12
    rng = random.Random(72)
    pts, scalars = ref.gen_points_scalars(c, 64, seed=72)
    pts = pts + pts[:32]            # duplicate points
    scalars = scalars + [rng.randrange(0, c.scalar_modulus) for _ in range(32)]
    scalars[0] = 0                  # zero scalar
    scalars[1] = 1
    scalars[2] = c.scalar_modulus - 1
    got = tpu_variable_base_msm(pts, scalars, config=CFG)
    assert ref.jac_eq(c, got, msm_oracle(c, pts, scalars))


def test_e2e_equal_scalars_long_runs():
    # every point gets the same digit per window -> each window has ONE
    # bucket run spanning all scan columns: maximal stress on the
    # cross-column carry stitching (smvp.py phase 2)
    c = BN254_S12
    pts, _ = ref.gen_points_scalars(c, 96, seed=73)
    k = random.Random(73).randrange(1, c.scalar_modulus)
    scalars = [k] * 96
    got = tpu_variable_base_msm(pts, scalars, config=CFG)
    assert ref.jac_eq(c, got, msm_oracle(c, pts, scalars))


def test_e2e_single_point_and_tiny():
    c = BN254_S12
    pts, scalars = ref.gen_points_scalars(c, 3, seed=74)
    got = tpu_variable_base_msm(pts[:1], scalars[:1], config=CFG)
    assert ref.jac_eq(c, got, ref.scalar_mul(c, (*pts[0], 1), scalars[0]))
    got3 = tpu_variable_base_msm(pts, scalars, config=CFG)
    assert ref.jac_eq(c, got3, msm_oracle(c, pts, scalars))


def test_e2e_sum_to_infinity():
    # scalars arranged so the total is the point at infinity
    c = BN254_S12
    pts, _ = ref.gen_points_scalars(c, 2, seed=75)
    pts = [pts[0], pts[0]]
    scalars = [5, c.scalar_modulus - 5]
    got = tpu_variable_base_msm(pts, scalars, config=CFG)
    assert ref.is_inf(got)


def test_truncate_and_empty_semantics():
    # metal_variable_base_msm parity (metal_msm.rs:647-656)
    c = BN254_S12
    pts, scalars = ref.gen_points_scalars(c, 8, seed=76)
    full = tpu_variable_base_msm(pts, scalars, config=CFG)
    trunc = tpu_variable_base_msm(pts, scalars + [12345] * 5, config=CFG)
    assert ref.jac_eq(c, full, trunc)
    trunc2 = tpu_variable_base_msm(pts + pts[:3], scalars, config=CFG)
    assert ref.jac_eq(c, full, trunc2)
    with pytest.raises(ValueError):
        tpu_variable_base_msm([], [], config=CFG)


def test_e2e_second_config_shapes():
    # different window/column/pbpr geometry (R>1 with multi-row columns,
    # odd window 11) exercises independent shape paths
    c = BN254_S12
    cfg = MSMConfig(curve=c, window_size=11, columns=16,
                    pbpr_threads=8, subtask_group=4)
    pts, scalars = ref.gen_points_scalars(c, 160, seed=77)
    got = tpu_variable_base_msm(pts, scalars, config=cfg)
    assert ref.jac_eq(c, got, msm_oracle(c, pts, scalars))


def test_e2e_bls12_377():
    # the curve-abstraction stretch goal (BASELINE.json configs[4])
    c = BLS12_377_S12
    cfg = MSMConfig(curve=c, window_size=8, columns=32,
                    pbpr_threads=16, subtask_group=8)
    pts, scalars = ref.gen_points_scalars(c, 96, seed=78)
    got = tpu_variable_base_msm(pts, scalars, config=cfg, curve=c)
    assert ref.jac_eq(c, got, msm_oracle(c, pts, scalars))


def test_e2e_chunked_multi_pass():
    # max_points_per_pass smaller than n: several device passes of one
    # compiled program, combined on host (additivity of window sums)
    import dataclasses
    c = BN254_S12
    cfg = dataclasses.replace(CFG, max_points_per_pass=64)
    pts, scalars = ref.gen_points_scalars(c, 128, seed=79)
    got = tpu_variable_base_msm(pts, scalars, config=cfg)
    assert ref.jac_eq(c, got, msm_oracle(c, pts, scalars))


def test_e2e_bn254_s13_profile():
    # 13-bit/21-limb signed profile: exercises the mid-loop carry fold in
    # the Montgomery multipliers (constants.signed_fold_interval(13) < L)
    from tpu_msm.constants import BN254_S13
    c = BN254_S13
    cfg = MSMConfig(curve=c, window_size=8, columns=32,
                    pbpr_threads=16, subtask_group=8)
    pts, scalars = ref.gen_points_scalars(c, 128, seed=79)
    scalars[0] = 0
    scalars[1] = c.scalar_modulus - 1
    got = tpu_variable_base_msm(pts, scalars, config=cfg)
    assert ref.jac_eq(c, got, msm_oracle(c, pts, scalars))
