"""cuZK stage tests — analogues of reference tests/cuzk/{convert_...,
transpose}.rs: each pipeline stage vs a host mirror."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.config import MSMConfig
from tpu_msm.constants import BN254_S12
from tpu_msm.cuzk import decompose, sort
from tpu_msm.reference import curve as ref
from tpu_msm.utils.limbs_conversion import scalars_to_planar

rng = random.Random(61)


@pytest.mark.parametrize("s", [8, 12, 13, 16])
def test_decompose_matches_oracle(s):
    c = BN254_S12
    cfg = MSMConfig(curve=c, window_size=s, columns=32,
                    pbpr_threads=16, subtask_group=1)
    scalars = [0, 1, c.scalar_modulus - 1] + \
              [rng.randrange(0, c.scalar_modulus) for _ in range(61)]
    hw = scalars_to_planar(scalars, c)
    hw = np.concatenate([hw, np.zeros((2, len(scalars)), np.uint32)], axis=0)
    digits = np.asarray(decompose.decompose(jnp.array(hw), cfg))
    for i, k in enumerate(scalars):
        want = ref.decompose_signed(c, k, s, cfg.num_windows)
        assert list(digits[:, i]) == want, f"scalar {i}"


def test_decompose_reconstructs():
    c = BN254_S12
    cfg = MSMConfig(curve=c, window_size=13, columns=32,
                    pbpr_threads=16, subtask_group=1)
    scalars = [rng.randrange(0, c.scalar_modulus) for _ in range(32)]
    hw = scalars_to_planar(scalars, c)
    hw = np.concatenate([hw, np.zeros((2, 32), np.uint32)], axis=0)
    digits = np.asarray(decompose.decompose(jnp.array(hw), cfg)).astype(object)
    for i, k in enumerate(scalars):
        assert sum(int(d) << (13 * w) for w, d in enumerate(digits[:, i])) == k


def test_bucket_keys_and_sort():
    digits = jnp.array(np.array([[3, -2, 0, 5, -5, 3, 0, 1]], np.int32))
    keys, neg = sort.bucket_keys(digits)
    assert list(np.asarray(keys)[0]) == [3, 2, 0, 5, 5, 3, 0, 1]
    assert list(np.asarray(neg)[0]) == [False, True, False, False, True,
                                        False, False, False]
    skeys, perm = sort.sort_by_bucket(keys)
    sk = list(np.asarray(skeys)[0])
    assert sk == sorted(sk)
    # stable: equal keys keep original relative order
    p = list(np.asarray(perm)[0])
    assert p.index(0) < p.index(5)  # the two 3-buckets
    assert p.index(3) < p.index(4)  # the two 5-buckets


def test_csc_col_ptr_mirror():
    # vs a straightforward numpy histogram mirror, like the reference's
    # compute_expected_csc (tests/cuzk/transpose.rs:5-121)
    for trial in range(5):
        nb = rng.randrange(4, 17)
        keys = np.array([[rng.randrange(0, nb) for _ in range(50)]
                         for _ in range(3)], np.int32)
        got = np.asarray(sort.csc_col_ptr(jnp.array(keys), nb))
        for w in range(3):
            hist = np.bincount(keys[w], minlength=nb)
            want = np.concatenate([[0], np.cumsum(hist)])
            assert list(got[w]) == list(want)
