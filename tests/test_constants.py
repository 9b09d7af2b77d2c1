"""Constants pyramid layer — analogue of the reference's constant-loading
tests (tests/misc/get_constant.rs) and mont/barrett param tests
(mont_params.rs:116-123, barrett_params.rs)."""

import pytest

from tpu_msm.constants import (BLS12_377, BN254, calc_barrett_mu,
                               calc_rinv_and_n0, int_to_limbs, limbs_to_int)


def test_bn254_moduli_bit_lengths():
    assert BN254.p.bit_length() == 254
    assert BN254.scalar_modulus.bit_length() == 254
    assert BN254.scalar_bits == 254


def test_n0_pinned_value():
    # Pinned in the reference: shader/constants.metal:9 (#define N0 25481)
    # and mont_params.rs test :116-123.
    assert BN254.n0 == 25481


def test_rinv_identity():
    # rinv * R == 1 (mod p) — the defining property (mont_params.rs:44-77
    # asserts the same algebraic identities).
    assert (BN254.rinv * BN254.mont_radix) % BN254.p == 1


def test_r2_encoding_roundtrip():
    x = 123456789123456789123456789
    xm = BN254.to_mont(x)
    assert BN254.from_mont(xm) == x
    # mont_mul(x, R2) == x*R mod p when x is in standard form:
    assert (x * BN254.r2_mod_p * BN254.rinv) % BN254.p == BN254.to_mont(x)


def test_barrett_mu():
    mu = calc_barrett_mu(BN254.p, 16, 16)
    assert mu == (1 << 512) // BN254.p
    assert mu.bit_length() == 259  # fits the reference's 17-limb array
    assert len(BN254.mu_limbs()) == 17


def test_nsafe():
    # NSAFE == 1 for 16-bit limbs (shader/constants.metal:10).
    assert BN254.nsafe == 1


def test_limb_roundtrip():
    for v in [0, 1, BN254.p - 1, BN254.p, (1 << 256) - 1]:
        limbs = int_to_limbs(v, 16, 16)
        assert len(limbs) == 16
        assert all(0 <= l < (1 << 16) for l in limbs)
        assert limbs_to_int(limbs, 16) == v
    with pytest.raises(ValueError):
        int_to_limbs(1 << 256, 16, 16)


def test_generators_on_curve():
    for c in (BN254, BLS12_377):
        assert (c.gen_y ** 2 - (c.gen_x ** 3 + c.b_coeff)) % c.p == 0


def test_bls12_377_layout():
    assert BLS12_377.p.bit_length() == 377
    assert BLS12_377.num_limbs == 24
    assert (BLS12_377.rinv * BLS12_377.mont_radix) % BLS12_377.p == 1


def test_rinv_n0_generic():
    rinv, n0 = calc_rinv_and_n0(BN254.p, 16, 16)
    assert rinv == BN254.rinv and n0 == 25481
