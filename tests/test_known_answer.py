"""External known-answer anchor (VERDICT r3 missing-#2).

Every other test in this suite checks the device pipeline against the
in-repo python oracle — self-consistent, but a single wrong shared
assumption (curve constant, decompose semantics, Horner order) could pass
everywhere. This module pins test vectors that originate OUTSIDE this
repository and asserts that both the oracle and the end-to-end pipeline
reproduce them, the analogue of the reference asserting against Arkworks
`G::msm` (/root/reference/mopro-msm/src/msm/metal_msm/tests/cuzk/e2e.rs:14-63).

External sources (values transcribed as published, not derived here):
  * BN254 / alt_bn128 generator G1 = (1, 2) and [2]G — the EIP-196
    precompile specification's known-answer pair, reproduced in the
    go-ethereum / py_ecc test suites.
  * The group law itself: [r-1]G = -G = (1, p-2) needs only the published
    base-field and scalar-field moduli.
  * BLS12-377 G1 generator — the ZEXE paper / arkworks `g1.rs` constant.

If any repo-side constant or semantic drifted (limb layout, Montgomery
R, signed-digit decompose, window Horner), these fail even though every
oracle-vs-pipeline cross-check still passes.
"""

from tpu_msm.config import MSMConfig
from tpu_msm.constants import BLS12_377_S12, BN254_S12
from tpu_msm.cuzk.pipeline import tpu_variable_base_msm
from tpu_msm.reference import curve as ref

# --- published constants (external; do not re-derive) -------------------
BN254_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_G = (1, 2)
# EIP-196 known answer: [2] * (1, 2)
BN254_2G = (
    1368015179489954701390400359078579693043519447331113978918064868415326638035,
    9918110051302171585080402603319702774565515993150576347155970296011118125764,
)

BLS377_P = 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177
BLS377_R = 8444461749428370424248824938781546531375899335154063827935233455917409239041
BLS377_G = (
    81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
    241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
)


def _aff(curve, jac):
    return ref.to_affine(curve, jac)


# --- layer 0: the repo's curve constants match the published moduli -----

def test_constants_match_published_moduli():
    assert BN254_S12.p == BN254_P
    assert BN254_S12.scalar_modulus == BN254_R
    assert BLS12_377_S12.p == BLS377_P
    assert BLS12_377_S12.scalar_modulus == BLS377_R


# --- layer 1: the python oracle reproduces the external vectors ---------

def test_oracle_reproduces_eip196_double():
    got = ref.msm_pippenger_signed(BN254_S12, [BN254_G], [2], window=8)
    assert _aff(BN254_S12, got) == BN254_2G


def test_oracle_full_range_scalar_negates():
    # [r-1]G = -G: exercises a max-width scalar through decompose+Horner
    got = ref.msm_pippenger_signed(BN254_S12, [BN254_G], [BN254_R - 1],
                                   window=8)
    assert _aff(BN254_S12, got) == (1, BN254_P - 2)


def test_oracle_bls377_generator_order():
    assert ref.on_curve(BLS12_377_S12, (BLS377_G[0], BLS377_G[1], 1))
    got = ref.msm_pippenger_signed(BLS12_377_S12, [BLS377_G],
                                   [BLS377_R - 1], window=8)
    assert _aff(BLS12_377_S12, got) == (BLS377_G[0], BLS377_P - BLS377_G[1])


# --- layer 2: the device pipeline reproduces them end to end ------------
# ("e2e" in the names routes these to the slow tier, conftest.py)

CFG = MSMConfig(curve=BN254_S12, window_size=8, columns=32,
                pbpr_threads=16, subtask_group=8)


def test_e2e_pipeline_eip196_double():
    got = tpu_variable_base_msm([BN254_G], [2], config=CFG)
    assert _aff(BN254_S12, got) == BN254_2G


def test_e2e_pipeline_known_answer_mix():
    # 2*G + (r-1)*[2]G = 2G - 2G = INF, and then with an extra G lane the
    # whole sum lands back on the pinned generator: external points, a
    # full-range scalar, and exact cancellation in one program.
    pts = [BN254_G, BN254_2G, BN254_G]
    got = tpu_variable_base_msm(pts, [2, BN254_R - 1, 1], config=CFG)
    assert _aff(BN254_S12, got) == BN254_G

    got0 = tpu_variable_base_msm(pts[:2], [2, BN254_R - 1], config=CFG)
    assert ref.is_inf(got0) or _aff(BN254_S12, got0) is None
