"""Curve and limb-layout constants, derived from first principles.

TPU-native analogue of the reference's parameter machinery:
  - mopro-msm/src/msm/metal_msm/utils/mont_params.rs (calc_rinv_and_n0,
    calc_mont_radix, calc_nsafe, egcd)
  - mopro-msm/src/msm/metal_msm/utils/barrett_params.rs (calc_barrett_mu)
  - mopro-msm/src/msm/metal_msm/host/shader.rs:37-178 (constants codegen ->
    shader/constants.metal)

Unlike the reference (which bakes one BN254 configuration into a generated
Metal header), every derived quantity here lives on a `CurveParams` dataclass
so additional curves (BLS12-377, the stretch goal in BASELINE.json configs[4])
reuse the same kernels.

Pinned test anchors replicated from the reference (see tests/test_constants.py):
  N0 = 25481 for BN254 with 16x16-bit limbs (shader/constants.metal:9,
  mont_params.rs test :116-123).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

# ---------------------------------------------------------------------------
# Limb helpers (host side, python ints). Analogue of
# utils/limbs_conversion.rs `GenericLimbConversion` (to/from u32 limbs).
# ---------------------------------------------------------------------------


def int_to_limbs(x: int, num_limbs: int, log_limb_size: int) -> List[int]:
    """Little-endian fixed-width limb decomposition of a non-negative int."""
    if x < 0:
        raise ValueError("int_to_limbs requires a non-negative integer")
    mask = (1 << log_limb_size) - 1
    out = []
    for _ in range(num_limbs):
        out.append(x & mask)
        x >>= log_limb_size
    if x != 0:
        raise ValueError("value does not fit in the requested limb layout")
    return out


def limbs_to_int(limbs, log_limb_size: int) -> int:
    acc = 0
    for i, l in enumerate(limbs):
        acc |= int(l) << (i * log_limb_size)
    return acc


def egcd(a: int, b: int) -> Tuple[int, int, int]:
    """Extended gcd; returns (g, s, t) with a*s + b*t = g.

    Mirrors the recursive egcd of mont_params.rs:35-42 (textbook algorithm).
    """
    if a == 0:
        return b, 0, 1
    g, s, t = egcd(b % a, a)
    return g, t - (b // a) * s, s


def calc_rinv_and_n0(p: int, num_limbs: int, log_limb_size: int) -> Tuple[int, int]:
    """Montgomery parameters: rinv = R^-1 mod p, n0 = -p^-1 mod 2^w.

    Analogue of mont_params.rs `calc_rinv_and_n0` (:79-88). For BN254 with
    16x16-bit limbs this must yield n0 == 25481 (pinned in the reference at
    constants.metal:9)."""
    r = 1 << (num_limbs * log_limb_size)
    rinv = pow(r % p, -1, p)
    n0 = (-pow(p, -1, 1 << log_limb_size)) % (1 << log_limb_size)
    return rinv, n0


def calc_nsafe(log_limb_size: int) -> int:
    """How many unreduced limb-product terms fit before u32 overflow.

    Analogue of mont_params.rs `calc_nsafe` (:19-29): floor of
    (2^32 - 2^(2w)) / 2^(2w) ... expressed as in the reference via the max
    carry headroom. For w=16 this is 1 (every product must be reduced
    immediately), which is why production uses full CIOS."""
    max_int_width = 32
    rhs = 2 ** max_int_width
    mask = 2 ** log_limb_size - 1
    max_term = mask * mask
    n = 0
    acc = 0
    while acc + max_term < rhs:
        acc += max_term
        n += 1
    return max(n // 2, 1)


def calc_barrett_mu(p: int, num_limbs: int, log_limb_size: int) -> int:
    """mu = floor(b^(2k) / p) with b = 2^w, k = num_limbs.

    Analogue of barrett_params.rs `calc_barrett_mu` (:3-7); the reference
    stores this as a 17-limb constant array (constants.metal BARRETT_MU)."""
    b2k = 1 << (2 * num_limbs * log_limb_size)
    return b2k // p


# ---------------------------------------------------------------------------
# Curve parameter bundles
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CurveParams:
    """Everything the kernels need about one short-Weierstrass curve y^2=x^3+b.

    The reference hard-codes the BN254 member of this family into
    shader/constants.metal; we keep it as data so the limb kernels are
    curve-generic."""

    name: str
    p: int                 # base-field modulus
    scalar_modulus: int    # group order (Fr modulus)
    b_coeff: int           # curve constant b
    gen_x: int
    gen_y: int
    num_limbs: int = 16
    log_limb_size: int = 16

    # ---- derived quantities (cached) ----
    @functools.cached_property
    def limb_mask(self) -> int:
        return (1 << self.log_limb_size) - 1

    @functools.cached_property
    def mont_radix(self) -> int:
        """R = 2^(num_limbs * log_limb_size) (mont_params.rs:31-33)."""
        return 1 << (self.num_limbs * self.log_limb_size)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return self.mont_radix % self.p

    @functools.cached_property
    def r2_mod_p(self) -> int:
        """R^2 mod p — used to Montgomery-encode via one mont_mul.

        This replaces the reference's Barrett `field_mul(x, R)` encoding path
        (shader/cuzk/barrett_reduction.metal:114-118); see ops/mont.py."""
        return (self.r_mod_p * self.r_mod_p) % self.p

    @functools.cached_property
    def rinv(self) -> int:
        return calc_rinv_and_n0(self.p, self.num_limbs, self.log_limb_size)[0]

    @functools.cached_property
    def n0(self) -> int:
        return calc_rinv_and_n0(self.p, self.num_limbs, self.log_limb_size)[1]

    @functools.cached_property
    def nsafe(self) -> int:
        return calc_nsafe(self.log_limb_size)

    @functools.cached_property
    def barrett_mu(self) -> int:
        return calc_barrett_mu(self.p, self.num_limbs, self.log_limb_size)

    @functools.cached_property
    def scalar_bits(self) -> int:
        """Bit length of the scalar modulus (254 for BN254 Fr).

        Drives num_subtasks = ceil(scalar_bits / window) exactly as
        metal_msm.rs:83-85."""
        return self.scalar_modulus.bit_length()

    @functools.cached_property
    def scalar_limbs_u32(self) -> int:
        return (self.scalar_bits + 31) // 32

    # ---- limb-array views ----
    def p_limbs(self) -> List[int]:
        return int_to_limbs(self.p, self.num_limbs, self.log_limb_size)

    def p_wide_limbs(self) -> List[int]:
        return int_to_limbs(self.p, self.num_limbs + 1, self.log_limb_size)

    def r_limbs(self) -> List[int]:
        return int_to_limbs(self.r_mod_p, self.num_limbs, self.log_limb_size)

    def r2_limbs(self) -> List[int]:
        return int_to_limbs(self.r2_mod_p, self.num_limbs, self.log_limb_size)

    def mu_limbs(self) -> List[int]:
        return int_to_limbs(self.barrett_mu, self.num_limbs + 1, self.log_limb_size)

    def to_mont(self, x: int) -> int:
        return (x * self.mont_radix) % self.p

    def from_mont(self, x: int) -> int:
        return (x * self.rinv) % self.p


# ---------------------------------------------------------------------------
# Concrete curves
# ---------------------------------------------------------------------------

def signed_fold_interval(log_limb_size: int) -> int:
    """Safe iteration count between carry folds in the SIGNED deferred-carry
    Montgomery loop (ops/lazy.py mont_mul, ops/rows.py mont_mul_rows).

    Each loop iteration adds two products of canonical w-bit limbs to an
    int32 accumulator slot, plus carry fold-ins bounded by 2^(w+6) per
    iteration (the t[0] carry and the residue of a previous fold pass).
    K iterations between folds are safe when
    K * (2*(2^w-1)^2 + 2^(w+6)) < 2^31. For w=12 this returns 63 (> L for
    every registered profile — no folds, bit-for-bit the historical code
    path); for w=13 it returns 15 (one mid-loop fold at L=21/30)."""
    w = log_limb_size
    per_iter = 2 * ((1 << w) - 1) ** 2 + (1 << (w + 6))
    return max(1, ((1 << 31) - (1 << (w + 2))) // per_iter)


def deferred_carry_headroom(num_limbs: int, log_limb_size: int) -> float:
    """Safety ratio for the deferred-carry Montgomery multiplier
    (ops/mont.py mont_mul_deferred): accumulating 2 products per limb per
    iteration for num_limbs iterations must stay below 2^32. Returns
    2^32 / worst_case_accumulation; must be > 1 (with margin for the
    fold-in of the t[0] carry)."""
    max_prod = ((1 << log_limb_size) - 1) ** 2
    worst = 2 * num_limbs * max_prod
    worst += num_limbs * (worst >> log_limb_size)  # c0 fold-ins
    return (1 << 32) / worst


# BN254 (alt_bn128) G1 — the reference's only curve.
BN254 = CurveParams(
    name="bn254",
    p=21888242871839275222246405745257275088696311157297823662689037894645226208583,
    scalar_modulus=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    b_coeff=3,
    gen_x=1,
    gen_y=2,
    num_limbs=16,
    log_limb_size=16,
)

# BLS12-377 G1 — stretch-goal curve (BASELINE.json configs[4]); exercises the
# curve abstraction beyond 254 bits (377-bit base field -> 24 x 16-bit limbs).
BLS12_377 = CurveParams(
    name="bls12_377",
    p=0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001,
    scalar_modulus=0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001,
    b_coeff=1,
    gen_x=0x008848DEFE740A67C8FC6225BF87FF5485951E2CAA9D41BB188282C8BD37CB5CD5481512FFCD394EEAB9B16EB21BE9EF,
    gen_y=0x01914A69C5102EFF1F674F5D30AFEEC4BD7FB348CA3E52D96D182AD44FB82305C2FE3D3634A9591AFD82DE55559C8EA6,
    num_limbs=24,
    log_limb_size=16,
)

# Production limb profiles: 13-bit limbs enable the deferred-carry
# Montgomery multiplier (ops/mont.py mont_mul_deferred) — the limb axis
# vectorizes with no per-limb carry chains, the TPU-native counterpart of
# the reference's narrow-limb mont_mul_optimised (mont.metal:24-54).
BN254_F13 = dataclasses.replace(BN254, name="bn254_f13", num_limbs=20, log_limb_size=13)
BLS12_377_F12 = dataclasses.replace(BLS12_377, name="bls12_377_f12", num_limbs=32, log_limb_size=12)

# Signed-lazy production profiles (ops/lazy.py): 12-bit limbs in int32 so
# transiently-negative limbs from single-op lazy subtraction stay inside
# the multiplier's accumulation headroom.
BN254_S12 = dataclasses.replace(BN254, name="bn254_s12", num_limbs=22, log_limb_size=12)
BLS12_377_S12 = dataclasses.replace(BLS12_377, name="bls12_377_s12", num_limbs=32, log_limb_size=12)

# 13-bit signed profiles: ~9% fewer limb products per Montgomery multiply
# (L(2L+3): 945 vs 1034 for BN254) at the cost of one value-preserving
# mid-loop carry fold (signed_fold_interval(13) == 15 < L). 13x13-bit
# products still ride the Mosaic narrow-multiply fast path (<= 16x16).
# L is set by the RELAXED-OPERAND product bound, not by p alone: the
# complete-formula pipeline multiplies operands up to ~8p..54p, so the
# radix needs ~8 bits of slack over p (BN254 at L=20 / 6 slack bits
# produces wrong MSMs — verified empirically; L=21 / 19 bits is safe,
# matching BLS12_377_S12's proven 7.4-bit floor with margin).
BN254_S13 = dataclasses.replace(BN254, name="bn254_s13", num_limbs=21, log_limb_size=13)
BLS12_377_S13 = dataclasses.replace(BLS12_377, name="bls12_377_s13", num_limbs=30, log_limb_size=13)

# Tiny 62-bit test curve (NOT cryptographic): same shape as BN254
# (y^2 = x^3 + 3, generator (1, 2)) over the 62-bit prime below 2^62.
# Exists solely to keep multi-device compile checks and fast CPU tests
# cheap: the two graph dimensions that scale XLA compile time — limb
# count L (Montgomery mul is L(2L+3) ops) and window count W — are ~4x
# smaller than BN254_S12's (L=6 vs 22, W=8 vs 22 at s=8/12). All kernel
# code paths are identical. scalar_modulus is the curve's exact group
# order (found by BSGS over the Hasse interval; verified N*G = INF), so
# the oracle's mod-N scalar aggregation (preprocess.aggregate_scalars)
# remains a valid linearity identity. N = 2^2 * 7 * 19 * 631 *
# 13737849042187 — composite is fine, only N*G = INF matters.
TINY62 = CurveParams(
    name="tiny62",
    p=4611686018427387847,
    scalar_modulus=4611686020669838404,
    b_coeff=3,
    gen_x=1,
    gen_y=2,
    num_limbs=6,
    log_limb_size=12,
)

assert deferred_carry_headroom(BN254_F13.num_limbs, 13) > 1.5
assert deferred_carry_headroom(BLS12_377_F12.num_limbs, 12) > 1.5
# slack floor for the signed profiles: every transient of the
# complete-formula ledger (<= 54p operands, products <= R*p) must fit the
# radix; >= 8 slack bits is the empirically safe line (see BN254_S13 note)
for _c in (BN254_S12, BLS12_377_S12, BN254_S13, BLS12_377_S13, TINY62):
    _slack = _c.num_limbs * _c.log_limb_size - _c.p.bit_length()
    assert _slack >= 7, (_c.name, _slack)

CURVES = {c.name: c for c in (BN254, BLS12_377, BN254_F13, BLS12_377_F12,
                              BN254_S12, BLS12_377_S12,
                              BN254_S13, BLS12_377_S13, TINY62)}
