"""Benchmark/test vector generation, serialization, and fast verification.

Analogue of mopro-msm/src/msm/utils/preprocess.rs (gen_random_vectors /
gen_vectors :166-191, serialize_input/deserialize_input :193-256,
FileInputIterator :26-131): deterministic vectors, persisted to disk and
reused across runs/hosts for bit-exact cross-checks.

Large-n strategy: generating n independent random points needs n oracle
scalar-muls (minutes at 2^20). Instead we generate k_base true random
points and tile them to n with fresh random scalars. MSM cost on device
is identical (the pipeline never exploits duplicates), and the result is
verifiable in O(k_base) oracle work via linearity:

    sum_i k_i * P_{i mod K} == sum_j (sum_{i = j mod K} k_i) * P_j
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from ..constants import CurveParams
from ..reference import curve as ref
from .limbs_conversion import ints_to_planar, points_to_planar

VECTOR_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "vectors")


def gen_base_points(curve: CurveParams, k: int, seed: int
                    ) -> List[Tuple[int, int]]:
    """k genuinely random affine points (oracle scalar-muls of G)."""
    import random
    rng = random.Random(seed)
    g = (curve.gen_x, curve.gen_y, 1)
    out = []
    for _ in range(k):
        p = ref.scalar_mul(curve, g, rng.randrange(1, curve.scalar_modulus))
        aff = ref.to_affine(curve, p)
        out.append(aff)
    return out


def gen_scalar_halfwords(curve: CurveParams, n: int, seed: int) -> np.ndarray:
    """(H, n) uint32 halfword array of uniform scalars < 2^(scalar_bits-1)
    (subset of the canonical range; uniform enough for benchmarking and
    exactly reproducible from the seed)."""
    rng = np.random.default_rng(seed)
    n_half = curve.scalar_limbs_u32 * 2
    hw = rng.integers(0, 1 << 16, size=(n_half, n), dtype=np.uint32)
    top_bits = (curve.scalar_bits - 1) - 16 * (n_half - 1)
    if top_bits <= 0:
        hw[n_half - 1] = 0
    else:
        hw[n_half - 1] &= (1 << top_bits) - 1
    return hw


def halfwords_to_ints(hw: np.ndarray) -> List[int]:
    out = []
    arr = hw.T
    for col in arr:
        acc = 0
        for j in range(len(col) - 1, -1, -1):
            acc = (acc << 16) | int(col[j])
        out.append(acc)
    return out


def gen_planar_inputs(curve: CurveParams, n: int, seed: int = 0,
                      k_base: int = 64):
    """Fast planar benchmark inputs: (xs, ys, halfwords, base_points).

    Points are the k_base random points tiled to n (numpy tile of the
    packed limbs — no per-point python work); scalars are fresh randoms."""
    k_base = min(k_base, n)
    base = gen_base_points(curve, k_base, seed)
    bx, by = points_to_planar(base, curve)
    reps = -(-n // k_base)
    xs = np.tile(bx, (1, reps))[:, :n].copy()
    ys = np.tile(by, (1, reps))[:, :n].copy()
    hw = gen_scalar_halfwords(curve, n, seed + 1)
    return xs, ys, hw, base


def aggregate_scalars(hw: np.ndarray, k_base: int, curve: CurveParams
                      ) -> List[int]:
    """Per-base aggregated scalars (mod r) for the linearity check."""
    scalars = halfwords_to_ints(hw)
    agg = [0] * k_base
    for i, s in enumerate(scalars):
        agg[i % k_base] = (agg[i % k_base] + s) % curve.scalar_modulus
    return agg


def expected_msm(base, hw, curve: CurveParams):
    """Oracle result of the tiled MSM in O(k_base) point work."""
    agg = aggregate_scalars(hw, len(base), curve)
    return ref.msm_pippenger_signed(curve, base, agg, window=8)


# ---- persisted vectors (serialize_input/deserialize_input analogue) ----


def vector_path(curve: CurveParams, n: int, seed: int) -> str:
    return os.path.join(VECTOR_DIR, f"{curve.name}_{n}x{seed}.npz")


def save_vectors(path: str, xs, ys, hw) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, xs=xs, ys=ys, hw=hw)


def validate_planar_points(xs: np.ndarray, ys: np.ndarray,
                           curve: CurveParams) -> None:
    """On-curve + in-field check of planar (L, n) coordinate arrays —
    the FileInputIterator Checked-mode analogue (the reference's checked
    deserialization rejects off-curve points, preprocess.rs:26-131).

    Cost scales with the number of DISTINCT points, not n: columns are
    deduplicated (chunked, memory-bounded) before the bigint checks —
    the tiled bench vectors have k_base distinct points, so checking a
    2^24 file costs 64 bigint checks. Raises ValueError naming the
    first offending point index."""
    w = curve.log_limb_size
    n = xs.shape[1]
    both = np.concatenate([xs, ys], axis=0).astype(np.int32, copy=False)
    p, b = curve.p, curve.b_coeff
    seen: set = set()
    CH = 1 << 20
    for lo in range(0, n, CH):
        cols = np.ascontiguousarray(both[:, lo:lo + CH].T)   # (ch, 2L)
        rec = cols.view(np.dtype((np.void, cols.shape[1] * 4))).ravel()
        _, uidx = np.unique(rec, return_index=True)
        for j in sorted(int(u) for u in uidx):
            key = rec[j].tobytes()
            if key in seen:
                continue
            seen.add(key)
            i = lo + j
            x = sum(int(v) << (w * k) for k, v in enumerate(xs[:, i]))
            y = sum(int(v) << (w * k) for k, v in enumerate(ys[:, i]))
            if not (0 <= x < p and 0 <= y < p):
                raise ValueError(
                    f"point {i}: coordinate out of field range (x={x:#x})")
            if (y * y - (x * x * x + b)) % p != 0:
                raise ValueError(f"point {i}: not on curve {curve.name} "
                                 f"(y^2 != x^3 + b mod p)")


def load_or_gen_vectors(curve: CurveParams, n: int, seed: int = 0,
                        k_base: int = 64, check: bool = True):
    """File-backed vectors (FileInputIterator analogue): generate once,
    reuse across runs for reproducible benches and cross-host checks.
    File loads are validated on-curve by default (`check=False` is the
    Unchecked mode for trusted re-reads); freshly generated vectors are
    trusted by construction."""
    path = vector_path(curve, n, seed)
    base = gen_base_points(curve, min(k_base, n), seed)
    if os.path.exists(path):
        d = np.load(path)
        if check:
            validate_planar_points(d["xs"], d["ys"], curve)
        return d["xs"], d["ys"], d["hw"], base
    xs, ys, hw, base = gen_planar_inputs(curve, n, seed, k_base)
    save_vectors(path, xs, ys, hw)
    return xs, ys, hw, base
