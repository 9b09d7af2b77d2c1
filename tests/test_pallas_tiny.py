"""Interpret-mode CPU tests for the round-2 Pallas kernels, on TINY62.

The round-2 pipeline rewrite (pbpr_full, col_prefix, decompose_digits,
_bucket_counts + the no-fill consecutive-difference bucket extraction)
shipped with zero committed tests (VERDICT r2 missing #3). This file is
the committed version of the TINY62 interpret-mode verification: the
tiny curve (L=6 limbs, W=8 windows) keeps interpreter-mode pallas cheap
enough for the 1-core CPU host while driving the exact kernel code the
production BN254 profiles compile on TPU.

Oracles: the pure-python reference group (tpu_msm/reference/curve.py)
and the XLA twins (cuzk/decompose.py). Reference test analogue: the
per-kernel cuZK stage tests tests/cuzk/{transpose,smvp,pbpr}.rs.
"""

import numpy as np
import jax.numpy as jnp

from tpu_msm.config import MSMConfig
from tpu_msm.constants import TINY62
from tpu_msm.cuzk import decompose, kernels
from tpu_msm.cuzk.pipeline import tpu_variable_base_msm
from tpu_msm.cuzk.pipeline_pallas import _bucket_counts
from tpu_msm.ops import lazy
from tpu_msm.reference import curve as ref
from tpu_msm.utils.limbs_conversion import (planar_signed_to_ints_modp,
                                            points_to_planar,
                                            scalars_to_planar)

C = TINY62
L = C.num_limbs
RNG = np.random.default_rng(11)


def to_mont_stacked(pts, shape):
    """Affine int points -> (3, L, *shape) stacked Montgomery projective."""
    xs, ys = points_to_planar(pts, C)
    xm = lazy.to_mont(jnp.asarray(xs.astype(np.int32)), C)
    ym = lazy.to_mont(jnp.asarray(ys.astype(np.int32)), C)
    one = jnp.broadcast_to(lazy.mont_one(C, 1), xm.shape)
    return jnp.stack([xm, ym, one]).reshape(3, L, *shape)


def decode_stacked(p):
    """(3, L, ...) stacked lazy projective -> list of oracle Jac tuples."""
    arr = np.asarray(p).reshape(3, L, -1)
    xs = planar_signed_to_ints_modp(arr[0], C)
    ys = planar_signed_to_ints_modp(arr[1], C)
    zs = planar_signed_to_ints_modp(arr[2], C)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(ref.INF)
        else:
            zi = pow(z, -1, C.p)
            out.append(((x * zi) % C.p, (y * zi) % C.p, 1))
    return out


def rand_points(k, seed):
    pts, _ = ref.gen_points_scalars(C, k, seed=seed)
    return pts


def jac(p):
    """Affine (x, y) -> Jacobian (x, y, 1) for the python oracle."""
    return (p[0], p[1], 1)


# ---------------------------------------------------------------------------
# decompose_digits kernel vs the XLA twin
# ---------------------------------------------------------------------------


def test_decompose_digits_matches_twin():
    cfg = MSMConfig(curve=C, window_size=8, columns=16, pbpr_threads=8,
                    subtask_group=8)
    n = 64
    scalars = [int(RNG.integers(0, 1 << 62)) % C.scalar_modulus
               for _ in range(n)]
    hw = scalars_to_planar(scalars, C)
    hw = np.concatenate([hw, np.zeros((2, n), np.uint32)], axis=0)
    want = decompose.decompose(jnp.asarray(hw), cfg)
    got = kernels.decompose_digits(jnp.asarray(hw.astype(np.int32)),
                                   cfg.window_size, cfg.num_windows)
    assert jnp.array_equal(got, want)
    # reconstruction: sum_w d_w * 2^(s*w) == scalar
    d = np.asarray(got)
    for j, k in enumerate(scalars):
        assert sum(int(d[w, j]) << (8 * w) for w in range(d.shape[0])) == k


# ---------------------------------------------------------------------------
# _bucket_counts vs a numpy oracle
# ---------------------------------------------------------------------------


def test_bucket_counts_oracle():
    W, n, B = 5, 96, 16
    keys2 = RNG.integers(0, 2 * B + 1, (W, n)).astype(np.int32)
    got = np.asarray(_bucket_counts(jnp.asarray(keys2), n, B))
    for w in range(W):
        for j in range(B + 1):
            assert got[w, j] == int((keys2[w] < 2 * (j + 1)).sum()), (w, j)


def test_bucket_counts_block_path_oracle():
    """The block-level path (sorted keys provided, n a multiple of the
    block size) must agree with the flat-rank oracle, including the
    all-below / all-above / empty-bucket extremes."""
    W, n, B = 4, 512, 16          # n = 8 blocks of 64
    keys2 = RNG.integers(0, 2 * B + 1, (W, n)).astype(np.int32)
    keys2[1] = 0                  # every key below every query
    keys2[2] = 2 * B + 1          # every key at the top (above q_0..q_B-1)
    skeys2 = np.sort(keys2, axis=-1)
    got = np.asarray(_bucket_counts(jnp.asarray(keys2), n, B,
                                    jnp.asarray(skeys2)))
    want = np.stack([(keys2 < 2 * (j + 1)).sum(axis=-1)
                     for j in range(B + 1)], axis=-1)
    assert (got == want).all(), (got, want)


# ---------------------------------------------------------------------------
# prefix_scan row-unroll equivalence
# ---------------------------------------------------------------------------


def test_prefix_scan_unroll_bit_identical():
    """K stream rows per grid step (kernels.prefix_scan unroll) is pure
    loop restructuring — outputs must match the K=1 form bit-for-bit."""
    F8, R = 16, 8
    rng = np.random.default_rng(13)
    sx = jnp.asarray(rng.integers(0, 1 << 12, (L * 8, R * F8),
                                  dtype=np.int32))
    sy = jnp.asarray(rng.integers(0, 1 << 12, (L * 8, R * F8),
                                  dtype=np.int32))
    sg = jnp.asarray(rng.integers(0, 2, (8, R * F8), dtype=np.int32))
    o1 = kernels.prefix_scan(sx, sy, sg, C, F8, unroll=1)
    for k in (2, 4, 8):
        ok = kernels.prefix_scan(sx, sy, sg, C, F8, unroll=k)
        assert jnp.array_equal(o1, ok), k


# ---------------------------------------------------------------------------
# col_prefix kernel vs python prefix sums
# ---------------------------------------------------------------------------


def test_col_prefix_exclusive_prefix():
    Wg, Cc = 4, 8
    pts = rand_points(Wg * Cc, seed=21)
    stacked = to_mont_stacked(pts, (Wg, Cc))
    out = kernels.col_prefix(stacked, C)
    got = decode_stacked(out)
    for w in range(Wg):
        acc = ref.INF
        for c in range(Cc):
            want = acc  # EXCLUSIVE prefix: sum of columns < c
            assert ref.jac_eq(C, got[w * Cc + c], want), (w, c)
            acc = ref.add(C, acc, jac(pts[w * Cc + c]))


# ---------------------------------------------------------------------------
# pbpr_full kernel vs the weighted-sum oracle
# ---------------------------------------------------------------------------


def test_pbpr_full_weighted_sums():
    W, B, T = 4, 16, 4
    pts = rand_points(W * B, seed=33)
    buckets = to_mont_stacked(pts, (W, B))
    out = kernels.pbpr_full(buckets, C, T)       # (3, L, W)
    got = decode_stacked(out)
    for w in range(W):
        want = ref.INF
        for b in range(B):
            want = ref.add(C, want,
                           ref.scalar_mul(C, jac(pts[w * B + b]), b + 1))
        assert ref.jac_eq(C, got[w], want), w


def test_pbpr_full_handles_infinity_buckets():
    # empty buckets arrive as exact projective infinity from the no-fill
    # extraction; pbpr must treat them as the identity
    W, B, T = 2, 8, 2
    pts = rand_points(W * B, seed=47)
    buckets = np.asarray(to_mont_stacked(pts, (W, B)))
    inf = np.asarray(kernels.inf_stacked(C, (W, B)))
    kill = RNG.random((W, B)) < 0.4
    buckets = np.where(kill[None, None], inf, buckets)
    out = kernels.pbpr_full(jnp.asarray(buckets), C, T)
    got = decode_stacked(out)
    for w in range(W):
        want = ref.INF
        for b in range(B):
            if not kill[w, b]:
                want = ref.add(C, want,
                               ref.scalar_mul(C, jac(pts[w * B + b]), b + 1))
        assert ref.jac_eq(C, got[w], want), w


# ---------------------------------------------------------------------------
# Full pallas pipeline e2e (no-fill extraction + all four kernels)
# ---------------------------------------------------------------------------


def _e2e_case(cfg, n, seed):
    pts, scalars = ref.gen_points_scalars(C, n, seed=seed)
    got = tpu_variable_base_msm(pts, scalars, config=cfg)
    want = ref.INF
    for p, k in zip(pts, scalars):
        want = ref.add(C, want, ref.scalar_mul(C, jac(p), k))
    assert ref.jac_eq(C, got, want)


def test_e2e_pallas_tiny_single_group():
    # n == F == Wg*C -> R=1, G=1: the non-scan extraction path
    cfg = MSMConfig(curve=C, window_size=8, columns=32, pbpr_threads=16,
                    subtask_group=8, backend="pallas")
    _e2e_case(cfg, 256, seed=61)


def test_e2e_pallas_tiny_grouped():
    # W=8, Wg=4 -> G=2 groups: the lax.scan extraction path
    cfg = MSMConfig(curve=C, window_size=8, columns=64, pbpr_threads=16,
                    subtask_group=4, backend="pallas")
    _e2e_case(cfg, 256, seed=77)


def test_e2e_pallas_tiny_fori_matches_unroll():
    # The G>1 window-group loop has two lowerings: static python unroll
    # and lax.fori_loop over one traced body (the default — device-
    # validated EXACT on TPU in r4, and the compile-cost fix for the
    # axon remote compiler whose cost scales with unrolled group count).
    # Both must produce bit-identical window sums.
    base = dict(curve=C, window_size=8, columns=64, pbpr_threads=16,
                subtask_group=4, backend="pallas")
    pts, scalars = ref.gen_points_scalars(C, 256, seed=83)
    a = tpu_variable_base_msm(pts, scalars,
                              config=MSMConfig(group_loop="fori", **base))
    b = tpu_variable_base_msm(pts, scalars,
                              config=MSMConfig(group_loop="unroll", **base))
    assert ref.jac_eq(C, a, b)
    want = ref.msm_pippenger_signed(C, pts, scalars, window=8)
    assert ref.jac_eq(C, a, want)
