"""Pallas kernel path (cuzk/kernels.py + pipeline_pallas.py), run in
interpreter mode on the CPU backend — small shapes, exact equality
against the stacked-op twins and the python oracle. The same code runs
compiled on real TPU (bench.py / the driver entry)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.config import MSMConfig
from tpu_msm.constants import BN254_S12
from tpu_msm.cuzk import kernels
from tpu_msm.cuzk.pipeline import tpu_variable_base_msm
from tpu_msm.ops import lazy
from tpu_msm.ops.complete import ProjPoint, padd, pmadd, proj_infinity
from tpu_msm.reference import curve as ref

C = BN254_S12
L = C.num_limbs
RNG = np.random.default_rng(5)

CFG = MSMConfig(curve=C, window_size=8, columns=32, pbpr_threads=16,
                subtask_group=8, backend="pallas")

# Interpreter-mode pallas costs minutes PER KERNEL CALL on this 1-core
# host (every interpreted op is individually dispatched/compiled), so all
# pallas_call tests run on real TPU only — scripts/tpu_verify.py executes
# this battery on-device, and the math itself is covered on CPU by
# tests/test_rows.py (rows == stacked twins == oracle).
tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="pallas kernels: TPU only (interpret too slow)")


def rand_stacked(batch):
    return jnp.asarray(RNG.integers(0, 1 << C.log_limb_size,
                                    (L,) + batch, dtype=np.int32))


def test_encode_mont_matches_lazy():
    xs = rand_stacked((64,))
    got = kernels.encode_mont(xs, C)
    want = lazy.to_mont(xs, C)
    assert jnp.array_equal(got, want)


@tpu_only
def test_padd_psub_pdbl_batch():
    p = jnp.stack([rand_stacked((2, 16)) for _ in range(3)])  # (3,L,2,16)
    q = jnp.stack([rand_stacked((2, 16)) for _ in range(3)])
    want = padd(ProjPoint(p[0], p[1], p[2]), ProjPoint(q[0], q[1], q[2]), C)
    got = kernels.padd_batch(p, q, C)
    assert jnp.array_equal(jnp.stack(want), got)

    from tpu_msm.ops.complete import pdbl
    d_want = jnp.stack(tuple(pdbl(ProjPoint(p[0], p[1], p[2]), C)))
    assert jnp.array_equal(d_want, kernels.pdbl_batch(p, C))


@tpu_only
def test_psub_is_group_subtraction():
    # random curve points a, b: (a+b) - b == a  (projectively)
    pts, _ = ref.gen_points_scalars(C, 4, seed=9)
    from tpu_msm.utils.limbs_conversion import points_to_planar
    from tpu_msm.utils.limbs_conversion import planar_signed_to_ints_modp

    def to_mont_stacked(pts):
        xs, ys = points_to_planar(pts, C)
        xm = lazy.to_mont(jnp.asarray(xs.astype(np.int32)), C)
        ym = lazy.to_mont(jnp.asarray(ys.astype(np.int32)), C)
        one = jnp.broadcast_to(lazy.mont_one(C, 1), xm.shape)
        return jnp.stack([xm, ym, one])

    a = to_mont_stacked(pts[:2])
    b = to_mont_stacked(pts[2:])
    apb = kernels.padd_batch(a, b, C)
    back = kernels.psub_batch(apb, b, C)

    # compare projectively vs the oracle points
    bx = planar_signed_to_ints_modp(np.asarray(back[0]), C)
    by = planar_signed_to_ints_modp(np.asarray(back[1]), C)
    bz = planar_signed_to_ints_modp(np.asarray(back[2]), C)
    rinv = C.rinv
    for i, (x, y) in enumerate(pts[:2]):
        gx, gy, gz = (bx[i] * rinv) % C.p, (by[i] * rinv) % C.p, (bz[i] * rinv) % C.p
        assert gz != 0
        zi = pow(gz, -1, C.p)
        assert (gx * zi) % C.p == x and (gy * zi) % C.p == y


@tpu_only
def test_prefix_scan_matches_pmadd_chain():
    # kernel-layout test: random (L*8, R*F8) streams, kernel prefix sums
    # vs a stacked-op pmadd chain over the same blocks. F8 must be a
    # multiple of 128: Mosaic requires non-full lane blocks to tile by
    # 128 (the production pipeline always has F8 = Wg*C/8 >= 256).
    F8, R = 128, 4
    n8 = R * F8
    pts, _ = ref.gen_points_scalars(C, 8 * n8, seed=10)
    from tpu_msm.utils.limbs_conversion import points_to_planar
    xs, ys = points_to_planar(pts, C)
    xm = lazy.to_mont(jnp.asarray(xs.astype(np.int32)), C)
    ym = lazy.to_mont(jnp.asarray(ys.astype(np.int32)), C)
    sx8 = xm.reshape(L, 8, n8).reshape(L * 8, n8)
    sy8 = ym.reshape(L, 8, n8).reshape(L * 8, n8)
    sign8 = jnp.zeros((8, n8), jnp.int32).at[3, ::5].set(1)

    tbuf = kernels.prefix_scan(sx8, sy8, sign8, C, F8)

    sx4 = sx8.reshape(L, 8, n8)
    sy4 = sy8.reshape(L, 8, n8)
    sy_eff = jnp.where(sign8[None] != 0, lazy.neg(sy4, C, 2), sy4)
    want = np.zeros((3, L, 8, n8), np.int32)
    carry = proj_infinity(C, (8, F8))
    for r in range(R):
        xr = sx4[..., r * F8:(r + 1) * F8]
        yr = sy_eff[..., r * F8:(r + 1) * F8]
        carry = pmadd(carry, xr, yr, C)
        want[..., r * F8:(r + 1) * F8] = np.stack(
            [np.asarray(carry.x), np.asarray(carry.y), np.asarray(carry.z)])
    assert np.array_equal(np.asarray(tbuf).reshape(3, L, 8, n8), want)


@tpu_only
def test_pbpr_stage1_matches_reference():
    W, B, T = 3, 16, 4
    Bt = B // T
    bk = jnp.stack([rand_stacked((W, B)) for _ in range(3)])  # (3,L,W,B)
    m, g = kernels.pbpr_stage1(bk, C, T)

    mw = proj_infinity(C, (W, T))
    gw = proj_infinity(C, (W, T))
    for j in range(Bt):
        idx = jnp.arange(T) * Bt + (Bt - 1 - j)
        pt = ProjPoint(bk[0][:, :, idx], bk[1][:, :, idx], bk[2][:, :, idx])
        mw = padd(mw, pt, C)
        gw = padd(gw, mw, C)
    assert jnp.array_equal(m, jnp.stack(mw))
    assert jnp.array_equal(g, jnp.stack(gw))


def msm_oracle(c, pts, scalars):
    return ref.msm_pippenger_signed(c, pts, scalars, window=8)


@tpu_only
def test_pallas_e2e_random():
    pts, scalars = ref.gen_points_scalars(C, 200, seed=91)
    got = tpu_variable_base_msm(pts, scalars, config=CFG)
    assert ref.jac_eq(C, got, msm_oracle(C, pts, scalars))


@tpu_only
def test_pallas_e2e_adversarial():
    pts, scalars = ref.gen_points_scalars(C, 64, seed=92)
    pts = pts + pts[:32]
    scalars = scalars + scalars[:32]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = C.scalar_modulus - 1
    got = tpu_variable_base_msm(pts, scalars, config=CFG)
    assert ref.jac_eq(C, got, msm_oracle(C, pts, scalars))


@tpu_only
def test_pallas_e2e_equal_scalars():
    pts, _ = ref.gen_points_scalars(C, 96, seed=93)
    k = 0x1234567890ABCDEF1234567890ABCDEF
    got = tpu_variable_base_msm(pts, [k] * 96, config=CFG)
    assert ref.jac_eq(C, got, msm_oracle(C, pts, [k] * 96))


@tpu_only
def test_pallas_e2e_second_geometry():
    cfg = MSMConfig(curve=C, window_size=11, columns=16, pbpr_threads=8,
                    subtask_group=4, backend="pallas")
    pts, scalars = ref.gen_points_scalars(C, 160, seed=94)
    got = tpu_variable_base_msm(pts, scalars, config=cfg)
    assert ref.jac_eq(C, got, msm_oracle(C, pts, scalars))
