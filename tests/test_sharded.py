"""Multi-chip sharded MSM on the virtual 8-device CPU mesh — the
SURVEY.md §4 "no real cluster" strategy. Bit-exact equality between
1-device and 8-device meshes and against the python oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_msm.config import MSMConfig
from tpu_msm.constants import BN254_S12
from tpu_msm.parallel.sharded import ShardedMSMPipeline, sharded_msm
from tpu_msm.reference import curve as ref

C = BN254_S12
CFG = MSMConfig(curve=C, window_size=8, columns=32, pbpr_threads=16,
                subtask_group=8, backend="xla")


@pytest.fixture(autouse=True, scope="module")
def _no_compilation_cache():
    """The 8-device CPU executables do not survive XLA's serialization
    round-trip in this jaxlib (0.9.0): writing one SEGFAULTS the process
    and reading a previously-written entry ABORTs in deserialize. Bypass
    the persistent cache entirely for this module (reset_cache clears the
    memoized is_cache_used decision so the flag takes effect)."""
    from jax._src import compilation_cache as cc
    cc.reset_cache()
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)
    cc.reset_cache()


def msm_oracle(pts, scalars):
    return ref.msm_pippenger_signed(C, pts, scalars, window=8)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_8dev_matches_oracle():
    mesh = jax.make_mesh((8,), ("x",))
    pts, scalars = ref.gen_points_scalars(C, 300, seed=61)
    got = sharded_msm(pts, scalars, mesh, config=CFG)
    assert ref.jac_eq(C, got, msm_oracle(pts, scalars))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_matches_single_device_bitexact():
    """Window sums from the 8-chip pipeline equal the 1-chip pipeline's
    (same seeds, same config) — the cross-topology bit-exactness check
    (preprocess.rs-style shared vectors, SURVEY.md §5 checkpoint note)."""
    from tpu_msm.cuzk.pipeline import MSMPipeline
    mesh8 = jax.make_mesh((8,), ("x",))
    pts, scalars = ref.gen_points_scalars(C, 256, seed=62)
    sp = ShardedMSMPipeline(CFG, mesh8)
    xs, ys, hw = sp.pack(pts, scalars)
    w8 = sp.window_sums(xs, ys, hw)

    p1 = MSMPipeline(CFG)
    xs1, ys1, hw1 = p1.pack(pts, scalars)
    w1 = p1.window_sums(xs1, ys1, hw1)
    assert w8 == w1


@pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 devices")
def test_sharded_2dev():
    mesh = jax.make_mesh((2,), ("x",))
    pts, scalars = ref.gen_points_scalars(C, 96, seed=63)
    got = sharded_msm(pts, scalars, mesh, config=CFG)
    assert ref.jac_eq(C, got, msm_oracle(pts, scalars))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_2d_mesh_points_by_windows():
    """2x4 (points x windows) mesh: each w-shard reduces 2 of the 8
    window groups; blocks reassemble over the 'w' all-gather. TINY62
    keeps the per-chip compile small (W=8, Wg=1 -> 8 groups)."""
    from tpu_msm.constants import TINY62
    cfg = MSMConfig(curve=TINY62, window_size=8, columns=16,
                    pbpr_threads=8, subtask_group=1, backend="xla")
    mesh = jax.make_mesh((2, 4), ("x", "w"))
    pts, scalars = ref.gen_points_scalars(TINY62, 80, seed=64)
    got = sharded_msm(pts, scalars, mesh, config=cfg)
    want = ref.msm_pippenger_signed(TINY62, pts, scalars, window=8)
    assert ref.jac_eq(TINY62, got, want)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_sharded_pallas_backend_interpret():
    """The PRODUCTION pallas kernels under shard_map on the virtual CPU
    mesh (interpret mode): per-chip n == Wg*C so the kernel path is
    taken (no XLA fallback), 4-way point sharding, vs the oracle."""
    from tpu_msm.constants import TINY62
    cfg = MSMConfig(curve=TINY62, window_size=8, columns=32,
                    pbpr_threads=16, subtask_group=8, backend="pallas")
    mesh = jax.make_mesh((4,), ("x",))
    pts, scalars = ref.gen_points_scalars(TINY62, 4 * 256, seed=65)
    got = sharded_msm(pts, scalars, mesh, config=cfg)
    want = ref.msm_pippenger_signed(TINY62, pts, scalars, window=8)
    assert ref.jac_eq(TINY62, got, want)
