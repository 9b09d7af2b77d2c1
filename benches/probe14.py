"""Probe 14: bisect the Mosaic crash in the rewritten pipeline kernels.

bench.py at 2^16 (s=13, C=2048, T=256, Wg=4) dies in the TPU compile
helper with `Check failed: limits[i] <= dim(i) (2 vs. 1)` in
vector_extract_strided_slice_rule under scf_if_rule. Compile each new
kernel standalone at the production shapes to find which one.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from tpu_msm.constants import BN254_S12
from tpu_msm.cuzk import kernels

curve = BN254_S12
L = curve.num_limbs
rng = np.random.default_rng(0)

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def timed(name, fn, *args):
    t0 = time.time()
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"[probe14] {name}: OK compile+run {time.time()-t0:.1f}s",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[probe14] {name}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


if which in ("all", "digits"):
    hw = jnp.asarray(rng.integers(0, 1 << 16, (18, 65536), dtype=np.int64),
                     jnp.int32)
    timed("decompose_digits", lambda h: kernels.decompose_digits(h, 13, 20), hw)

if which in ("all", "colprefix"):
    ct = jnp.asarray(rng.integers(0, 1 << 12, (3, L, 4, 2048)), jnp.int32)
    timed("col_prefix", lambda a: kernels.col_prefix(a, curve), ct)

if which in ("all", "pbpr"):
    bk = jnp.asarray(rng.integers(0, 1 << 12, (3, L, 4, 4096)), jnp.int32)
    timed("pbpr_full W=4", lambda a: kernels.pbpr_full(a, curve, 256), bk)

if which in ("all", "pbpr20"):
    bk = jnp.asarray(rng.integers(0, 1 << 12, (3, L, 20, 4096)), jnp.int32)
    timed("pbpr_full W=20", lambda a: kernels.pbpr_full(a, curve, 256), bk)

if which in ("all", "encode"):
    xs = jnp.asarray(rng.integers(0, 1 << 12, (L, 65536)), jnp.int32)
    timed("encode_mont", lambda a: kernels.encode_mont(a, curve), xs)
