#!/usr/bin/env python
"""Probe 9 (real-time measurements with forced D2H sync):
  (a) Mosaic int-multiply width: masked 16x16 vs unbounded 32x32 chains;
  (b) prefix-scan kernel geometry: lanes/step and rows/step variants.
Decides whether canonical-limb masking can buy back the ~3x multiply
microcode cost, and the best (Wg, C) geometry."""

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpu_msm.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tpu_msm.constants import BN254_S12  # noqa: E402
from tpu_msm.cuzk import kernels  # noqa: E402

C = BN254_S12
L = C.num_limbs
CP = kernels._COMPILER_PARAMS()


def sync(out):
    leaves = jax.tree.leaves(out)
    return np.asarray(sum(jnp.sum(l[..., :1].astype(jnp.int32))
                          for l in leaves))


NULL = 0.0


def t(name, fn, *args, runs=5, note=""):
    out = fn(*args); sync(out)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter(); out = fn(*args); sync(out)
        ts.append(time.perf_counter() - t0)
    ms = statistics.median(ts) * 1e3 - NULL
    print(f"{name:46s} {ms:9.2f} ms {note}", flush=True)
    return ms


def mul_chain_kernel(masked, reps):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = a
        for _ in range(reps):
            if masked:
                acc = (acc & 0xfff) * (b & 0xfff) + a
            else:
                acc = acc * b + a
        o_ref[...] = acc
    return kernel


def main():
    global NULL
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    nf = jax.jit(lambda x: x + 1)
    sync(nf(jnp.ones((8,), jnp.int32)))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter(); sync(nf(jnp.ones((8,), jnp.int32)))
        ts.append(time.perf_counter() - t0)
    NULL = statistics.median(ts) * 1e3
    print(f"null: {NULL:.2f} ms", flush=True)

    # (a) multiply width in Mosaic
    REPS = 256
    shape = (512, 1024)
    a = jnp.asarray(rng.integers(0, 1 << 12, shape, dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 12, shape, dtype=np.int32))
    for masked in (False, True):
        f = jax.jit(pl.pallas_call(
            mul_chain_kernel(masked, REPS),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=CP))
        ms = t(f"mosaic mul chain masked={masked} x{REPS}", f, a, b)
        macs = REPS * shape[0] * shape[1]
        print(f"   -> {macs / (ms * 1e-3) / 1e12:6.2f} T MAC/s", flush=True)

    # (b) scan geometry
    n = 1 << 20
    for (Wg, Cn) in ((2, 4096), (2, 8192), (2, 16384), (4, 4096), (1, 8192)):
        sx = jnp.asarray(rng.integers(0, 1 << 12, (L, Wg, n), dtype=np.int32))
        sy = jnp.asarray(rng.integers(0, 1 << 12, (L, Wg, n), dtype=np.int32))
        sg = jnp.zeros((Wg, n), jnp.int32)
        f = jax.jit(functools.partial(kernels.prefix_scan, curve=C,
                                      columns=Cn))
        ms = t(f"prefix_scan Wg={Wg} C={Cn} (n=2^20)", f, sx, sy, sg)
        adds = Wg * n
        print(f"   -> {ms * 1e6 / adds:7.2f} ns/point-add", flush=True)


if __name__ == "__main__":
    main()
