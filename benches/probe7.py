#!/usr/bin/env python
"""Probe 7: Pallas/Mosaic compile time + throughput for list-form signed
Montgomery multiply, single mul and a 12-mul pmadd-scale chain."""

import functools
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_msm.constants import BN254_S12

CURVE = BN254_S12
L = CURVE.num_limbs
W = CURVE.log_limb_size
MASK = (1 << W) - 1
N0 = CURVE.n0
P = CURVE.p_wide_limbs()  # L+1 python ints


def mont_rows(a_rows, b_rows):
    """List-form deferred-carry Montgomery multiply on per-limb 2D rows."""
    z = jnp.zeros_like(a_rows[0])
    t = [z] * (L + 1)
    a_pad = list(a_rows) + [z]
    for i in range(L):
        bi = b_rows[i]
        t = [t[j] + a_pad[j] * bi for j in range(L + 1)]
        m = (t[0] * N0) & MASK
        t = [t[j] + m * P[j] if P[j] else t[j] for j in range(L + 1)]
        c0 = t[0] >> W
        t = t[1:] + [z]
        t[0] = t[0] + c0
    out = []
    c = z
    for j in range(L + 1):
        s = t[j] + c
        out.append(s & MASK)
        c = s >> W
    return out[:L]


def kernel_mont1(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    r = mont_rows(a, b)
    for i in range(L):
        o_ref[i] = r[i]


def kernel_mont12(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    for _ in range(12):
        a = mont_rows(a, b)
    for i in range(L):
        o_ref[i] = a[i]


def bench(name, fn, args, runs=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    s = statistics.median(ts)
    print(f"{name:44s} {s*1e3:9.3f} ms (compile {c:.1f}s)", flush=True)
    return s, out


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    for (S, Cn) in ((8, 1024), (32, 1024)):
        shape = (L, S, Cn)
        a = jnp.asarray(rng.integers(0, 1 << W, shape, dtype=np.int32))
        b = jnp.asarray(rng.integers(0, 1 << W, shape, dtype=np.int32))

        f1 = jax.jit(pl.pallas_call(
            kernel_mont1,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        s, out = bench(f"pallas mont x1 batch {S}x{Cn}", f1, (a, b))
        batch = S * Cn
        print(f"   -> {s/batch*1e9:7.2f} ns/elem-mul", flush=True)

        # correctness vs python ints on a few elements
        av = np.asarray(a).astype(object)
        bv = np.asarray(b).astype(object)
        ov = np.asarray(out)
        ok = True
        for e in [(0, 0), (3, 77)]:
            ai = sum(int(av[i][e]) << (W * i) for i in range(L))
            bi = sum(int(bv[i][e]) << (W * i) for i in range(L))
            want = (ai * bi * pow(1 << (W * L), -1, CURVE.p)) % CURVE.p
            got = sum(int(ov[i][e]) << (W * i) for i in range(L))
            ok &= (got % CURVE.p == want) and got < 2 * CURVE.p
        print(f"   correctness: {ok}", flush=True)

        f12 = jax.jit(pl.pallas_call(
            kernel_mont12,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        s, _ = bench(f"pallas mont x12 batch {S}x{Cn}", f12, (a, b))
        print(f"   -> {s/batch/12*1e9:7.2f} ns/elem-mul; "
              f"point-add-equiv {s/batch*1e9:6.1f} ns -> 2^16x20w "
              f"~ {s/batch*(1<<16)*20*1e3:5.0f} ms", flush=True)


if __name__ == "__main__":
    main()
