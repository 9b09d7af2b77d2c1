#!/usr/bin/env python
"""Probe 3: list-form (fully unrolled, no stacked limb axis) signed-lazy
Montgomery multiply — throughput and compile time vs the stacked form."""

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

from tpu_msm.constants import BN254_S12
from tpu_msm.ops import lazy

CURVE = BN254_S12
L = CURVE.num_limbs
W = CURVE.log_limb_size
MASK = (1 << W) - 1
N0 = CURVE.n0
P_LIMBS = CURVE.p_wide_limbs()


def mont_list(a, b):
    """a, b: (L, *batch) stacked; compute via python lists of rows."""
    al = [a[i] for i in range(L)] + [jnp.zeros_like(a[0])]
    bl = [b[i] for i in range(L)]
    t = [jnp.zeros_like(a[0]) for _ in range(L + 1)]
    for i in range(L):
        bi = bl[i]
        for j in range(L + 1):
            t[j] = t[j] + al[j] * bi
        m = (t[0] * N0) & MASK
        for j in range(L + 1):
            if P_LIMBS[j]:
                t[j] = t[j] + m * P_LIMBS[j]
        c0 = t[0] >> W
        t = t[1:] + [jnp.zeros_like(a[0])]
        t[0] = t[0] + c0
    out = []
    c = jnp.zeros_like(a[0])
    for j in range(L + 1):
        s = t[j] + c
        out.append(s & MASK)
        c = s >> W
    return jnp.stack(out[:L])


def mont_list_masked(a, b):
    """Same but multiply inputs explicitly masked to the limb width
    (b limbs are canonical 12-bit; a limbs signed 14-bit -> mask to 16)."""
    al = [a[i] for i in range(L)] + [jnp.zeros_like(a[0])]
    bl = [b[i] & MASK for i in range(L)]
    t = [jnp.zeros_like(a[0]) for _ in range(L + 1)]
    for i in range(L):
        bi = bl[i]
        for j in range(L + 1):
            t[j] = t[j] + al[j] * bi
        m = (t[0] * N0) & MASK
        for j in range(L + 1):
            if P_LIMBS[j]:
                t[j] = t[j] + m * P_LIMBS[j]
        c0 = t[0] >> W
        t = t[1:] + [jnp.zeros_like(a[0])]
        t[0] = t[0] + c0
    out = []
    c = jnp.zeros_like(a[0])
    for j in range(L + 1):
        s = t[j] + c
        out.append(s & MASK)
        c = s >> W
    return jnp.stack(out[:L])


def bench(name, fn, args, runs=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    s = statistics.median(ts)
    batch = args[0].size // L
    print(f"{name:34s} {s*1e3:9.3f} ms  {s/batch*1e9:8.2f} ns/elem  "
          f"(compile {compile_s:.1f}s)")
    return s


def main():
    print(f"device={jax.devices()[0].device_kind}  L={L} w={W}")
    rng = np.random.default_rng(0)
    for batch in ((4, 256), (4, 2048), (8, 2048)):
        a = jnp.asarray(rng.integers(0, 1 << W, (L,) + batch, dtype=np.int32))
        b = jnp.asarray(rng.integers(0, 1 << W, (L,) + batch, dtype=np.int32))
        print(f"-- batch {batch}")
        bench("stacked mont_mul (current)",
              jax.jit(lambda x, y: lazy.mont_mul(x, y, CURVE)), (a, b))
        bench("list mont_mul", jax.jit(mont_list), (a, b))
        bench("list mont_mul masked", jax.jit(mont_list_masked), (a, b))
        # chain of 12 dependent muls ~ one pmadd's mul load
        def chain12(x, y):
            for _ in range(12):
                x = mont_list_masked(x, y)
            return x
        bench("12x chained list masked", jax.jit(chain12), (a, b))


if __name__ == "__main__":
    main()
