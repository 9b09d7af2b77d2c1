#!/usr/bin/env python
"""Probe 5: verify probe4's too-good-to-be-true scan numbers — correctness
of a fori_loop mont chain vs unrolled, and R-scaling of the timing."""

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
    print(f"{name:46s} {s*1e3:9.3f} ms (compile {c:.1f}s)", flush=True)
    return s, out


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(1)
    Wg, C = 4, 1024
    batch = Wg * C

    def chain_loop(R):
        def fn(carry, xs):
            def body(r, t):
                x = jax.lax.dynamic_index_in_dim(xs, r, 0, keepdims=False)
                return lazy.mont_mul(lazy.fold(t, CURVE), x, CURVE)
            return jax.lax.fori_loop(0, R, body, carry)
        return fn

    def chain_unrolled(R):
        def fn(carry, xs):
            t = carry
            for r in range(R):
                t = lazy.mont_mul(lazy.fold(t, CURVE), xs[r], CURVE)
            return t
        return fn

    carry = jnp.asarray(rng.integers(0, 1 << 12, (L, Wg, C), dtype=np.int32))

    # correctness: loop vs unrolled (both jitted, same inputs)
    R0 = 8
    xs0 = jnp.asarray(rng.integers(0, 1 << 12, (R0, L, Wg, C), dtype=np.int32))
    a = jax.jit(chain_loop(R0))(carry, xs0)
    b = jax.jit(chain_unrolled(R0))(carry, xs0)
    print("loop == unrolled:", bool(jnp.array_equal(a, b)), flush=True)

    # R scaling of the dependent mont chain
    prev = None
    for R in (32, 64, 128, 256):
        xs = jnp.asarray(rng.integers(0, 1 << 12, (R, L, Wg, C),
                                      dtype=np.int32))
        s, _ = bench(f"mont chain fori R={R} batch={batch}",
                     jax.jit(chain_loop(R)), (carry, xs))
        per = s / (R * batch)
        macs = 22 * 2 * 23  # MACs per mont_mul per element
        print(f"   -> {per*1e9:6.2f} ns/elem-mul;"
              f" {macs/per/1e12:6.2f} T MAC/s", flush=True)
        if prev:
            print(f"   -> scaling vs R/2: {s/prev:.2f}x", flush=True)
        prev = s


if __name__ == "__main__":
    main()
