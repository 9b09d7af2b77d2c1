#!/usr/bin/env python
"""Probe 2: fori_loop per-iteration overhead and operand-width-dependent
int multiply throughput — decides the SMVP kernel restructuring."""

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


def bench(name, fn, args, runs=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    s = statistics.median(ts)
    print(f"{name:44s} {s*1e3:9.3f} ms")
    return s


def main():
    print(f"device={jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    # ---- fori_loop overhead: tiny body, many iterations ----
    x = jnp.asarray(rng.integers(0, 1 << 12, (23, 4, 256), dtype=np.int32))

    for iters in (64, 256, 1024):
        def loop(a, n=iters):
            return jax.lax.fori_loop(
                0, n, lambda i, t: (t + a) & 0xfff, jnp.zeros_like(a))
        t = bench(f"fori_loop x{iters} tiny body (23,4,256)", jax.jit(loop), (x,))
    # same but the body is ~50 vector ops (a mont_mul-step-like chain)
    def loop_fat(a):
        def body(i, t):
            for _ in range(25):
                t = (t * 3 + a) & 0x3fffffff
            return t
        return jax.lax.fori_loop(0, 256, body, jnp.zeros_like(a))
    bench("fori_loop x256 50-op body (23,4,256)", jax.jit(loop_fat), (x,))

    # with a large loop-carried buffer that is row-updated each iteration
    buf0 = jnp.zeros((256, 23, 4, 256), jnp.int32)

    def loop_carry(a, b0):
        def body(i, st):
            t, bf = st
            t = (t + a) & 0xfff
            bf = jax.lax.dynamic_update_index_in_dim(bf, t, i, axis=0)
            return t, bf
        return jax.lax.fori_loop(0, 256, body, (jnp.zeros_like(a), b0))
    bench("fori_loop x256 + row write to (256,...)", jax.jit(loop_carry),
          (x, buf0))

    # ---- operand-width-sensitive multiply ----
    M = 1 << 20
    a = jnp.asarray(rng.integers(0, 1 << 12, (M,), dtype=np.int32))
    R = 64

    def mul_unbounded(v):
        acc = v
        for _ in range(R):
            acc = acc * v + v            # acc grows -> full 32-bit mul
        return acc

    def mul_masked_inputs(v):
        acc = v
        for _ in range(R):
            acc = (acc & 0xfff) * (v & 0xfff) + acc   # 12-bit x 12-bit
        return acc

    def mul_masked16(v):
        acc = v
        for _ in range(R):
            acc = (acc & 0xffff) * (v & 0xffff) + acc  # 16x16
        return acc

    def mul_const_small(v):
        acc = v
        for _ in range(R):
            acc = acc * 12289 + v        # const 14-bit multiplier
        return acc

    def f32_fma(v):
        acc = v
        for _ in range(R):
            acc = acc * v + v
        return acc

    af = a.astype(jnp.float32)
    t0 = bench("i32 mul(unbounded)+add x64", jax.jit(mul_unbounded), (a,))
    t1 = bench("i32 mul(12bx12b masked)+add x64", jax.jit(mul_masked_inputs), (a,))
    t2 = bench("i32 mul(16bx16b masked)+add x64", jax.jit(mul_masked16), (a,))
    t3 = bench("i32 mul(const 14b)+add x64", jax.jit(mul_const_small), (a,))
    t4 = bench("f32 fma x64", jax.jit(f32_fma), (af,))
    print(f"ratios vs f32: unbounded {t0/t4:.2f} masked12 {t1/t4:.2f} "
          f"masked16 {t2/t4:.2f} const {t3/t4:.2f}")

    # emulate one deferred-carry mont step shape: t += a*b + p*m
    L1 = 23
    B = 4 * 1024
    aa = jnp.asarray(rng.integers(-(1 << 13), 1 << 13, (L1, B), dtype=np.int32))
    bb = jnp.asarray(rng.integers(0, 1 << 12, (B,), dtype=np.int32))
    pp = jnp.asarray(rng.integers(0, 1 << 12, (L1, 1), dtype=np.int32))

    def mont22(aaa, bbb):
        t = jnp.zeros_like(aaa)
        for i in range(22):
            t = t + aaa * bbb[None]
            m = (t[0] * 25481) & 0xfff
            t = t + pp * m[None]
            c0 = t[0] >> 12
            t = jnp.concatenate([(t[1] + c0)[None], t[2:],
                                 jnp.zeros((1, B), jnp.int32)], axis=0)
        return t
    tm = bench("mont-like 22 steps (23,4096) i32", jax.jit(mont22), (aa, bb))
    print(f"  -> per mont_mul element: {tm/B*1e9:.1f} ns; "
          f"implied 2^16 smvp compute {tm/B*65536*20*12*1e3:.0f} ms")

    # f32 variant with 8-bit limbs (33 limbs plausible) at same batch
    L2 = 34
    af2 = jnp.asarray(rng.integers(0, 256, (L2, B)).astype(np.float32))
    bf2 = jnp.asarray(rng.integers(0, 256, (B,)).astype(np.float32))
    pf2 = jnp.asarray(rng.integers(0, 256, (L2, 1)).astype(np.float32))

    def mont_f32(aaa, bbb):
        t = jnp.zeros_like(aaa)
        for i in range(33):
            t = t + aaa * bbb[None]
            t0m = t[0] - jnp.floor(t[0] * (1 / 256)) * 256
            m = t0m * 167.0
            m = m - jnp.floor(m * (1 / 256)) * 256
            t = t + pf2 * m[None]
            c0 = jnp.floor(t[0] * (1 / 256))
            t = jnp.concatenate([(t[1] + c0)[None], t[2:],
                                 jnp.zeros((1, B), jnp.float32)], axis=0)
        return t
    tf = bench("mont-like 33 steps (34,4096) f32", jax.jit(mont_f32),
               (af2, bf2))
    print(f"  -> per mont_mul element: {tf/B*1e9:.1f} ns; "
          f"implied 2^16 smvp compute {tf/B*65536*20*12*1e3:.0f} ms")


if __name__ == "__main__":
    main()
