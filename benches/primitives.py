#!/usr/bin/env python
"""Raw-primitive roofline probes for the current device: int32 vs float32
multiply/add throughput, argsort, scatter, and gather costs — the numbers
that pick the limb representation and pipeline shape (SURVEY.md §5
'Tracing/profiling': per-kernel roofline harness).

Usage: python benches/primitives.py [--m 1048576] [--runs 5]
"""

import argparse
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


def bench(name, fn, args, work, unit, runs):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    s = statistics.median(times)
    print(f"{name:32s} {s*1e3:9.3f} ms   {work/s/1e9:10.2f} G{unit}/s")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1 << 20)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    M = args.m
    R = 64  # fused op-chain length to dominate memory traffic

    print(f"device={jax.devices()[0].device_kind}  M={M}  chain={R}")
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(1, 1 << 12, (M,), dtype=np.int32))
    xf = xi.astype(jnp.float32)
    xb = xi.astype(jnp.bfloat16)

    def chain_mul_i32(x):
        acc = x
        for _ in range(R):
            acc = acc * x + x
        return acc

    def chain_mul_f32(x):
        acc = x
        for _ in range(R):
            acc = acc * x + x
        return acc

    def chain_mulonly_i32(x):
        acc = x
        for _ in range(R):
            acc = (acc * x) & 0x7fffffff
        return acc

    def chain_add_i32(x):
        acc = x
        for _ in range(R):
            acc = acc + x
        return acc

    def chain_shift_i32(x):
        acc = x
        for _ in range(R):
            acc = (acc >> 2) + x
        return acc

    bench("i32 mul+add chain", jax.jit(chain_mul_i32), (xi,), R * M * 2, "op", args.runs)
    bench("f32 mul+add chain", jax.jit(chain_mul_f32), (xf,), R * M * 2, "op", args.runs)
    bench("bf16 mul+add chain", jax.jit(chain_mul_f32), (xb,), R * M * 2, "op", args.runs)
    bench("i32 mul&mask chain", jax.jit(chain_mulonly_i32), (xi,), R * M * 2, "op", args.runs)
    bench("i32 add chain", jax.jit(chain_add_i32), (xi,), R * M, "op", args.runs)
    bench("i32 shift+add chain", jax.jit(chain_shift_i32), (xi,), R * M * 2, "op", args.runs)

    # 16-bit-input widening mul (does XLA use a cheaper path for i16*i16?)
    xi16 = xi.astype(jnp.int16)

    def chain_widen(x16):
        acc = x16.astype(jnp.int32)
        for _ in range(R):
            acc = (acc & 0xffff) * (acc >> 16 | 1)
        return acc
    bench("i32 16x16 mul chain", jax.jit(chain_widen), (xi16,), R * M, "mul", args.runs)

    # sort / gather / scatter costs at MSM-relevant shapes
    keys = jnp.asarray(rng.integers(0, 4096, (4, M), dtype=np.int32))
    bench("argsort (4,M) i32", jax.jit(lambda k: jnp.argsort(k, axis=-1)),
          (keys,), 4 * M, "key", args.runs)
    vals = jnp.asarray(rng.integers(0, 1 << 12, (22, 4, M), dtype=np.int32))
    perm = jnp.argsort(keys, axis=-1)
    bench("gather (22,4,M) by perm",
          jax.jit(lambda v, p: jnp.take_along_axis(
              v, jnp.broadcast_to(p[None], v.shape), axis=-1)),
          (vals, perm), 22 * 4 * M * 4, "B", args.runs)

    # scatter like the SMVP bucket write: (L, Wg, C) values into (L, Wg, B)
    L, Wg, C, B = 22, 4, 256, 4097
    tgt = jnp.zeros((L, Wg, B), jnp.int32)
    idx = jnp.asarray(rng.integers(0, B, (Wg, C), dtype=np.int32))
    val = jnp.asarray(rng.integers(0, 99, (L, Wg, C), dtype=np.int32))
    w_idx = jnp.arange(Wg)[:, None]

    def scat(t, i, v):
        return t.at[:, w_idx, i].set(v, mode="drop")
    bench("scatter (22,4,256)->B once", jax.jit(scat), (tgt, idx, val),
          L * Wg * C * 4, "B", args.runs)

    def scat_loop(t, i, v):
        def body(r, tt):
            return tt.at[:, w_idx, (i + r) % B].set(v + r, mode="drop")
        return jax.lax.fori_loop(0, 256, body, t)
    bench("scatter x256 in fori_loop", jax.jit(scat_loop), (tgt, idx, val),
          256 * L * Wg * C * 4, "B", args.runs)

    # dense row write alternative
    buf = jnp.zeros((256, L, Wg, C), jnp.int32)

    def dense_loop(bf, v):
        def body(r, tt):
            return jax.lax.dynamic_update_index_in_dim(tt, v + r, r, axis=0)
        return jax.lax.fori_loop(0, 256, body, bf)
    bench("dense row write x256 loop", jax.jit(dense_loop), (buf, val),
          256 * L * Wg * C * 4, "B", args.runs)


if __name__ == "__main__":
    main()
