#!/usr/bin/env python
"""Probe 4: emulate the scatter-free SMVP scan — stacked-limb pmadd in a
fori_loop with dense row writes — to size the redesign before coding it."""

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
from tpu_msm.ops.complete import ProjPoint, pmadd, proj_infinity

CURVE = BN254_S12
L = CURVE.num_limbs


def bench(name, fn, args, runs=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    s = statistics.median(ts)
    print(f"{name:44s} {s*1e3:9.3f} ms (compile {compile_s:.1f}s)", flush=True)
    return s


def scan_no_scatter(R, Wg, C):
    """R-row scan: pmadd + select + dense row write of the carry."""
    def fn(sx, sy, brk):
        carry0 = proj_infinity(CURVE, (Wg, C))
        one_m = jnp.broadcast_to(lazy.mont_one(CURVE, 2), (L, Wg, C))
        outbuf = jnp.zeros((R, 3, L, Wg, C), jnp.int32)

        def body(r, st):
            carry, buf = st
            x = jax.lax.dynamic_index_in_dim(sx, r, 0, keepdims=False)
            y = jax.lax.dynamic_index_in_dim(sy, r, 0, keepdims=False)
            s = pmadd(carry, x, y, CURVE)
            b = jax.lax.dynamic_index_in_dim(brk, r, 0, keepdims=False)
            val = ProjPoint(jnp.where(b[None], x, s.x),
                            jnp.where(b[None], y, s.y),
                            jnp.where(b[None], one_m, s.z))
            row = jnp.stack([val.x, val.y, val.z])
            buf = jax.lax.dynamic_update_index_in_dim(buf, row, r, axis=0)
            return val, buf

        val, buf = jax.lax.fori_loop(0, R, body, (carry0, outbuf))
        return val.x, buf
    return fn


def main():
    print(f"device={jax.devices()[0].device_kind}  L={L}", flush=True)
    rng = np.random.default_rng(0)
    n_ref, W_ref = 1 << 16, 20

    for (Wg, C) in ((4, 1024), (4, 2048), (2, 4096), (8, 1024)):
        R = 32
        sx = jnp.asarray(rng.integers(0, 1 << 12, (R, L, Wg, C), dtype=np.int32))
        sy = jnp.asarray(rng.integers(0, 1 << 12, (R, L, Wg, C), dtype=np.int32))
        brk = jnp.asarray(rng.integers(0, 2, (R, Wg, C)).astype(bool))
        s = bench(f"scan R={R} Wg={Wg} C={C} (batch {Wg*C})",
                  jax.jit(scan_no_scatter(R, Wg, C)), (sx, sy, brk))
        per_add = s / (R * Wg * C)
        full = per_add * n_ref * W_ref
        print(f"   -> {per_add*1e9:7.1f} ns/point-add; "
              f"2^16 x {W_ref} windows SMVP ~ {full*1e3:6.0f} ms", flush=True)


if __name__ == "__main__":
    main()
