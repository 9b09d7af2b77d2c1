#!/usr/bin/env python
"""Probe 8: grid-blocked Pallas mont kernels — interleaved (CIOS-like) vs
column-scanning (Comba) product+REDC — at production batch sizes."""

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
P = CURVE.p_wide_limbs()


def mont_rows(a_rows, b_rows):
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


def mont_comba(a_rows, b_rows):
    """Column-scanning: full product columns, then sequential REDC with
    minimal live state (reads product columns from the list on demand)."""
    z = jnp.zeros_like(a_rows[0])
    # phase A: product columns (2L of them), each ~min(k+1, L) MACs
    prod = []
    for k in range(2 * L - 1):
        acc = z
        for i in range(max(0, k - L + 1), min(k, L - 1) + 1):
            acc = acc + a_rows[i] * b_rows[k - i]
        prod.append(acc)
    prod.append(z)
    # phase B: REDC — m_i recurrence over low limbs, banded p additions
    t = prod
    for i in range(L):
        m = (t[i] * N0) & MASK
        for j in range(L + 1):
            if P[j]:
                t[i + j] = t[i + j] + m * P[j]
        t[i + 1] = t[i + 1] + (t[i] >> W)  # spill carry upward
    out = []
    c = z
    for j in range(L, 2 * L + 1):
        s = t[j] + c
        out.append(s & MASK)
        c = s >> W
    return out[:L]


def make_kernel(mont_fn, nmuls):
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        for _ in range(nmuls):
            a = mont_fn(a, b)
        for i in range(L):
            o_ref[i] = a[i]
    return kernel


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
    print(f"{name:52s} {s*1e3:9.3f} ms (compile {c:.1f}s)", flush=True)
    return s, out


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    TOT = 32 * 1024  # total batch
    for (mont_fn, tag) in ((mont_rows, "cios"), (mont_comba, "comba")):
        for (S, Cn) in ((8, 256), (8, 1024)):
            blocks = TOT // (S * Cn)
            shape = (L, blocks * S, Cn)
            a = jnp.asarray(rng.integers(0, 1 << W, shape, dtype=np.int32))
            b = jnp.asarray(rng.integers(0, 1 << W, shape, dtype=np.int32))
            spec = pl.BlockSpec((L, S, Cn), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            f = jax.jit(pl.pallas_call(
                make_kernel(mont_fn, 12),
                grid=(blocks,),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
                in_specs=[spec, spec],
                out_specs=spec))
            s, out = bench(
                f"pallas {tag} x12 grid={blocks} blk {S}x{Cn}", f, (a, b))
            print(f"   -> {s/TOT/12*1e9:6.2f} ns/elem-mul; point-add-equiv "
                  f"{s/TOT*1e9:6.1f} ns -> 2^16x20w ~ "
                  f"{s/TOT*(1<<16)*20*1e3:5.0f} ms", flush=True)

        # correctness on in-range inputs (< p)
        S, Cn = 8, 256
        shape = (L, S, Cn)
        limbs_p = CURVE.p_limbs()
        aa = rng.integers(0, 1 << W, shape, dtype=np.int32)
        aa[-1] = rng.integers(0, limbs_p[-1], (S, Cn), dtype=np.int32)
        bb = rng.integers(0, 1 << W, shape, dtype=np.int32)
        bb[-1] = rng.integers(0, limbs_p[-1], (S, Cn), dtype=np.int32)
        f1 = jax.jit(pl.pallas_call(
            make_kernel(mont_fn, 1),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        out = np.asarray(f1(jnp.asarray(aa), jnp.asarray(bb)))
        ok = True
        for e in [(0, 0), (3, 77), (7, 255)]:
            ai = sum(int(aa[i][e]) << (W * i) for i in range(L))
            bi = sum(int(bb[i][e]) << (W * i) for i in range(L))
            want = (ai * bi * pow(1 << (W * L), -1, CURVE.p)) % CURVE.p
            got = sum(int(out[i][e]) << (W * i) for i in range(L))
            ok &= (got % CURVE.p == want) and got < 2 * CURVE.p
        print(f"   correctness ({tag}): {ok}", flush=True)


if __name__ == "__main__":
    main()
