#!/usr/bin/env python
"""Probe 15: the sorted-stream row gather (fusion.34, 558 ms @2^20 r5).

The 2^20 device timeline shows ONE fusion — the (n, 2L) int16 row gather
with the transpose fused in (column-major output layout) — eating 67% of
program time at ~2.5 GB/s effective. Variants measured here:

  a) take16_T   : s16 (n, 44) rows, fused .T (the shipped form)
  b) take16_row : s16 rows, row-major output (transpose separate)
  c) take32_T   : rows packed s32 (n, 22) — half the element count
  d) take32_row : packed, row-major
  e) take32_2d  : packed + separate XLA transpose to (22, n)
"""

import json
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


def drain(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[-1:]))
    return out


def timeit(fn, args, runs=3):
    drain(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        drain(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def main():
    n = int(os.environ.get("PROBE_N", 1 << 20))
    L2 = 44
    rng = np.random.default_rng(0)
    rows16 = jnp.asarray(rng.integers(0, 1 << 12, (n, L2), dtype=np.int16))
    rows32 = jnp.asarray(np.ascontiguousarray(
        np.asarray(rows16)).view(np.int32))          # (n, 22)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    cases = {
        "take16_T": jax.jit(lambda r, p: jnp.take(r, p, axis=0).T
                            .reshape(L2, 8, n // 8)),
        "take16_row": jax.jit(lambda r, p: jnp.take(r, p, axis=0)),
        "take32_T": jax.jit(lambda r, p: jnp.take(r, p, axis=0).T
                            .reshape(L2 // 2, 8, n // 8)),
        "take32_row": jax.jit(lambda r, p: jnp.take(r, p, axis=0)),
        "take32_2d": jax.jit(
            lambda r, p: jnp.take(r, p, axis=0).T.copy()),
    }
    for name, fn in cases.items():
        r = rows32 if "32" in name else rows16
        ms = timeit(fn, (r, perm))
        print(json.dumps({"probe": name, "n": n, "ms": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
