#!/usr/bin/env python
"""Probe 16: multi-payload sort as a gather replacement (r5).

The sorted-stream row gather costs ~35 ns/row (per-row latency bound,
fusion.34 = 558 ms @2^20 — probe15). A k-payload lax.sort moves the
payload DATA through the sort network in streaming passes instead; if
its cost grows slowly enough with payload count, sorting the packed
coordinate words alongside the keys beats sort+take.

Measures lax.sort((keys, p_1..p_k)) at k = 1, 2, 6, 11, 22 payloads of
int32, batch (4, n) to mirror the pipeline's per-window batching.
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
    W = int(os.environ.get("PROBE_W", 4))
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 17, (W, n), dtype=np.int32))
    for k in (11, 22):
        pays = tuple(
            jnp.asarray(rng.integers(0, 1 << 30, (W, n), dtype=np.int32))
            for _ in range(k))

        def fn(keys, *pays):
            return jax.lax.sort((keys,) + pays, dimension=-1, num_keys=1,
                                is_stable=False)
        ms = timeit(jax.jit(fn), (keys,) + pays)
        print(json.dumps({"probe": f"sort_{k}pay", "W": W, "n": n,
                          "ms": round(ms, 2),
                          "per_window_ms": round(ms / W, 2)}), flush=True)


if __name__ == "__main__":
    main()
