#!/usr/bin/env python
"""Probe 17: what sets the ~26 ns/row gather floor (r5).

probe15 modeled the sorted-stream row gather as ~26 ns/row setup +
~0.3 ns/element. This probe asks whether the per-row term is dtype- or
alignment-sensitive: complex64 rows (8 B elements -> 11 per point),
rows padded to 32 int32 (128 B aligned), and a 128-lane row (512 B,
full tile) — if 512 B rows also cost ~26 ns, the gather engine is
issue-bound and row width is free; if they cost 4x, it is bytes-bound
and narrower rows are the only lever.
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
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    base = rng.integers(0, 1 << 12, (n, 32), dtype=np.int32)
    tables = {
        "i32x22": jnp.asarray(base[:, :22]),
        # complex64 removed: gather/readback UNIMPLEMENTED on this backend
        "i32x32pad": jnp.asarray(base),
        "i32x128pad": jnp.asarray(
            np.tile(base, (1, 4))),
    }
    for name, tab in tables.items():
        fn = jax.jit(lambda t, p: jnp.take(t, p, axis=0))
        ms = timeit(fn, (tab, perm))
        print(json.dumps({"probe": f"take_{name}", "n": n,
                          "ms": round(ms, 2),
                          "ns_per_row": round(ms * 1e6 / n, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
