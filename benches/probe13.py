#!/usr/bin/env python
"""Probe 13: identify the ~25 ms fixed per-call cost probe12 exposed.

probe12 found: gathers / searchsorted / double-sort / fill each measure
~24-25 ms standalone, padd/psub/elementwise ~0.03 ms, and a program
containing ALL the slow pieces costs ~28 ms — i.e. a shared ~25 ms
constant, not per-op work. Hypotheses:
  (H1) per-call dispatch overhead that only certain programs pay
       (host round-trip, layout conversion, donation behavior);
  (H2) genuinely slow device ops whose costs coincide;
  (H3) LICM hoisted the probe12 scan body (same operands every
       iteration), making the in-scan number meaningless.

Experiments:
  * trace: capture a jax.profiler trace around 10 calls of gather_rows66
    and of padd; report the trace-event device time per call (H1 vs H2);
  * scan over DIFFERENT operands per iteration (kills LICM), per-iter
    cost for gather / searchsorted / fill / double-sort;
  * big-input identity control: does a 69 MB input alone trigger it?
"""

import functools
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

I32 = jnp.int32


def timeit(fn, args, runs=10):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts), out


def emit(name, ms, note=""):
    print(f"[p13] {name:30s} {ms:9.3f} ms  {note}", file=sys.stderr)
    print(json.dumps({"probe": name, "ms": round(ms, 3), "note": note}),
          flush=True)


def main():
    from tpu_msm.constants import BN254_S12
    from tpu_msm.cuzk import kernels

    curve = BN254_S12
    L = curve.num_limbs
    n = 1 << 16
    Wg, B = 4, 4096
    N = Wg * n
    G = 5
    rng = np.random.default_rng(7)

    def rand_pts(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 12, size=(3, L) + shape, dtype=np.int64)
            .astype(np.int32))

    tflat = rand_pts((N,))
    idxs = jnp.asarray(rng.integers(0, N, size=(G, Wg, B + 1),
                                    dtype=np.int64).astype(np.int32))

    def g_rows66(tflat, idx):
        pm = tflat.reshape(3 * L, N).T
        rows = jnp.take(pm, idx.reshape(-1), axis=0)
        return rows.T.reshape((3, L) + idx.shape)

    # --- big-input controls ---
    ms, _ = timeit(jax.jit(lambda t: t[:, :, :128] + 1), (tflat,))
    emit("ctl_bigin_slice", ms, "69MB input, tiny slice out")
    ms, _ = timeit(jax.jit(lambda t: t + 1), (tflat,))
    emit("ctl_bigin_elementwise", ms, "69MB input, 69MB out")

    # --- gather with small vs big table ---
    small = rand_pts((8192,))
    idx_small = jnp.asarray(rng.integers(0, 8192, size=(Wg, B + 1),
                                         dtype=np.int64).astype(np.int32))

    def g_small(t, idx):
        pm = t.reshape(3 * L, 8192).T
        return jnp.take(pm, idx.reshape(-1), axis=0)
    ms, _ = timeit(jax.jit(g_small), (small, idx_small))
    emit("gather_small_table", ms, "8192-row table")

    ms, _ = timeit(jax.jit(g_rows66), (tflat, idxs[0]))
    emit("gather_rows66", ms, "262144-row table (probe12 repro)")

    # --- LICM-proof scans: different idx per iteration ---
    def scan_gather(tflat, idxs):
        def body(c, idx):
            return c, g_rows66(tflat, idx)
        _, out = jax.lax.scan(body, None, idxs)
        return out
    ms, _ = timeit(jax.jit(scan_gather), (tflat, idxs))
    emit("gather_scanG_fresh", ms / G, f"per-iter, {G} distinct idx")

    sks = jnp.sort(jnp.asarray(
        rng.integers(0, 2 * B, size=(G, Wg, n), dtype=np.int64)
        .astype(np.int32)), axis=-1)
    qs = jnp.arange(1, B + 2, dtype=I32) << 1

    def scan_ss(sks):
        def body(c, sk):
            return c, jax.vmap(
                lambda s: jnp.searchsorted(s, qs, side="left"))(sk)
        _, out = jax.lax.scan(body, None, sks)
        return out
    ms, _ = timeit(jax.jit(scan_ss), (sks,))
    emit("searchsorted_scanG_fresh", ms / G, "per-iter, distinct keys")

    def cnt_double_sort(sk):
        keyq = jnp.broadcast_to(qs * 2, (Wg, B + 1))
        keys_aug = jnp.concatenate([sk * 2 + 1, keyq], axis=-1)
        bigpay = jnp.full((Wg, n), n + B + 1, I32)
        qpay = jnp.broadcast_to(jnp.arange(B + 1, dtype=I32), (Wg, B + 1))
        pay = jnp.concatenate([bigpay, qpay], axis=-1)
        _, pay_sorted = jax.lax.sort((keys_aug, pay), num_keys=1,
                                     is_stable=False)
        pos = jnp.broadcast_to(jnp.arange(n + B + 1, dtype=I32),
                               (Wg, n + B + 1))
        _, pos2 = jax.lax.sort((pay_sorted, pos), num_keys=1,
                               is_stable=False)
        return pos2[:, :B + 1] - jnp.arange(B + 1, dtype=I32)

    def scan_ds(sks):
        def body(c, sk):
            return c, cnt_double_sort(sk)
        _, out = jax.lax.scan(body, None, sks)
        return out
    ms, _ = timeit(jax.jit(scan_ds), (sks,))
    emit("double_sort_scanG_fresh", ms / G, "per-iter, distinct keys")

    # one plain sort per iter, for scale
    def scan_sort(sks):
        def body(c, sk):
            return c, jax.lax.sort((sk, sk), num_keys=1, is_stable=False)[1]
        _, out = jax.lax.scan(body, None, sks)
        return out
    ms, _ = timeit(jax.jit(scan_sort), (sks,))
    emit("plain_sort_scanG_fresh", ms / G, "per-iter 2-operand sort")

    # --- profiler trace: device time vs wall for gather + padd ---
    logdir = "/tmp/p13_trace"
    f_gather = jax.jit(g_rows66)
    jax.block_until_ready(f_gather(tflat, idxs[0]))
    a = rand_pts((Wg, B))
    b = rand_pts((Wg, B))
    f_padd = jax.jit(functools.partial(kernels.padd_batch, curve=curve))
    jax.block_until_ready(f_padd(a, b))
    jax.profiler.start_trace(logdir)
    for _ in range(10):
        jax.block_until_ready(f_gather(tflat, idxs[0]))
    for _ in range(10):
        jax.block_until_ready(f_padd(a, b))
    jax.profiler.stop_trace()
    print(f"[p13] trace written to {logdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
