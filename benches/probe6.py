#!/usr/bin/env python
"""Probe 6: bisect the fori_loop mont-chain cost (probe5's flat 31 ms) and
checksum-verify probe4's suspiciously fast scan."""

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
W = CURVE.log_limb_size
MASK = (1 << W) - 1
N0 = CURVE.n0


def bench(name, fn, args, runs=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {statistics.median(ts)*1e3:9.3f} ms (c {c:.0f}s)",
          flush=True)
    return out


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(1)
    Wg, C, R = 4, 1024, 64
    carry = jnp.asarray(rng.integers(0, 1 << W, (L, Wg, C), dtype=np.int32))
    xs = jnp.asarray(rng.integers(0, 1 << W, (R, L, Wg, C), dtype=np.int32))
    zero_row = jnp.zeros((1, Wg, C), jnp.int32)
    p_pad = lazy.const_limbs(CURVE.p, CURVE, 2, num_limbs=L + 1)

    def loop(body):
        def fn(t0, xx):
            def b(r, t):
                x = jax.lax.dynamic_index_in_dim(xx, r, 0, keepdims=False)
                return body(t, x)
            return jax.lax.fori_loop(0, R, b, t0)
        return jax.jit(fn)

    # (a) add only
    bench("body: t+x", loop(lambda t, x: (t + x) & MASK), (carry, xs))

    # (b) L muls, no shift/concat
    def body_muls(t, x):
        for i in range(L):
            t = (t + x * x[i][None]) & 0x3fffffff
        return t
    bench("body: 22 bcast MACs, no concat", loop(body_muls), (carry, xs))

    # (c) full mont step WITH concat shift, 22 iters
    def body_mont_concat(t, x):
        tp = jnp.concatenate([t, zero_row], axis=0)
        for i in range(L):
            tp = tp + jnp.concatenate([x, zero_row], 0) * x[i][None]
            m = (tp[0] * N0) & MASK
            tp = tp + p_pad * m[None]
            c0 = tp[0] >> W
            tp = jnp.concatenate([(tp[1] + c0)[None], tp[2:], zero_row], 0)
        return tp[:L] & MASK
    bench("body: mont w/ concat shifts", loop(body_mont_concat), (carry, xs))

    # (d) mont with ROLL shift instead of concat
    def body_mont_roll(t, x):
        tp = jnp.concatenate([t, zero_row], axis=0)
        xp = jnp.concatenate([x, zero_row], axis=0)
        for i in range(L):
            tp = tp + xp * x[i][None]
            m = (tp[0] * N0) & MASK
            tp = tp + p_pad * m[None]
            c0 = tp[0] >> W
            tp = jnp.roll(tp, -1, axis=0)
            tp = tp.at[0].add(c0)  # c0 lands on old t[1]
            tp = tp.at[L].set(0.0 * 0 + 0)  # clear wrapped limb
        return tp[:L] & MASK
    bench("body: mont w/ roll shifts", loop(body_mont_roll), (carry, xs))

    # (e) the actual production mont_mul
    bench("body: lazy.mont_mul",
          loop(lambda t, x: lazy.mont_mul(lazy.fold(t, CURVE), x, CURVE)),
          (carry, xs))

    # ---- probe4 scan elision check ----
    def scan_fn(sx, sy, brk):
        carry0 = proj_infinity(CURVE, (Wg, C))
        one_m = jnp.broadcast_to(lazy.mont_one(CURVE, 2), (L, Wg, C))
        outbuf = jnp.zeros((R, 3, L, Wg, C), jnp.int32)

        def body(r, st):
            cr, buf = st
            x = jax.lax.dynamic_index_in_dim(sx, r, 0, keepdims=False)
            y = jax.lax.dynamic_index_in_dim(sy, r, 0, keepdims=False)
            s = pmadd(cr, x, y, CURVE)
            b = jax.lax.dynamic_index_in_dim(brk, r, 0, keepdims=False)
            val = ProjPoint(jnp.where(b[None], x, s.x),
                            jnp.where(b[None], y, s.y),
                            jnp.where(b[None], one_m, s.z))
            row = jnp.stack([val.x, val.y, val.z])
            buf = jax.lax.dynamic_update_index_in_dim(buf, row, r, axis=0)
            return val, buf

        val, buf = jax.lax.fori_loop(0, R, body, (carry0, outbuf))
        return val.x, buf

    sx = jnp.asarray(rng.integers(0, 1 << W, (R, L, Wg, C), dtype=np.int32))
    sy = jnp.asarray(rng.integers(0, 1 << W, (R, L, Wg, C), dtype=np.int32))
    brk = jnp.asarray(rng.integers(0, 2, (R, Wg, C)).astype(bool))
    f = jax.jit(scan_fn)
    out = bench(f"probe4 scan R={R} (recheck)", f, (sx, sy, brk))
    cs1 = int(jnp.sum(out[1] & 0xffff) % 1000003)
    out2 = f(sx + 1, sy, brk)
    cs2 = int(jnp.sum(out2[1] & 0xffff) % 1000003)
    print(f"buf checksum {cs1} vs perturbed {cs2} (must differ)", flush=True)

    # unrolled python-loop scan over 8 rows vs fori: equality check
    def scan_unrolled(sx, sy, brk):
        cr = proj_infinity(CURVE, (Wg, C))
        one_m = jnp.broadcast_to(lazy.mont_one(CURVE, 2), (L, Wg, C))
        rows = []
        for r in range(8):
            s = pmadd(cr, sx[r], sy[r], CURVE)
            val = ProjPoint(jnp.where(brk[r][None], sx[r], s.x),
                            jnp.where(brk[r][None], sy[r], s.y),
                            jnp.where(brk[r][None], one_m, s.z))
            rows.append(jnp.stack([val.x, val.y, val.z]))
            cr = val
        return jnp.stack(rows)

    def scan_fori8(sx, sy, brk):
        _, buf = jax.jit(scan_fn, static_argnums=())(sx[:8], sy[:8], brk[:8])
        return buf
    b1 = jax.jit(scan_unrolled)(sx[:8], sy[:8], brk[:8])
    # rebuild fori version for R=8
    def scan_fn8(sx, sy, brk):
        carry0 = proj_infinity(CURVE, (Wg, C))
        one_m = jnp.broadcast_to(lazy.mont_one(CURVE, 2), (L, Wg, C))
        outbuf = jnp.zeros((8, 3, L, Wg, C), jnp.int32)

        def body(r, st):
            cr, buf = st
            x = jax.lax.dynamic_index_in_dim(sx, r, 0, keepdims=False)
            y = jax.lax.dynamic_index_in_dim(sy, r, 0, keepdims=False)
            s = pmadd(cr, x, y, CURVE)
            b = jax.lax.dynamic_index_in_dim(brk, r, 0, keepdims=False)
            val = ProjPoint(jnp.where(b[None], x, s.x),
                            jnp.where(b[None], y, s.y),
                            jnp.where(b[None], one_m, s.z))
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.stack([val.x, val.y, val.z]), r, axis=0)
            return val, buf
        return jax.lax.fori_loop(0, 8, body, (carry0, outbuf))[1]
    b2 = jax.jit(scan_fn8)(sx[:8], sy[:8], brk[:8])
    print("scan fori == unrolled:", bool(jnp.array_equal(b1, b2)), flush=True)


if __name__ == "__main__":
    main()
