#!/usr/bin/env python
"""Full-strength verification run (VERDICT r3 missing-#4 + weak-#6).

Every committed large-n benchmark uses 64 tiled base points and
top-bit-masked scalars (utils/preprocess.py — verifiable in O(k) oracle
work). This script closes the two residual gaps in one run:

  * n fully DISTINCT points: the arithmetic progression P_i = A + i*D
    (A, D random points). Distinctness: i != j with P_i == +-P_j would
    give (i -+ j) * D = -A -+ A, impossible for random A, D except with
    probability ~n/r. The closed form
        sum_i k_i * P_i = (sum k_i) * A + (sum i*k_i) * D
    keeps the oracle check O(1) scalar-muls at any n.
  * FULL-RANGE scalars: uniform over [0, r), top bits live (the bench
    generator masks the top bit; reference full-range analogue:
    preprocess.rs:166-191 samples ScalarField::rand).

Cross-checks, all required to agree bit-exactly:
  1. the device pipeline (production config for n),
  2. the closed-form python oracle,
  3. the native C++ Pippenger (native/cpumsm.cpp) on the same vectors
     (skippable with VERIFY_SKIP_NATIVE=1; ~minutes single-core at 2^20).

Appends a record to benches/verify_full.jsonl.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tpu_msm.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

OUT = os.path.join(ROOT, "benches", "verify_full.jsonl")


def batch_to_affine(curve, jacs):
    """Batch-normalize jacobian points: ONE field inversion total
    (Montgomery's trick), ~3 extra mults per point."""
    p = curve.p
    zs = [z for (_, _, z) in jacs]
    pref = [1] * (len(zs) + 1)
    for i, z in enumerate(zs):
        pref[i + 1] = pref[i] * z % p
    inv_all = pow(pref[-1], -1, p)
    out = [None] * len(jacs)
    for i in range(len(jacs) - 1, -1, -1):
        x, y, z = jacs[i]
        zinv = pref[i] * inv_all % p
        inv_all = inv_all * zs[i] % p
        zi2 = zinv * zinv % p
        out[i] = (x * zi2 % p, y * zi2 * zinv % p)
    return out


def gen_distinct_points(curve, n, seed):
    from tpu_msm.reference import curve as ref
    import random
    rng = random.Random(seed)
    g = (curve.gen_x, curve.gen_y, 1)
    A = ref.scalar_mul(curve, g, rng.randrange(1, curve.scalar_modulus))
    D = ref.scalar_mul(curve, g, rng.randrange(1, curve.scalar_modulus))
    d_aff = ref.to_affine(curve, D)
    acc = A
    jacs = [A]
    for _ in range(n - 1):
        acc = ref.madd(curve, acc, d_aff)
        jacs.append(acc)
    pts = batch_to_affine(curve, jacs)
    return pts, ref.to_affine(curve, A), d_aff


def gen_full_range_scalars(curve, n, seed):
    rng = np.random.default_rng(seed)
    nh = curve.scalar_limbs_u32 * 2
    hw = rng.integers(0, 1 << 16, size=(nh, n), dtype=np.uint32)
    # reduce mod r on host so the device sees canonical scalars with
    # live top bits (uniform enough: 2^(16*nh) >> r)
    from tpu_msm.utils.preprocess import halfwords_to_ints
    ints = [s % curve.scalar_modulus for s in halfwords_to_ints(hw)]
    from tpu_msm.utils.limbs_conversion import scalars_to_planar
    return scalars_to_planar(ints, curve), ints


def main():
    n = int(os.environ.get("VERIFY_N", 1 << 20))
    seed = int(os.environ.get("VERIFY_SEED", 424242))
    from tpu_msm.config import default_config
    from tpu_msm.constants import CURVES
    from tpu_msm.cuzk.pipeline import get_pipeline
    from tpu_msm.reference import curve as ref
    from tpu_msm.utils.limbs_conversion import points_to_planar

    curve = CURVES[os.environ.get("BENCH_CURVE", "bn254_s12")]
    rec = {"n": n, "seed": seed, "curve": curve.name,
           "distinct_points": True, "full_range_scalars": True}

    t0 = time.time()
    pts, a_aff, d_aff = gen_distinct_points(curve, n, seed)
    print(f"[verify] {n} distinct points in {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    hw, ints = gen_full_range_scalars(curve, n, seed + 1)
    print(f"[verify] full-range scalars in {time.time()-t0:.1f}s",
          file=sys.stderr)

    # closed-form oracle expectation
    r = curve.scalar_modulus
    ksum = sum(ints) % r
    iksum = sum(i * k for i, k in enumerate(ints)) % r
    want = ref.add(curve,
                   ref.scalar_mul(curve, (a_aff[0], a_aff[1], 1), ksum),
                   ref.scalar_mul(curve, (d_aff[0], d_aff[1], 1), iksum))

    # device pipeline
    t0 = time.time()
    cfg = default_config(n, curve)
    pipe = get_pipeline(cfg)
    xs, ys = points_to_planar(pts, curve)
    npad = pipe.padded_size(n)
    if npad != n:
        xs = np.pad(xs, ((0, 0), (0, npad - n)))
        ys = np.pad(ys, ((0, 0), (0, npad - n)))
        hw = np.pad(hw, ((0, 0), (0, npad - n)))
    hw_dev = np.concatenate([hw, np.zeros((2, npad), np.uint32)], axis=0)
    print(f"[verify] packing in {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    windows = pipe.window_sums(xs.astype(np.int32), ys.astype(np.int32),
                               hw_dev)
    acc = ref.INF
    for gw in reversed(windows):
        for _ in range(cfg.window_size):
            acc = ref.dbl(curve, acc)
        acc = ref.add(curve, acc, gw)
    rec["device_s"] = round(time.time() - t0, 1)
    rec["device_vs_oracle"] = bool(ref.jac_eq(curve, acc, want))
    print(f"[verify] device vs closed-form oracle: "
          f"{'EXACT' if rec['device_vs_oracle'] else 'MISMATCH'}",
          file=sys.stderr)

    if os.environ.get("VERIFY_SKIP_NATIVE", "0") != "1":
        from tpu_msm.host.cpu_msm import cpu_msm
        t0 = time.time()
        got_native = cpu_msm(pts, ints)      # jacobian (x, y, z) ints
        rec["native_s"] = round(time.time() - t0, 1)
        rec["native_vs_oracle"] = bool(ref.jac_eq(curve, got_native, want))
        print(f"[verify] native C++ vs oracle: "
              f"{'EXACT' if rec['native_vs_oracle'] else 'MISMATCH'} "
              f"({rec['native_s']}s)", file=sys.stderr)

    ok = rec["device_vs_oracle"] and rec.get("native_vs_oracle", True)
    rec["ok"] = ok
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
