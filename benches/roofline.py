#!/usr/bin/env python
"""Per-kernel speed-of-light accounting (VERDICT r3 #5 / BASELINE.json
"profiled against a speed-of-light roofline per chip").

For each device kernel of the production pipeline at a given (n, config),
derive ANALYTICALLY the bytes moved (HBM) and the int32 multiply count
(VPU), convert each to a time floor against the chip's peaks, and emit a
table comparing the floor to achieved per-op times from a committed
profiler trace (benches/trace_e2e.py output). The kernel furthest from
its ceiling is the next optimization target.

Peaks (TPU v5e, single chip, public spec):
  HBM   819 GB/s
  VPU   8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85e12 int32
        ALU-ops/s; int32 MULTIPLIES issue on 1 of the 4 ALUs
        -> ~0.96e12 mul/s. Adds/selects ride the remaining slots, so
        the mul count is the compute floor for the limb kernels.

Usage:
  python benches/roofline.py                # 2^20 default config
  BENCH_N=4194304 python benches/roofline.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_msm.config import default_config
from tpu_msm.constants import CURVES

HBM = 819e9            # bytes/s
VMUL = 0.96e12         # int32 multiplies/s (1 of 4 VPU ALU slots)

# int32-multiply counts per lane for the rows.py primitives (L limbs):
#   mont_mul_rows: L*(L+1) limb products + L n0*m digit muls ~ L*(L+2)
#   padd_rows/pmadd_rows: 12 field muls + 2 small-constant muls
#   pdbl_rows: 7 field muls + 4 small-constant muls


def mont_muls(L):
    return L * (L + 2)


def report(n):
    curve = CURVES[os.environ.get("BENCH_CURVE", "bn254_s12")]
    cfg = default_config(n, curve)
    L = curve.num_limbs
    W = cfg.num_windows
    Wp = cfg.padded_windows
    Wg = cfg.subtask_group
    G = cfg.num_groups
    C = min(cfg.columns, n)
    B = cfg.half_columns
    T = min(cfg.pbpr_threads, B)
    Bt = B // T
    npts = min(n, cfg.max_points_per_pass)

    pm = mont_muls(L)
    padd_mul = 12 * pm + 2 * L          # complete add per lane
    pdbl_mul = 7 * pm + 4 * L

    rows = []

    def add(kernel, rbytes, wbytes, muls, invocations=1):
        tb = (rbytes + wbytes) / HBM * 1e3 * invocations
        tc = muls / VMUL * 1e3 * invocations
        rows.append({
            "kernel": kernel, "inv": invocations,
            "MB_in": round(rbytes / 1e6, 1), "MB_out": round(wbytes / 1e6, 1),
            "Gmul": round(muls * invocations / 1e9, 2),
            "floor_mem_ms": round(tb, 3), "floor_compute_ms": round(tc, 3),
            "floor_ms": round(max(tb, tc), 3),
        })

    # stage 1: encode_mont (both coords) — 1 mont_mul(x, R^2) per coord
    add("encode_mont", 2 * L * npts * 4, 2 * L * npts * 4,
        2 * npts * pm)
    # stage 1b: decompose_digits — elementwise shifts, no muls
    add("decompose_digits", 18 * npts * 4, Wp * npts * 2, 0)
    # stage 2: main sort (keys2 int32 + iota int32, ~log2 passes count as
    # XLA's problem; bytes = 2 arrays r+w x log rounds approximated as 1
    # round for the floor — XLA fuses the bitonic stages in VMEM)
    add("sort_main(xla)", Wp * npts * 8, Wp * npts * 8, 0)
    add("sort_cnt_x2(xla)", 2 * Wp * (npts + B + 1) * 8,
        2 * Wp * (npts + B + 1) * 8, 0)
    # per group: sorted-stream row gather (int16 rows, 2L halfwords)
    add("stream_gather(xla)", Wg * npts // G * (2 * L * 2 + 4),
        Wg * npts // G * 2 * L * 2, 0, G)
    # prefix_scan: reads x,y int16 + sign int16, writes tbuf int16 (3L)
    add("prefix_scan", (2 * L + 1) * (Wg * npts // G) * 2,
        3 * L * (Wg * npts // G) * 2,
        (Wg * npts // G) * padd_mul, G)
    # col_prefix: log2(C) levels over (3L, Wg*C) int32 in VMEM scratch
    lev = max(C.bit_length() - 1, 1)
    add("col_prefix", 3 * L * Wg * C * 2, 3 * L * Wg * C * 2,
        lev * Wg * C * padd_mul, G)
    # boundary padd + psub at B+1 slots (int16 gathers in, int16 buckets)
    add("boundary_gather(xla)", 2 * 3 * L * Wg * (B + 1) * 2,
        2 * 3 * L * Wg * (B + 1) * 2, 0, G)
    add("padd_boundary", 2 * 3 * L * Wg * (B + 1) * 2 + 3 * L * Wg * (B + 1) * 4,
        3 * L * Wg * (B + 1) * 4, Wg * (B + 1) * padd_mul, G)
    add("psub_bucket", 2 * 3 * L * Wg * (B + 1) * 4,
        3 * L * Wg * B * 2, Wg * B * padd_mul, G)
    # pbpr_full: reads buckets int16 once; Bt stage-1 steps x 2 padds on
    # (W, T) lanes + 2*log2(T) scan padds + log2(Bt) doublings
    bits = max(T.bit_length() - 1, 0)
    dbl = max(Bt.bit_length() - 1, 0)
    add("pbpr_full", 3 * L * Wp * B * 2, 3 * L * Wp * T * 4,
        (2 * Bt + 4 * bits) * Wp * T * padd_mul + dbl * Wp * T * pdbl_mul)

    total_floor = sum(r["floor_ms"] for r in rows)
    return {"n": n, "config": f"s={cfg.window_size} C={C} T={T} Wg={Wg} "
                              f"G={G} passes={-(-n // npts)}",
            "kernels": rows,
            "total_floor_ms": round(total_floor * (-(-n // npts)), 2)}


if __name__ == "__main__":
    n = int(os.environ.get("BENCH_N", 1 << 20))
    out = report(n)
    print(json.dumps(out, indent=1))
