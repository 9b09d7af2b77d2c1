"""Python client for the MSM offload service + the benchmark entry point.

`msm_benchmark(input_size)` mirrors the reference's FFI-exported
`metal_msm_benchmark(input_size: u32)` (example-app/src/lib.rs:17-26):
generate `input_size` random (base, scalar) pairs, run the MSM through
the service, and report a `BenchmarkResult` (the benchmark.rs:1-6
struct). Results are verified against the pure-python oracle via the
O(k_base) linearity identity (utils/preprocess.py).

    python -m example_app.client --port 9099 --size 4096
    python -m example_app.client --write-vectors 4096 /tmp/msm_vec.bin
"""

from __future__ import annotations

import argparse
import dataclasses
import socket
import struct
import time
from typing import Optional

import numpy as np

from tpu_msm.reference import curve as ref
from tpu_msm.utils import preprocess
from tpu_msm.utils.limbs_conversion import planar_to_ints

from . import protocol


@dataclasses.dataclass
class BenchmarkResult:
    """msm/utils/benchmark.rs:1-6."""
    instance_size: int
    num_instance: int
    avg_processing_time: float      # ms, service compute time


def _gen_words(curve, n: int, seed: int = 0):
    """Random benchmark vectors in wire format + oracle expectation."""
    xs, ys, hw, base = preprocess.gen_planar_inputs(curve, n, seed=seed)
    nw, sw = protocol.curve_words(curve)
    xs_w = protocol.ints_to_words(planar_to_ints(xs, curve.log_limb_size), nw)
    ys_w = protocol.ints_to_words(planar_to_ints(ys, curve.log_limb_size), nw)
    sc_w = protocol.ints_to_words(preprocess.halfwords_to_ints(hw), sw)
    expected = preprocess.expected_msm(base, hw, curve)
    return xs_w, ys_w, sc_w, expected


def run_msm(host: str, port: int, curve_id: int, xs_w, ys_w, sc_w,
            sock: Optional[socket.socket] = None) -> protocol.MSMResult:
    own = sock is None
    if own:
        sock = socket.create_connection((host, port))
    try:
        protocol.send_request(sock, curve_id, xs_w, ys_w, sc_w)
        return protocol.recv_result(sock, protocol.CURVE_IDS[curve_id])
    finally:
        if own:
            sock.close()


def msm_benchmark(input_size: int, host: str = "127.0.0.1",
                  port: int = 9099, curve_id: int = 0,
                  num_instance: int = 1, verify: bool = True
                  ) -> BenchmarkResult:
    curve = protocol.CURVE_IDS[curve_id]
    times = []
    with socket.create_connection((host, port)) as sock:
        for i in range(num_instance):
            xs_w, ys_w, sc_w, expected = _gen_words(curve, input_size,
                                                    seed=i)
            res = run_msm(host, port, curve_id, xs_w, ys_w, sc_w, sock=sock)
            if verify:
                got = (res.x, res.y, res.z)
                if not ref.jac_eq(curve, got, expected):
                    raise AssertionError(
                        f"MSM result mismatch at size {input_size}")
            times.append(res.compute_ms)
    return BenchmarkResult(input_size, num_instance,
                           sum(times) / len(times))


def write_vectors(path: str, n: int, curve_id: int = 0, seed: int = 0):
    """Vector file for the native client: request bytes, verbatim."""
    curve = protocol.CURVE_IDS[curve_id]
    xs_w, ys_w, sc_w, expected = _gen_words(curve, n, seed=seed)
    with open(path, "wb") as f:
        f.write(protocol.MAGIC + struct.pack("<IQ", curve_id, n))
        f.write(xs_w.tobytes())
        f.write(ys_w.tobytes())
        f.write(sc_w.tobytes())
    ex, ey, ez = expected
    print(f"wrote {path}: n={n} curve={protocol.CURVE_NAMES[curve_id]}")
    print(f"expected (jacobian): x={ex:#x} y={ey:#x} z={ez:#x}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9099)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--curve", type=int, default=0, choices=(0, 1))
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--write-vectors", nargs=2, metavar=("N", "PATH"))
    args = ap.parse_args()
    if args.write_vectors:
        write_vectors(args.write_vectors[1], int(args.write_vectors[0]),
                      args.curve)
        return
    t0 = time.perf_counter()
    r = msm_benchmark(args.size, args.host, args.port, args.curve,
                      num_instance=args.runs)
    wall = (time.perf_counter() - t0) * 1e3
    print(f"size=2^{args.size.bit_length() - 1} runs={r.num_instance} "
          f"avg_compute={r.avg_processing_time:.1f} ms "
          f"(wall incl. vector gen + verify: {wall:.1f} ms) — verified OK")


if __name__ == "__main__":
    main()
