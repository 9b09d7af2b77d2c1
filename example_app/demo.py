"""All-in-one demo: spawn the MSM service in-process, run the benchmark
client across sizes, print the reference-style table.

The role of the reference's SwiftUI app screen (ContentView.swift: tap a
size, see the latency): `python -m example_app.demo [--sizes 10,12,14]`.
"""

from __future__ import annotations

import argparse

from . import client, service


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", default="10,12,14",
                    help="comma-separated log2 sizes")
    ap.add_argument("--curve", type=int, default=0, choices=(0, 1))
    args = ap.parse_args()

    srv = service.serve(port=0, background=True)
    port = srv.server_address[1]
    print(f"[demo] msm-service on 127.0.0.1:{port}")
    print(f"{'size':>8} {'compute (ms)':>14}")
    try:
        for lg in (int(s) for s in args.sizes.split(",")):
            r = client.msm_benchmark(1 << lg, port=port,
                                     curve_id=args.curve)
            print(f"2^{lg:<6} {r.avg_processing_time:>14.1f}")
    finally:
        srv.shutdown()
    print("[demo] all results verified against the oracle")


if __name__ == "__main__":
    main()
