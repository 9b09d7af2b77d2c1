"""MSM offload service: the TPU-side half of the example app.

The deployment analogue of the reference's in-process GPU pipeline behind
UniFFI (example-app/src/lib.rs:17-26): a threaded TCP server that keeps
one compiled `MSMPipeline` alive per (curve, n-bucket) across requests —
provers connect, stream (points, scalars), and get the Jacobian result
plus device compute time back. Compile-once-serve-many: request latency
is pure pipeline latency after the first call of a given shape.

    python -m example_app.service --port 9099 [--host 0.0.0.0]
"""

from __future__ import annotations

import argparse
import socket
import socketserver
import threading
import time

from tpu_msm.config import default_config
from tpu_msm.cuzk.pipeline import get_pipeline

from . import protocol


class MSMHandler(socketserver.BaseRequestHandler):
    def handle(self):
        sock: socket.socket = self.request
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        while True:
            try:
                req = protocol.recv_request(sock)
            except (ValueError, ConnectionError) as e:
                try:
                    protocol.send_error(sock, str(e))
                except OSError:
                    pass
                return
            if req is None:
                return                       # clean EOF: client done
            curve_id, xs_w, ys_w, sc_w = req
            curve = protocol.CURVE_IDS[curve_id]
            try:
                points = list(zip(protocol.words_to_ints(xs_w),
                                  protocol.words_to_ints(ys_w)))
                scalars = protocol.words_to_ints(sc_w)
                # ingress validation (FileInputIterator Checked-mode
                # analogue, preprocess.rs:26-131): reject off-curve /
                # out-of-field points with a protocol error instead of
                # computing garbage
                p, b = curve.p, curve.b_coeff
                for i, (x, y) in enumerate(points):
                    if not (0 <= x < p and 0 <= y < p) or \
                            (y * y - (x * x * x + b)) % p != 0:
                        raise ValueError(
                            f"point {i} rejected: not on curve "
                            f"{curve.name}")
                pipe = get_pipeline(default_config(len(points), curve))
                t0 = time.perf_counter()
                jac = pipe.msm(points, scalars)
                ms = (time.perf_counter() - t0) * 1e3
                protocol.send_result(sock, curve, jac, ms)
            except Exception as e:           # surface, don't kill the server
                try:
                    protocol.send_error(sock, f"{type(e).__name__}: {e}")
                except OSError:
                    return


class MSMServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def serve(host: str = "127.0.0.1", port: int = 9099,
          background: bool = False) -> MSMServer:
    server = MSMServer((host, port), MSMHandler)
    if background:
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
    print(f"[msm-service] listening on {host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return server


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9099)
    args = ap.parse_args()
    serve(args.host, args.port)


if __name__ == "__main__":
    main()
