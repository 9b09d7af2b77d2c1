"""Example-app service/protocol tests — the analogue of the reference's
FFI-app smoke path (example-app/src/lib.rs:17-26): round-trip points and
scalars through the wire protocol and the in-process service, verifying
the MSM result against the pure-python oracle."""

import socket
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from example_app import client, protocol, service  # noqa: E402
from tpu_msm.constants import BN254_S12  # noqa: E402
from tpu_msm.reference import curve as ref  # noqa: E402


def test_words_roundtrip():
    vals = [0, 1, (1 << 200) - 3, BN254_S12.p - 1]
    w = protocol.ints_to_words(vals, 4)
    assert w.shape == (4, 4)
    assert protocol.words_to_ints(w) == vals


def test_protocol_roundtrip_loopback():
    """Raw protocol framing over a socketpair (no pipeline)."""
    a, b = socket.socketpair()
    curve = BN254_S12
    nw, sw = protocol.curve_words(curve)
    xs = protocol.ints_to_words([3, 5], nw)
    ys = protocol.ints_to_words([7, 11], nw)
    sc = protocol.ints_to_words([13, 17], sw)
    protocol.send_request(a, 0, xs, ys, sc)
    a.shutdown(socket.SHUT_WR)
    curve_id, rx, ry, rsc = protocol.recv_request(b)
    assert curve_id == 0
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_array_equal(ry, ys)
    np.testing.assert_array_equal(rsc, sc)
    assert protocol.recv_request(b) is None  # clean EOF
    protocol.send_result(b, curve, (1, 2, 3), 4.5)
    res = protocol.recv_result(a, curve)
    assert (res.x, res.y, res.z) == (1, 2, 3)
    assert res.compute_ms == 4.5
    a.close()
    b.close()


def test_protocol_error_path():
    a, b = socket.socketpair()
    protocol.send_error(b, "boom")
    with pytest.raises(RuntimeError, match="boom"):
        protocol.recv_result(a, BN254_S12)
    a.close()
    b.close()


def test_service_end_to_end():
    """Spawn the threaded service, run msm_benchmark at a small size, and
    check the verified-against-oracle path (client verifies internally)."""
    srv = service.serve(port=0, background=True)
    try:
        port = srv.server_address[1]
        r = client.msm_benchmark(256, port=port, verify=True)
        assert r.instance_size == 256
        assert r.num_instance == 1
        assert r.avg_processing_time > 0
    finally:
        srv.shutdown()


def test_service_rejects_off_curve_point():
    """Ingress validation (FileInputIterator Checked-mode analogue,
    preprocess.rs:26-131): a request containing an off-curve point gets
    a clean protocol error naming the point, not a garbage result."""
    srv = service.serve(port=0, background=True)
    try:
        port = srv.server_address[1]
        curve = BN254_S12
        nw, sw = protocol.curve_words(curve)
        good = (curve.gen_x, curve.gen_y)
        bad = (curve.gen_x, (curve.gen_y + 1) % curve.p)   # off-curve
        xs = protocol.ints_to_words([good[0], bad[0]], nw)
        ys = protocol.ints_to_words([good[1], bad[1]], nw)
        sc = protocol.ints_to_words([3, 5], sw)
        with socket.create_connection(("127.0.0.1", port)) as sock:
            protocol.send_request(sock, 0, xs, ys, sc)
            with pytest.raises(RuntimeError, match="point 1 rejected"):
                protocol.recv_result(sock, curve)
    finally:
        srv.shutdown()


def test_load_vectors_checked_mode(tmp_path, monkeypatch):
    """load_or_gen_vectors validates file-loaded points on-curve by
    default and rejects a corrupted file with a clean error; check=False
    is the Unchecked escape hatch."""
    from tpu_msm.utils import preprocess
    monkeypatch.setattr(preprocess, "VECTOR_DIR", str(tmp_path))
    c = BN254_S12
    xs, ys, hw, _ = preprocess.load_or_gen_vectors(c, 32, seed=5, k_base=4)
    # re-load the valid file through the checked path
    preprocess.load_or_gen_vectors(c, 32, seed=5, k_base=4)
    # corrupt one limb of one point's y and re-save
    ys2 = ys.copy()
    ys2[0, 7] ^= 1
    preprocess.save_vectors(preprocess.vector_path(c, 32, 5), xs, ys2, hw)
    with pytest.raises(ValueError, match="not on curve"):
        preprocess.load_or_gen_vectors(c, 32, seed=5, k_base=4)
    preprocess.load_or_gen_vectors(c, 32, seed=5, k_base=4, check=False)


def test_vector_file_matches_request(tmp_path):
    """--write-vectors emits verbatim request bytes the native client can
    replay: parse them back through recv_request."""
    path = tmp_path / "vec.bin"
    client.write_vectors(str(path), 64)
    a, b = socket.socketpair()
    a.sendall(path.read_bytes())
    a.shutdown(socket.SHUT_WR)
    curve_id, xs, ys, sc = protocol.recv_request(b)
    assert curve_id == 0 and xs.shape == (64, 4)
    # every point must be on the curve
    c = BN254_S12
    for x, y in zip(protocol.words_to_ints(xs)[:4],
                    protocol.words_to_ints(ys)[:4]):
        assert ref.on_curve(c, (x, y, 1))
    a.close()
    b.close()
