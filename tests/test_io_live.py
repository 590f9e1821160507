"""Live-stream stack tests: frame codec, TCP server/client, scene bootstrap,
stream-file converter, pointcloud utilities, live training smoke."""
import os
import threading

import numpy as np
import pytest

from gs_tpu.io_live.ingest import qvec2rotmat, scene_info_from_frames
from gs_tpu.io_live.pointcloud import (estimate_heading,
                                       remove_statistical_outliers,
                                       rotation_z, transform_points,
                                       voxel_downsample)
from gs_tpu.io_live.stream import (Frame, FrameStreamClient,
                                   FrameStreamServer, decode_frame,
                                   encode_frame, read_stream_file,
                                   write_stream_file)


def make_frame(rng, i, with_points=False, w=64, h=48):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
    q = rng.normal(size=4); q[0] += 3; q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    pts = rng.normal(size=(20, 3)).astype(np.float32) if with_points else None
    return Frame(stamp=float(i) / 30, image=img, K=K, qvec=q, tvec=t,
                 pose_convention="c2w", points=pts)


@pytest.fixture
def frames(rng):
    return [make_frame(rng, i, with_points=(i % 2 == 0)) for i in range(10)]


def test_frame_codec(frames):
    for enc in ("rgb8", "png"):
        blob = encode_frame(frames[0], enc)
        n = int.from_bytes(blob[:4], "little")
        f2 = decode_frame(blob[4:4 + n])
        np.testing.assert_array_equal(f2.image, frames[0].image)  # lossless
        np.testing.assert_allclose(f2.K, frames[0].K)
        np.testing.assert_allclose(f2.qvec, frames[0].qvec)
        np.testing.assert_allclose(f2.tvec, frames[0].tvec)
    # jpeg is lossy but shape-preserving
    blob = encode_frame(frames[0], "jpeg")
    f3 = decode_frame(blob[4:])
    assert f3.image.shape == frames[0].image.shape
    np.testing.assert_allclose(f3.points, frames[0].points)


def test_stream_tcp_roundtrip(frames):
    server = FrameStreamServer("127.0.0.1", 0)
    try:
        def publish():
            client = FrameStreamClient("127.0.0.1", server.port)
            for f in frames:
                client.send(f, encoding="png")
            client.close()

        t = threading.Thread(target=publish, daemon=True)
        t.start()
        got = server.wait_for_frames(len(frames), timeout=20)
        t.join(timeout=5)
        assert len(got) == len(frames)
        np.testing.assert_array_equal(got[3].image, frames[3].image)
    finally:
        server.close()


def test_stream_file_roundtrip(frames, tmp_path):
    path = str(tmp_path / "run.gstream")
    write_stream_file(path, frames, encoding="png")
    got = read_stream_file(path)
    assert len(got) == len(frames)
    np.testing.assert_array_equal(got[-1].image, frames[-1].image)


def test_scene_bootstrap(frames, tmp_path):
    info = scene_info_from_frames(frames, str(tmp_path), eval_split=True,
                                  llffhold=5, init_points=50)
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 8
    pts, rgb, _ = info.point_cloud
    assert pts.shape == (50, 3)
    assert os.path.exists(info.ply_path)
    assert os.path.exists(info.train_cameras[0].image_path)
    # pose roundtrip: CameraInfo.R/T must invert back to the c2w input
    ci = sorted(info.train_cameras + info.test_cameras,
                key=lambda c: c.image_name)[0]
    f = frames[0]
    Rc2w = qvec2rotmat(f.qvec)
    np.testing.assert_allclose(ci.R, (Rc2w.T).T, atol=1e-9)
    np.testing.assert_allclose(ci.T, -Rc2w.T @ f.tvec, atol=1e-9)
    # local-map init path
    info2 = scene_info_from_frames(frames, str(tmp_path / "lm"),
                                   eval_split=False, use_local_maps=True)
    pts2, _, _ = info2.point_cloud
    assert pts2.shape == (5 * 20, 3)


def test_convert_stream(frames, tmp_path):
    from gs_tpu.apps import convert_stream
    from gs_tpu.data import colmap
    path = str(tmp_path / "run.gstream")
    write_stream_file(path, frames, encoding="png")
    out = str(tmp_path / "colmap")
    convert_stream.main(["--input", path, "--output", out, "--every", "2",
                         "--voxel_size", "0.5"])
    intr = colmap.read_intrinsics_text(os.path.join(out, "sparse/0/cameras.txt"))
    extr = colmap.read_extrinsics_text(os.path.join(out, "sparse/0/images.txt"))
    assert len(extr) == 5
    assert intr[1].model == "PINHOLE"
    assert os.path.exists(os.path.join(out, "sparse/0/points3D.ply"))
    assert len(os.listdir(os.path.join(out, "images"))) == 5
    # pose: c2w input inverted to w2c in images.txt
    f = frames[0]
    Rc2w = qvec2rotmat(f.qvec)
    Rwc = colmap.qvec2rotmat(extr[1].qvec)
    np.testing.assert_allclose(Rwc, Rc2w.T, atol=1e-7)


def test_pointcloud_utils(rng):
    pts = rng.normal(size=(1000, 3))
    down = voxel_downsample(pts, 0.5)
    assert len(down) < len(pts)
    # outliers
    pts2 = np.concatenate([pts, np.array([[100.0, 100, 100]])])
    kept, mask = remove_statistical_outliers(pts2, nb_neighbors=10)
    assert not mask[-1]
    # rigid transform roundtrip
    M = np.eye(4); M[:3, :3] = rotation_z(0.3); M[:3, 3] = [1, 2, 3]
    Minv = np.linalg.inv(M)
    np.testing.assert_allclose(
        transform_points(transform_points(pts, M), Minv), pts, atol=1e-9)
    # heading of a straight track
    track = np.stack([np.linspace(0, 10, 50), np.linspace(0, 10, 50),
                      np.zeros(50)], 1)
    assert estimate_heading(track) == pytest.approx(np.pi / 4)


@pytest.mark.slow
def test_train_live_smoke(rng, tmp_path, monkeypatch):
    """End-to-end: publisher thread -> live trainer for a few iterations."""
    from gs_tpu.apps import train_live

    # make frames that look at a common target so training is sane
    frames = [make_frame(rng, i) for i in range(6)]

    server_holder = {}
    orig_init = FrameStreamServer.__init__

    def patched_init(self, host="127.0.0.1", port=0):
        orig_init(self, host, 0)      # ephemeral port
        server_holder["server"] = self
        def publish():
            client = FrameStreamClient("127.0.0.1", self.port)
            for f in frames:
                client.send(f, encoding="png")
            client.close()
        threading.Thread(target=publish, daemon=True).start()

    monkeypatch.setattr(FrameStreamServer, "__init__", patched_init)
    model = str(tmp_path / "live_model")
    train_live.main(["-m", model, "--max_frames", "6", "--collect_timeout",
                     "30", "--iterations", "3", "--test_iterations", "3",
                     "--save_iterations", "3", "--quiet",
                     "--dup_capacity", "4096", "--max_per_tile", "128",
                     "--chunk", "32", "--init_points", "50"])
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_3", "point_cloud.ply"))


# ------------------------------------------------------------------ GPS (S7)

def test_sbp_roundtrip_and_resync(tmp_path):
    """SBP framing: valid frames parse exactly; garbage bytes and
    corrupted-CRC frames are skipped with resync at the next preamble
    (ref: gps_pub.py reads via the sbp Framer, which does the same)."""
    import io
    from gs_tpu.io_live.gps import (SBP_MSG_BASELINE_NED, encode_baseline_ned,
                                    iter_sbp, parse_baseline_ned)

    f1 = encode_baseline_ned(1000, n_mm=1219, e_mm=-9304, d_mm=-483)
    f2 = encode_baseline_ned(1100, n_mm=-3091, e_mm=-11695, d_mm=-434)
    corrupted = bytearray(encode_baseline_ned(1050, 1, 2, 3))
    corrupted[10] ^= 0xFF   # payload bit flip -> CRC mismatch
    blob = b"\x00\x55\x13garbage" + f1 + bytes(corrupted) + b"\x55" + f2

    msgs = list(iter_sbp(io.BytesIO(blob)))
    assert [m[0] for m in msgs] == [SBP_MSG_BASELINE_NED] * 2
    a = parse_baseline_ned(msgs[0][2])
    b = parse_baseline_ned(msgs[1][2])
    # the reference's own logged start/end positions (gps_pub.py:47-49)
    assert a.enu_meters() == pytest.approx((-9.304, 1.219, 0.483))
    assert b.enu_meters() == pytest.approx((-11.695, -3.091, 0.434))


def test_gps_pub_cli_replay_and_publish(tmp_path):
    """gps_pub CLI end-to-end on a capture file: CSV log written in the
    reference schema and msgpack points received on the TCP channel."""
    import socket
    import struct
    import msgpack
    from gs_tpu.apps import gps_pub
    from gs_tpu.io_live.gps import encode_baseline_ned

    cap = tmp_path / "capture.sbp"
    cap.write_bytes(b"".join(
        encode_baseline_ned(1000 + 100 * i, n_mm=100 * i, e_mm=-200 * i,
                            d_mm=50 * i)
        for i in range(5)))

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    got = []

    def receiver():
        conn, _ = srv.accept()
        with conn:
            while len(got) < 5:
                n = struct.unpack("<I", conn.recv(4, socket.MSG_WAITALL))[0]
                got.append(msgpack.unpackb(
                    conn.recv(n, socket.MSG_WAITALL)))

    t = threading.Thread(target=receiver, daemon=True)
    t.start()
    csv_path = tmp_path / "baseline_ned.csv"
    n = gps_pub.main(["-p", str(cap), "--csv", str(csv_path), "--quiet",
                      "--publish", f"127.0.0.1:{srv.getsockname()[1]}"])
    t.join(timeout=10)
    srv.close()
    assert n == 5
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "TS,X,Y,Z"
    assert len(lines) == 6
    assert len(got) == 5
    assert got[2]["topic"] == "/rtk_gps_pos"
    assert got[2]["x"] == pytest.approx(-0.4)   # e=-400mm
    assert got[2]["y"] == pytest.approx(0.2)
    assert got[2]["z"] == pytest.approx(-0.1)
    assert [g["seq"] for g in got] == list(range(5))
