"""End-to-end app tests: train CLI -> render CLI -> metrics CLI on a tiny
synthetic COLMAP scene, checkpoint resume, and the viewer TCP protocol."""
import json
import os
import threading

import numpy as np
import pytest

from test_data import make_colmap_dataset


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    rng = np.random.default_rng(3)
    root = str(tmp_path_factory.mktemp("dataset"))
    make_colmap_dataset(root, rng, n_images=8, width=64, height=48)
    return root


def _train_args(root, model, iters=12, extra=()):
    return ["-s", root, "-m", model,
            "--iterations", str(iters),
            "--test_iterations", str(iters),
            "--save_iterations", str(iters),
            "--densify_from_iter", "4",
            "--densification_interval", "5",
            "--opacity_reset_interval", "1000",
            "--dup_capacity", "4096", "--max_per_tile", "64",
            "--chunk", "32", "--disable_viewer", "--quiet",
            "--eval", *extra]


@pytest.mark.slow
def test_train_render_metrics_cli(tiny_scene, tmp_path):
    from gs_tpu.apps import metrics as metrics_app
    from gs_tpu.apps import render as render_app
    from gs_tpu.apps import train as train_app

    model = str(tmp_path / "model")
    train_app.main(_train_args(tiny_scene, model, iters=12,
                               extra=["--checkpoint_iterations", "12"]))

    # model-dir layout (ref: SURVEY.md Appendix A)
    assert os.path.exists(os.path.join(model, "cfg_args"))
    assert os.path.exists(os.path.join(model, "config.json"))
    assert os.path.exists(os.path.join(model, "cameras.json"))
    assert os.path.exists(os.path.join(model, "input.ply"))
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_12", "point_cloud.ply"))
    assert os.path.exists(os.path.join(model, "chkpnt12.pth"))

    render_app.main(["-m", model, "--quiet", "--dup_capacity", "4096",
                     "--max_per_tile", "64", "--chunk", "32"])
    renders = os.path.join(model, "test", "ours_12", "renders")
    gts = os.path.join(model, "test", "ours_12", "gt")
    assert len(os.listdir(renders)) == 1  # 8 images, llffhold=8 -> 1 test view
    assert sorted(os.listdir(renders)) == sorted(os.listdir(gts))

    metrics_app.main(["-m", model, "--no_lpips"])
    with open(os.path.join(model, "results.json")) as f:
        results = json.load(f)
    entry = results["ours_12"]
    assert 0 <= entry["SSIM"] <= 1
    assert entry["PSNR"] > 5


def test_checkpoint_resume(tiny_scene, tmp_path):
    import jax
    from gs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from gs_tpu.apps import train as train_app
    model = str(tmp_path / "model")
    train_app.main(_train_args(tiny_scene, model, iters=6,
                               extra=["--checkpoint_iterations", "6"]))
    state, it, slrs = load_checkpoint(os.path.join(model, "chkpnt6.pth"))
    assert it == 6
    assert int(state.step) == 6
    assert slrs > 0
    # resume two more iterations
    model2 = str(tmp_path / "model2")
    train_app.main(_train_args(tiny_scene, model2, iters=8) +
                   ["--start_checkpoint", os.path.join(model, "chkpnt6.pth")])
    assert os.path.exists(os.path.join(
        model2, "point_cloud", "iteration_8", "point_cloud.ply"))

    # roundtrip fidelity
    p2 = str(tmp_path / "x.pth")
    save_checkpoint(p2, state, 6, slrs)
    state2, _, _ = load_checkpoint(p2)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profile_trace(tiny_scene, tmp_path):
    """--profile captures a jax.profiler trace of warm training steps
    (SURVEY §5 tracing row: the TPU-native replacement for the reference's
    paired cuda.Event iter_time, train.py:60-61,87,139)."""
    from gs_tpu.apps import train as train_app
    model = str(tmp_path / "model")
    prof_dir = str(tmp_path / "trace")
    train_app.main(_train_args(tiny_scene, model, iters=6) +
                   ["--profile", prof_dir, "--profile_steps", "2"])
    hits = []
    for dirpath, _dirnames, filenames in os.walk(prof_dir):
        hits += [os.path.join(dirpath, f) for f in filenames
                 if f.endswith((".xplane.pb", ".trace.json.gz"))]
    assert hits, f"no trace artifacts under {prof_dir}"
    assert all(os.path.getsize(h) > 0 for h in hits)


def test_viewer_roundtrip(tiny_scene, tmp_path):
    """Server renders frames for a protocol-speaking client."""
    import jax.numpy as jnp
    from gs_tpu.data.scene import Scene
    from gs_tpu.models.gaussian_model import create_from_pcd
    from gs_tpu.render import render
    from gs_tpu.viewer.client import ViewerClient
    from gs_tpu.viewer.server import ViewerServer

    scene = Scene(tiny_scene, "", shuffle=False)
    pts, cols, _ = scene.point_cloud
    params, alive = create_from_pcd(pts, cols, sh_degree=1, capacity=64)
    cam = scene.get_train_cameras()[0].camera
    bg = jnp.zeros(3)

    def render_fn(camera, scaling_modifier):
        return render(camera, params, bg, active_sh_degree=0,
                      scaling_modifier=scaling_modifier, alive=alive,
                      backend="binned", dup_capacity=4096,
                      max_per_tile=64, chunk=32).image

    server = ViewerServer("127.0.0.1", 0, render_fn=render_fn,
                          source_path=tiny_scene)
    port = server.listener.getsockname()[1]

    done = threading.Event()
    results = {}

    def client_thread():
        c = ViewerClient("127.0.0.1", port)
        img, src = c.request_frame(cam)
        results["img"], results["src"] = img, src
        img2, _ = c.request_frame(None)   # resolution 0 -> no image
        results["img2"] = img2
        c.close()
        done.set()

    t = threading.Thread(target=client_thread, daemon=True)
    t.start()
    for _ in range(2000):
        server.poll()
        if done.wait(0.01):
            break
    t.join(timeout=10)
    server.close()
    assert done.is_set(), "client never completed"
    assert results["src"] == tiny_scene
    assert results["img"].shape == (cam.height, cam.width, 3)
    assert results["img2"] is None

    # the frame over the wire must equal a direct render
    direct = np.asarray(jnp.clip(render_fn(cam, 1.0), 0, 1))
    direct8 = (direct * 255).astype(np.uint8).transpose(1, 2, 0)
    np.testing.assert_array_equal(results["img"], direct8)


def test_viewer_stock_sibr_bytes(tiny_scene):
    """Wire-exact handshake: feed the server the RAW BYTES a stock SIBR
    remote client sends (4-byte LE length + JSON with network_gui.py:60-79's
    exact field set, glm-transposed matrices with the client-side sign
    conventions) and assert the reply framing: H*W*3 RGB bytes, then 4-byte
    LE length + ascii source path (network_gui.py:44-55). Makes the
    interop claim falsifiable without the C++ client."""
    import json as _json
    import socket
    import struct
    import threading
    import numpy as np
    import jax.numpy as jnp
    from gs_tpu.data.scene import Scene
    from gs_tpu.models.gaussian_model import create_from_pcd
    from gs_tpu.render import render
    from gs_tpu.viewer.server import ViewerServer

    scene = Scene(tiny_scene, "", shuffle=False)
    pts, cols, _ = scene.point_cloud
    params, alive = create_from_pcd(pts, cols, sh_degree=1, capacity=64)
    cam = scene.get_train_cameras()[0].camera
    W, H = 64, 48

    def render_fn(camera, scaling_modifier):
        return render(camera, params, jnp.zeros(3), active_sh_degree=0,
                      scaling_modifier=scaling_modifier, alive=alive,
                      backend="binned", dup_capacity=4096,
                      max_per_tile=64, chunk=32).image

    server = ViewerServer("127.0.0.1", 0, render_fn=render_fn,
                          source_path="/data/truck")
    port = server.listener.getsockname()[1]

    # what the C++ client puts on the wire: glm-transposed matrices, with
    # the columns the SERVER will flip back (network_gui.py:74-78)
    wv = np.asarray(cam.world_view).T.copy()      # glm storage = transposed
    wv[:, 1] = -wv[:, 1]
    wv[:, 2] = -wv[:, 2]
    fp = np.asarray(cam.full_proj).T.copy()
    fp[:, 1] = -fp[:, 1]
    msg = {
        "resolution_x": W, "resolution_y": H, "train": False,
        "fov_y": 2.0 * float(np.arctan(cam.tan_fovy)),
        "fov_x": 2.0 * float(np.arctan(cam.tan_fovx)),
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": False, "scaling_modifier": 1.0,
        "view_matrix": [float(v) for v in wv.reshape(-1)],
        "view_projection_matrix": [float(v) for v in fp.reshape(-1)],
    }
    payload = _json.dumps(msg).encode("utf-8")
    wire = struct.pack("<I", len(payload)) + payload

    reply = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        s.sendall(wire)
        buf = b""
        want = H * W * 3 + 4
        while len(buf) < want:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
        n = struct.unpack("<I", buf[H * W * 3:H * W * 3 + 4])[0]
        while len(buf) < want + n:
            buf += s.recv(65536)
        reply["rgb"] = buf[:H * W * 3]
        reply["path"] = buf[want:want + n].decode("ascii")
        s.close()

    t = threading.Thread(target=client)
    t.start()
    for _ in range(600):
        server.try_connect()
        server.poll(in_training=False)
        if reply:
            break
    t.join(timeout=30)
    server.close()

    assert reply["path"] == "/data/truck"
    img = np.frombuffer(reply["rgb"], np.uint8).reshape(H, W, 3)
    # sanity: the rendered frame matches a direct render of the same camera
    from gs_tpu.core.camera import make_camera
    import math as _m
    direct = render_fn(make_camera(
        np.eye(3), np.zeros(3), 2 * _m.atan(float(cam.tan_fovx)),
        2 * _m.atan(float(cam.tan_fovy)), W, H).__class__(
        world_view=cam.world_view, full_proj=cam.full_proj,
        camera_center=cam.camera_center, tan_fovx=cam.tan_fovx,
        tan_fovy=cam.tan_fovy, width=W, height=H), 1.0)
    want_img = (np.asarray(jnp.clip(direct, 0, 1)) * 255).astype(
        np.uint8).transpose(1, 2, 0)
    assert np.abs(img.astype(int) - want_img.astype(int)).max() <= 1
