"""Data-layer tests: PLY roundtrips, COLMAP bin/text loaders, Blender loader,
resolution policy, Scene layout. All on synthetic datasets written to tmpdir."""
import json
import math
import os

import numpy as np
import pytest

from gs_tpu.data import colmap
from gs_tpu.data.camera_utils import (camera_to_json, load_camera,
                                      resolve_resolution)
from gs_tpu.data.dataset_readers import (get_nerfpp_norm, load_scene_info,
                                         random_init_pointcloud,
                                         read_colmap_scene,
                                         read_nerf_synthetic_scene)
from gs_tpu.data.ply import (fetch_pointcloud, load_gaussian_ply,
                             read_ply, save_gaussian_ply, store_pointcloud,
                             write_ply)
from gs_tpu.data.scene import Scene


# ------------------------------------------------------------------ helpers

def make_colmap_dataset(root, rng, n_images=10, width=64, height=48,
                        binary=True, model="PINHOLE"):
    from PIL import Image
    sparse = os.path.join(root, "sparse", "0")
    images_dir = os.path.join(root, "images")
    os.makedirs(sparse)
    os.makedirs(images_dir)

    f = width / (2 * math.tan(math.radians(30)))
    params = ([f, f, width / 2, height / 2] if model == "PINHOLE"
              else [f, width / 2, height / 2])
    intr = {1: colmap.Intrinsics(1, model, width, height, np.array(params))}

    extr = {}
    for i in range(n_images):
        theta = 2 * math.pi * i / n_images
        # camera on a circle looking at origin
        c = np.array([3 * math.cos(theta), 0.2, 3 * math.sin(theta)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rcw = np.stack([right, up2, fwd], axis=1)  # cam->world
        Rwc = Rcw.T
        t = -Rwc @ c
        name = f"img_{i:03d}.png"
        extr[i + 1] = colmap.Extrinsics(
            i + 1, colmap.rotmat2qvec(Rwc), t, 1, name,
            np.zeros((0, 2)), np.zeros((0,), np.int64))
        img = (rng.uniform(0, 255, (height, width, 3))).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(images_dir, name))

    if binary:
        colmap.write_intrinsics_binary(intr, os.path.join(sparse, "cameras.bin"))
        colmap.write_extrinsics_binary(extr, os.path.join(sparse, "images.bin"))
        xyz = rng.uniform(-1, 1, (50, 3))
        rgb = (rng.uniform(0, 255, (50, 3))).astype(np.uint8)
        colmap.write_points3D_binary(xyz, rgb, np.zeros((50, 1)),
                                     os.path.join(sparse, "points3D.bin"))
    else:
        colmap.write_intrinsics_text(intr, os.path.join(sparse, "cameras.txt"))
        colmap.write_extrinsics_text(extr, os.path.join(sparse, "images.txt"))
        with open(os.path.join(sparse, "points3D.txt"), "w") as fh:
            for i in range(50):
                p = rng.uniform(-1, 1, 3)
                fh.write(f"{i+1} {p[0]} {p[1]} {p[2]} 100 120 140 0.5\n")
    return intr, extr


def make_blender_dataset(root, rng, n_train=6, n_test=3, width=48, height=48):
    from PIL import Image
    os.makedirs(root, exist_ok=True)
    for split, n in (("train", n_train), ("test", n_test)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 2 + 0.1 * i]
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
            rgba = (rng.uniform(0, 255, (height, width, 4))).astype(np.uint8)
            Image.fromarray(rgba, "RGBA").save(
                os.path.join(root, split, f"r_{i}.png"))
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)


# -------------------------------------------------------------------- tests

def test_ply_roundtrip(tmp_path, rng):
    path = str(tmp_path / "pc.ply")
    xyz = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    rgb = (rng.uniform(0, 255, (100, 3))).astype(np.uint8)
    store_pointcloud(path, xyz, rgb)
    pts, cols, normals = fetch_pointcloud(path)
    np.testing.assert_allclose(pts, xyz, rtol=1e-6)
    np.testing.assert_allclose(cols, rgb.astype(np.float32) / 255.0, atol=1e-6)
    assert normals.shape == (100, 3)


def test_gaussian_ply_roundtrip(tmp_path, rng):
    n, deg = 37, 3
    path = str(tmp_path / "model.ply")
    fields = dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        sh_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        sh_rest=rng.normal(size=(n, (deg + 1) ** 2 - 1, 3)).astype(np.float32),
        logit_opacity=rng.normal(size=(n, 1)).astype(np.float32),
        log_scale=rng.normal(size=(n, 3)).astype(np.float32),
        quat=rng.normal(size=(n, 4)).astype(np.float32))
    save_gaussian_ply(path, **fields)
    out = load_gaussian_ply(path)
    assert out["sh_degree"] == deg
    for k, v in fields.items():
        np.testing.assert_array_equal(out[k], v, err_msg=k)
    # schema check: exact reference field order in the header
    with open(path, "rb") as f:
        header = f.read(2000).split(b"end_header")[0].decode()
    for fld in ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_rest_0",
                "opacity", "scale_0", "rot_3"]:
        assert f"property float {fld}" in header


@pytest.mark.parametrize("binary", [True, False])
def test_colmap_scene(tmp_path, rng, binary):
    root = str(tmp_path / "scene")
    intr, extr = make_colmap_dataset(root, rng, binary=binary)
    info = read_colmap_scene(root, eval_split=True, llffhold=4)
    n = len(extr)
    assert len(info.test_cameras) == (n + 3) // 4
    assert len(info.train_cameras) == n - len(info.test_cameras)
    # cameras on a r=3 circle: 1.1 * max-dist-to-centroid is in (3.3, 6.6)
    assert 3.2 < info.nerf_normalization["radius"] < 6.7
    pts, cols, _ = info.point_cloud
    assert pts.shape == (50, 3)
    # qvec/rotmat roundtrip through the files
    cam0 = sorted(info.train_cameras + info.test_cameras,
                  key=lambda c: c.image_name)[0]
    R0 = colmap.qvec2rotmat(extr[1].qvec).T
    np.testing.assert_allclose(cam0.R, R0, atol=1e-6)
    np.testing.assert_allclose(cam0.T, extr[1].tvec, atol=1e-6)


def test_blender_scene(tmp_path, rng):
    root = str(tmp_path / "nerf")
    make_blender_dataset(root, rng)
    info = read_nerf_synthetic_scene(root, white_background=True,
                                     eval_split=True)
    assert len(info.train_cameras) == 6
    assert len(info.test_cameras) == 3
    assert info.is_nerf_synthetic
    pts, _, _ = info.point_cloud
    assert pts.shape == (100_000, 3)
    assert np.all(np.abs(pts) <= 1.3 + 1e-6)
    # dispatch
    info2 = load_scene_info(root, eval_split=False)
    assert len(info2.train_cameras) == 9 and not info2.test_cameras


def test_resolution_policy():
    # ref: utils/camera_utils.py:42-59
    assert resolve_resolution(3200, 2400, -1) == (1600, 1200)
    assert resolve_resolution(1600, 1200, -1) == (1600, 1200)
    assert resolve_resolution(1600, 1200, 2) == (800, 600)
    assert resolve_resolution(1600, 1200, 8) == (200, 150)
    assert resolve_resolution(1600, 1200, 800) == (800, 600)


def test_scene_container(tmp_path, rng):
    root = str(tmp_path / "scene")
    model = str(tmp_path / "out")
    make_colmap_dataset(root, rng)
    scene = Scene(root, model, eval_split=True, shuffle=False)
    assert os.path.exists(os.path.join(model, "cameras.json"))
    assert os.path.exists(os.path.join(model, "input.ply"))
    cams = scene.get_train_cameras()
    assert cams[0].image.shape == (3, 48, 64)
    assert cams[0].alpha_mask.shape == (1, 48, 64)
    assert 0.0 <= cams[0].image.min() and cams[0].image.max() <= 1.0

    # snapshot roundtrip through the Scene layout
    from gs_tpu.models.gaussian_model import create_from_pcd
    pts, cols, _ = scene.point_cloud
    params, alive = create_from_pcd(pts, cols, sh_degree=2, capacity=128)
    scene.save(77, params, np.asarray(alive))
    out, it = scene.load_ply(-1)
    assert it == 77
    assert out["xyz"].shape[0] == int(np.asarray(alive).sum())
    np.testing.assert_allclose(out["xyz"], np.asarray(params.xyz)[:50],
                               atol=1e-6)


def test_train_test_exp_mask(tmp_path, rng):
    root = str(tmp_path / "scene")
    make_colmap_dataset(root, rng)
    info = read_colmap_scene(root, eval_split=True, llffhold=4)
    tc = info.test_cameras[0]
    lc = load_camera(tc, train_test_exp=True, is_test_dataset=True)
    w = lc.alpha_mask.shape[-1]
    assert lc.alpha_mask[0, 0, : w // 2].max() == 0.0
    assert lc.alpha_mask[0, 0, w // 2:].min() == 1.0
    lc2 = load_camera(tc, train_test_exp=True, is_test_dataset=False)
    assert lc2.alpha_mask[0, 0, w // 2:].max() == 0.0


def test_random_init_pointcloud(tmp_path, rng):
    root = str(tmp_path / "scene")
    _, extr = make_colmap_dataset(root, rng)
    info = read_colmap_scene(root)
    xyz, rgb, normals = random_init_pointcloud(info.train_cameras, 100)
    assert xyz.shape == (100, 3)
    assert np.abs(xyz).max() < 3 * 3.2 * 2  # inside 3x bbox of r=3 circle


def test_camera_to_json(tmp_path, rng):
    root = str(tmp_path / "scene")
    _, extr = make_colmap_dataset(root, rng)
    info = read_colmap_scene(root)
    j = camera_to_json(0, info.train_cameras[0])
    assert set(j) == {"id", "img_name", "width", "height", "position",
                      "rotation", "fy", "fx"}
    # position must equal the camera center (inverse W2C translation)
    c = info.train_cameras[0]
    W2C = np.eye(4); W2C[:3, :3] = c.R.T; W2C[:3, 3] = c.T
    np.testing.assert_allclose(j["position"], np.linalg.inv(W2C)[:3, 3],
                               atol=1e-6)
