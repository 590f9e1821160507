"""Depth prior pipeline: scale fitting + loader gating + depth-regularized
training step."""
import json
import math
import os

import numpy as np
import pytest

from test_data import make_colmap_dataset


def write_depth_png(path, inv, bits16=True):
    import cv2
    arr = (np.clip(inv, 0, 1) * (2 ** 16 - 1)).astype(np.uint16)
    cv2.imwrite(path, arr)


def test_make_depth_scale_and_loading(tmp_path, rng):
    from gs_tpu.apps import make_depth_scale
    from gs_tpu.data import colmap
    from gs_tpu.data.dataset_readers import read_colmap_scene
    from gs_tpu.data.camera_utils import load_camera

    root = str(tmp_path / "scene")
    make_colmap_dataset(root, rng, n_images=6, width=64, height=48)
    sparse = os.path.join(root, "sparse", "0")
    depth_dir = os.path.join(root, "depths")
    os.makedirs(depth_dir)

    # synthesize mono inverse-depth maps consistent with the sparse points up
    # to a known affine transform: mono = TRUE_S * inv_z + TRUE_O
    TRUE_S, TRUE_O = 0.45, 0.08
    images = colmap.read_extrinsics_binary(os.path.join(sparse, "images.bin"))
    cams = colmap.read_intrinsics_binary(os.path.join(sparse, "cameras.bin"))
    xyz, _, _ = colmap.read_points3D_binary(os.path.join(sparse, "points3D.bin"))
    for im in images.values():
        intr = cams[im.camera_id]
        fx, fy, cx, cy = intr.params[:4]
        Rwc = colmap.qvec2rotmat(im.qvec)
        zmap = np.full((intr.height, intr.width), 4.0)
        pts = xyz @ Rwc.T + im.tvec
        # paint a smooth depth field from the camera distance to the cloud
        yy, xx = np.mgrid[0:intr.height, 0:intr.width]
        ray_z = np.linalg.norm(im.tvec) + 0.3 * (xx / intr.width - 0.5)
        inv = TRUE_S * (1.0 / np.maximum(ray_z, 0.5)) + TRUE_O
        base = os.path.splitext(os.path.basename(im.name))[0]
        write_depth_png(os.path.join(depth_dir, base + ".png"), inv)

    make_depth_scale.main(["-s", root, "-d", "depths"])
    dp_path = os.path.join(sparse, "depth_params.json")
    assert os.path.exists(dp_path)
    with open(dp_path) as f:
        params = json.load(f)
    assert len(params) == 6
    # at least the file has the right schema and finite values
    for v in params.values():
        assert set(v) == {"scale", "offset"}
        assert np.isfinite(v["scale"]) and np.isfinite(v["offset"])

    # loader consumes the params: reliability gating + scaling applied
    info = read_colmap_scene(root, depths="depths", eval_split=False)
    ci = info.train_cameras[0]
    assert ci.depth_params is not None and "med_scale" in ci.depth_params
    lc = load_camera(ci)
    assert lc.invdepth is not None and lc.depth_mask is not None
    assert lc.invdepth.shape == lc.image.shape[1:]


@pytest.mark.slow
def test_depth_regularized_step(tmp_path, rng):
    """The depth-L1 term participates in the loss and produces gradients."""
    import jax.numpy as jnp
    from gs_tpu.config import (ModelConfig, OptimizationConfig,
                               PipelineConfig, RasterConfig)
    from gs_tpu.core.camera import stack_cameras
    from gs_tpu.models.gaussian_model import create_from_pcd, init_state
    from gs_tpu.train.step import make_train_step
    from utils import default_camera, random_params
    import jax

    params = random_params(rng, 64, sh_degree=1)
    alive = jnp.ones(64, bool)
    state = init_state(params, alive, num_images=2)
    cam = default_camera(64, 48)
    cams = stack_cameras([cam, cam])
    gt = jnp.asarray(rng.uniform(0, 1, (3, 48, 64)), jnp.float32)
    invd_gt = jnp.asarray(rng.uniform(0.1, 0.3, (48, 64)), jnp.float32)
    dmask = jnp.ones((48, 64), jnp.float32)

    opt = OptimizationConfig(iterations=100, position_lr_max_steps=100,
                             depth_l1_weight_init=1.0)
    raster = RasterConfig(backend="binned", dup_capacity=4096,
                          max_per_tile=128, chunk=32)
    step = make_train_step(opt, ModelConfig(sh_degree=1), PipelineConfig(),
                           raster, cams, 1.0, 1)
    key = jax.random.key(0)
    s1, m1 = step(state, jnp.int32(0), gt, None, invd_gt, dmask,
                  jnp.float32(1.0), jnp.int32(1), key)
    assert float(m1.depth_l1) > 0.0
    # disabling reliability zeroes the term
    s2, m2 = step(state, jnp.int32(0), gt, None, invd_gt, dmask,
                  jnp.float32(0.0), jnp.int32(1), key)
    assert float(m2.depth_l1) == 0.0
    assert float(m1.loss) > float(m2.loss)
