"""End-to-end training-step test: overfit a tiny synthetic scene."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gs_tpu.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                           RasterConfig)
from gs_tpu.core.camera import stack_cameras
from gs_tpu.models.gaussian_model import init_state, create_from_pcd
from gs_tpu.ops.losses import psnr
from gs_tpu.render import render
from gs_tpu.train.step import make_train_step
from tests.utils import random_params, default_camera


@pytest.mark.slow
def test_overfit_single_view():
    rng = np.random.default_rng(7)
    W, H = 64, 48
    cam = default_camera(W, H)
    cams = stack_cameras([cam])

    # ground truth rendered from a hidden scene
    gt_scene = random_params(rng, 60)
    bg = jnp.zeros(3)
    gt = render(cam, gt_scene, bg, active_sh_degree=3, backend="binned",
                dup_capacity=1 << 13, max_per_tile=256).image

    # init model from noisy points
    pts = rng.normal(0, 0.8, (80, 3)) + np.array([0, 0, 4.0])
    cols = rng.uniform(0, 1, (80, 3))
    params, alive = create_from_pcd(pts, cols, sh_degree=3, capacity=128)
    state = init_state(params, alive, num_images=1)

    opt = OptimizationConfig(iterations=200, position_lr_max_steps=200)
    raster = RasterConfig(backend="binned", dup_capacity=1 << 13,
                          max_per_tile=256, chunk=64)
    step = make_train_step(opt, ModelConfig(), PipelineConfig(), raster,
                           cams, spatial_lr_scale=1.0, max_sh_degree=3)

    key = jax.random.key(0)
    first_loss = None
    for it in range(1, 151):
        key, sub = jax.random.split(key)
        state, metrics = step(state, jnp.int32(0), gt, None, None, None,
                              jnp.float32(0.0), jnp.int32(it), sub)
        if it == 1:
            first_loss = float(metrics.loss)
            assert not bool(metrics.overflow)
    last_loss = float(metrics.loss)
    assert np.isfinite(last_loss)
    assert last_loss < 0.7 * first_loss, (first_loss, last_loss)

    out = render(cam, state.params, bg, active_sh_degree=3, backend="binned",
                 alive=state.alive, dup_capacity=1 << 13, max_per_tile=256)
    p = float(psnr(out.image[None], gt[None])[0, 0])
    assert p > 15.0, f"PSNR after overfit too low: {p}"


def test_sh_degree_ramp_masks_coeffs():
    from gs_tpu.train.step import mask_sh_rest
    rng = np.random.default_rng(3)
    params = random_params(rng, 4)
    m0 = mask_sh_rest(params, jnp.int32(0))
    assert float(jnp.abs(m0.sh_rest).sum()) == 0.0
    m1 = mask_sh_rest(params, jnp.int32(1))
    assert float(jnp.abs(m1.sh_rest[:, :3]).sum()) > 0
    assert float(jnp.abs(m1.sh_rest[:, 3:]).sum()) == 0.0
    m3 = mask_sh_rest(params, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(m3.sh_rest), np.asarray(params.sh_rest))
