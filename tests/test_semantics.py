"""Reference-semantics checks (SURVEY.md §7.3 judge checklist): sparse adam,
exposure compensation, antialiasing opacity rescale, LR schedule shape,
densify constants, random background."""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gs_tpu.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                           RasterConfig)
from gs_tpu.core.camera import stack_cameras
from gs_tpu.core.project import AA_DET_CLAMP, LOWPASS, preprocess
from gs_tpu.models.gaussian_model import (adam_update, create_from_pcd,
                                          group_lrs, init_state)
from gs_tpu.train.step import apply_exposure, make_train_step, mask_sh_rest
from gs_tpu.utils.schedules import expon_lr

from utils import default_camera, random_params

RASTER = RasterConfig(backend="binned", dup_capacity=4096, max_per_tile=128,
                      chunk=32)


def test_expon_lr_reference_shape():
    """ref: utils/general_utils.py:29-62 — log-lerp with sin-eased delay."""
    # endpoints
    assert float(expon_lr(0, 1e-2, 1e-4, max_steps=100)) == pytest.approx(1e-2)
    assert float(expon_lr(100, 1e-2, 1e-4, max_steps=100)) == pytest.approx(1e-4)
    # log-linear midpoint
    assert float(expon_lr(50, 1e-2, 1e-4, max_steps=100)) == pytest.approx(
        math.exp((math.log(1e-2) + math.log(1e-4)) / 2))
    # delay multiplier at step 0
    v = float(expon_lr(0, 1e-2, 1e-4, lr_delay_steps=10, lr_delay_mult=0.1,
                       max_steps=100))
    assert v == pytest.approx(0.1 * 1e-2)
    # negative step -> 0 (ref behavior)
    assert float(expon_lr(-1, 1e-2, 1e-4, max_steps=100)) == 0.0


def test_group_lrs_reference_ratios(rng):
    """f_rest = feature_lr / 20, xyz scaled by spatial extent
    (ref: gaussian_model.py:160-176)."""
    opt = OptimizationConfig()
    lrs = group_lrs(opt, 0, spatial_lr_scale=2.0)
    assert float(lrs.sh_rest) == pytest.approx(opt.feature_lr / 20.0)
    assert float(lrs.sh_dc) == pytest.approx(opt.feature_lr)
    assert float(lrs.xyz) == pytest.approx(opt.position_lr_init * 2.0)
    assert float(lrs.logit_opacity) == pytest.approx(opt.opacity_lr)


def test_sparse_adam_masks_rows(rng):
    """sparse_adam updates only visible rows (ref: train.py:173-175)."""
    params = random_params(rng, 32, sh_degree=1)
    state = init_state(params, jnp.ones(32, bool), 1)
    grads = jax.tree.map(jnp.ones_like, params)
    lrs = group_lrs(OptimizationConfig(), 0, 1.0)
    visible = jnp.arange(32) < 10
    new = adam_update(state, grads, lrs, visible_mask=visible)
    moved = np.abs(np.asarray(new.params.xyz - params.xyz)).sum(axis=1)
    assert np.all(moved[:10] > 0)
    assert np.all(moved[10:] == 0)
    # moments of masked rows untouched
    assert np.all(np.asarray(new.m.xyz)[10:] == 0)


def test_exposure_affine():
    """image' = E[:3,:3]-mixed channels + offset
    (ref: gaussian_renderer/__init__.py:111-114)."""
    img = jnp.ones((3, 4, 5)) * jnp.array([1.0, 2.0, 3.0])[:, None, None]
    e = jnp.concatenate([2 * jnp.eye(3), jnp.full((3, 1), 0.5)], axis=1)
    out = apply_exposure(img, e)
    np.testing.assert_allclose(np.asarray(out[0]), 2.5)
    np.testing.assert_allclose(np.asarray(out[1]), 4.5)
    np.testing.assert_allclose(np.asarray(out[2]), 6.5)


@pytest.mark.slow
def test_exposure_training_updates_only_seen_camera(rng):
    params = random_params(rng, 64, sh_degree=1)
    state = init_state(params, jnp.ones(64, bool), num_images=3)
    cam = default_camera(64, 48)
    cams = stack_cameras([cam] * 3)
    gt = jnp.asarray(rng.uniform(0, 1, (3, 48, 64)), jnp.float32)
    step = make_train_step(OptimizationConfig(iterations=10),
                           ModelConfig(sh_degree=1, train_test_exp=True),
                           PipelineConfig(), RASTER, cams, 1.0, 1)
    s2, _ = step(state, jnp.int32(1), gt, None, None, None,
                 jnp.float32(0.0), jnp.int32(1), jax.random.key(0))
    d = np.abs(np.asarray(s2.exposure - state.exposure)).sum(axis=(1, 2))
    assert d[1] > 0 and d[0] == 0 and d[2] == 0


def test_antialiasing_opacity_rescale(rng):
    """Mip-Splatting: opacity *= sqrt(max(0.000025, det/det_dilated))
    (ref: SURVEY.md §2.3-N1)."""
    params = random_params(rng, 64, sh_degree=1)
    cam = default_camera(64, 48)
    p_off = preprocess(params, cam, active_sh_degree=1, antialiasing=False)
    p_on = preprocess(params, cam, active_sh_degree=1, antialiasing=True)
    vis = np.asarray(p_off.visible)
    ratio = np.asarray(p_on.opacity)[vis] / np.asarray(p_off.opacity)[vis]
    assert np.all(ratio <= 1.0 + 1e-6)          # dilation only shrinks
    assert np.all(ratio >= math.sqrt(AA_DET_CLAMP) - 1e-6)
    # small splats are attenuated more than large ones
    scale = np.exp(np.asarray(params.log_scale).max(axis=1))[vis]
    small, large = ratio[scale < np.median(scale)], ratio[scale >= np.median(scale)]
    assert small.mean() < large.mean()


def test_sh_masking_matches_truncation(rng):
    """The traced-degree SH mask equals evaluating the truncated basis."""
    from gs_tpu.core.sh import eval_sh
    params = random_params(rng, 16, sh_degree=3)
    dirs = np.asarray(rng.normal(size=(16, 3)))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs)
    for deg in range(4):
        masked = mask_sh_rest(params, jnp.int32(deg))
        feats = jnp.concatenate([masked.sh_dc, masked.sh_rest], axis=1)
        full = eval_sh(3, jnp.swapaxes(feats, 1, 2), dirs)
        feats_t = jnp.concatenate([params.sh_dc, params.sh_rest], axis=1)
        trunc = eval_sh(deg, jnp.swapaxes(feats_t, 1, 2)[..., :(deg + 1) ** 2],
                        dirs)
        np.testing.assert_allclose(np.asarray(full), np.asarray(trunc),
                                   atol=1e-6)


@pytest.mark.slow
def test_random_background(rng):
    params = random_params(rng, 32, sh_degree=1)
    state = init_state(params, jnp.ones(32, bool), 1)
    cam = default_camera(64, 48)
    cams = stack_cameras([cam])
    gt = jnp.zeros((3, 48, 64))
    step = make_train_step(OptimizationConfig(random_background=True),
                           ModelConfig(sh_degree=1), PipelineConfig(),
                           RASTER, cams, 1.0, 1)
    _, m1 = step(state, jnp.int32(0), gt, None, None, None, jnp.float32(0.0),
                 jnp.int32(1), jax.random.key(1))
    _, m2 = step(state, jnp.int32(0), gt, None, None, None, jnp.float32(0.0),
                 jnp.int32(1), jax.random.key(2))
    assert float(m1.loss) != float(m2.loss)   # bg differs per key


def test_densify_constants():
    """0.005 opacity prune / 0.1*extent world prune / 0.8N split shrink /
    percent_dense 0.01 / intervals 100/500/15000/3000 (ref: §7.3)."""
    opt = OptimizationConfig()
    assert opt.percent_dense == 0.01
    assert opt.densification_interval == 100
    assert opt.densify_from_iter == 500
    assert opt.densify_until_iter == 15000
    assert opt.opacity_reset_interval == 3000
    assert opt.densify_grad_threshold == 0.0002
    assert opt.lambda_dssim == 0.2
    assert opt.iterations == 30000
    import inspect
    from gs_tpu.models import gaussian_model
    src = inspect.getsource(gaussian_model.densify_and_prune)
    assert "0.8 * 2" in src          # split shrink /(0.8 N), N=2
    assert "0.1 * extent" in src     # world-size prune


def test_mark_visible():
    """markVisible equivalent: frustum z-test matches preprocess culling."""
    import jax.numpy as jnp
    from gs_tpu.core.project import mark_visible
    from utils import default_camera
    cam = default_camera(64, 48)
    xyz = jnp.asarray([[0.0, 0.0, 5.0],    # in front
                       [0.0, 0.0, -2.0],   # behind
                       [0.0, 0.0, 0.1]])   # inside near-cull band
    vis = mark_visible(cam, xyz)
    assert vis.tolist() == [True, False, False]
