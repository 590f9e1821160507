"""Channel-major packed parameter layout: parity with the reference-shaped
pytree path (values, gradients, full training-step equivalence)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_tpu.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                           RasterConfig)
from gs_tpu.core.camera import stack_cameras
from gs_tpu.core.packed import (all_channels, layout, mask_sh_rows,
                                pack_params, unpack_params)
from gs_tpu.core.project import preprocess, preprocess_packed
from gs_tpu.models.gaussian_model import (densify_and_prune, init_state,
                                          reset_opacity)
from gs_tpu.models.packed_state import (adam_update_packed,
                                        densify_and_prune_packed,
                                        grow_capacity_packed, pack_state,
                                        reset_opacity_packed, unpack_state)
from gs_tpu.train.step import make_train_step, mask_sh_rest
from tests.utils import random_params, default_camera


def _scene(rng, n=80, cap=128):
    p = random_params(rng, n)
    from gs_tpu.models.gaussian_model import create_from_pcd  # noqa: F401
    pad = cap - n

    def padz(x):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg)

    p = jax.tree.map(padz, p)
    p = p._replace(quat=p.quat.at[n:, 0].set(1.0),
                   log_scale=p.log_scale.at[n:].set(-10.0),
                   logit_opacity=p.logit_opacity.at[n:].set(-10.0))
    alive = jnp.arange(cap) < n
    return p, alive


@pytest.mark.slow
@pytest.mark.parametrize("deg", [0, 1, 3])
def test_pack_roundtrip(rng, deg):
    p = random_params(rng, 40, sh_degree=deg)
    u = unpack_params(pack_params(p), deg)
    for f, a, b in zip(p._fields, p, u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)


def test_preprocess_packed_matches(rng):
    params, alive = _scene(rng)
    cam = default_camera()
    pk = pack_params(params)
    am = np.asarray(alive)
    p1 = preprocess(params, cam, active_sh_degree=3, alive=alive,
                    antialiasing=True)
    p2 = preprocess_packed(pk, cam, sh_degree=3, active_sh_degree=3,
                           alive=alive, antialiasing=True)
    for f, a, b in zip(p1._fields, p1, p2):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a, np.float32)[am],
                                   np.asarray(b, np.float32)[am],
                                   atol=1e-5, rtol=1e-5, err_msg=f)


@pytest.mark.slow
def test_preprocess_packed_grads_match(rng):
    params, alive = _scene(rng)
    cam = default_camera()
    pk = pack_params(params)
    am = np.asarray(alive)

    def stats(pr):
        m = alive
        return (jnp.sum(jnp.where(m[:, None], pr.rgb, 0) ** 2)
                + jnp.sum(jnp.where(m[:, None], pr.conic, 0) ** 2) * 1e-4
                + jnp.sum(jnp.where(m[:, None], pr.mean2d, 0) ** 2) * 1e-4
                + jnp.sum(jnp.where(m, pr.opacity, 0) ** 2))

    g1 = jax.grad(lambda p: stats(preprocess(
        p, cam, active_sh_degree=3, alive=alive, antialiasing=True)))(params)
    g2 = jax.grad(lambda q: stats(preprocess_packed(
        q, cam, sh_degree=3, active_sh_degree=3, alive=alive,
        antialiasing=True)))(pk)
    g2u = unpack_params(g2, 3)
    for f, a, b in zip(g1._fields, g1, g2u):
        np.testing.assert_allclose(np.asarray(a)[am], np.asarray(b)[am],
                                   atol=1e-4, rtol=1e-3, err_msg=f)


def test_mask_sh_rows_matches_mask_sh_rest(rng):
    params, _ = _scene(rng)
    lay = layout(3)
    for deg in range(4):
        a = pack_params(mask_sh_rest(params, jnp.int32(deg)))
        b = mask_sh_rows(pack_params(params), lay, jnp.int32(deg))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


@pytest.mark.slow
def test_train_step_packed_equals_tree(rng):
    """Full step (render, loss, grads, Adam, densify stats) must produce the
    same state whether it runs on the pytree or the packed layout."""
    W, H = 64, 48
    cam = default_camera(W, H)
    cams = stack_cameras([cam])
    params, alive = _scene(rng, n=60, cap=64)
    state = init_state(params, alive, num_images=1)
    gt_scene = random_params(rng, 50)
    from gs_tpu.render import render
    gt = render(cam, gt_scene, jnp.zeros(3), active_sh_degree=3,
                backend="binned", dup_capacity=1 << 13,
                max_per_tile=256).image

    opt = OptimizationConfig(iterations=100, position_lr_max_steps=100)
    raster = RasterConfig(backend="binned", dup_capacity=1 << 13,
                          max_per_tile=256, chunk=64)
    mk = dict(opt=opt, model_cfg=ModelConfig(), pipe=PipelineConfig(),
              raster=raster, cams=cams, spatial_lr_scale=1.0,
              max_sh_degree=3)
    step_t = make_train_step(**mk)
    step_p = make_train_step(**mk, packed=True)

    st_t = state
    st_p = pack_state(state)
    key = jax.random.key(3)
    for it in range(1, 4):
        key, sub = jax.random.split(key)
        args = (jnp.int32(0), gt, None, None, None, jnp.float32(0.0),
                jnp.int32(it), sub)
        st_t, m_t = step_t(st_t, *args)
        st_p, m_p = step_p(st_p, *args)
        np.testing.assert_allclose(float(m_t.loss), float(m_p.loss),
                                   rtol=1e-5)
    un = unpack_state(st_p)
    for f, a, b in zip(st_t._fields, st_t, un):
        jax.tree.map(lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-5, rtol=1e-3,
            err_msg=f), a, b)


def test_densify_reset_grow_packed_equal_unpacked(rng):
    params, alive = _scene(rng, n=60, cap=128)
    state = init_state(params, alive, num_images=1)
    # seed densification stats so clones/splits actually happen
    state = state._replace(
        grad_accum=jnp.asarray(rng.uniform(0, 1e-2, (128,)), jnp.float32),
        denom=jnp.ones((128,), jnp.float32))
    ps = pack_state(state)
    kw = dict(grad_threshold=2e-3, min_opacity=0.005, extent=2.0,
              percent_dense=0.01, use_size_threshold=True)
    key = jax.random.key(9)
    s1, i1 = densify_and_prune(state, key, **kw)
    s2, i2 = densify_and_prune_packed(ps, key, **kw)
    assert int(i1.n_alive) == int(i2.n_alive)
    s2u = unpack_state(s2)
    for f, a, b in zip(s1._fields, s1, s2u):
        jax.tree.map(lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6, err_msg=f), a, b)

    r1 = reset_opacity(s1)
    r2 = unpack_state(reset_opacity_packed(s2))
    np.testing.assert_allclose(np.asarray(r1.params.logit_opacity),
                               np.asarray(r2.params.logit_opacity), atol=1e-5)

    g2 = grow_capacity_packed(pack_state(r1), 256)
    assert g2.capacity == 256
    gu = unpack_state(g2)
    np.testing.assert_allclose(np.asarray(gu.params.xyz[:128]),
                               np.asarray(r1.params.xyz), atol=0)
    assert np.all(np.asarray(gu.params.quat[128:, 0]) == 1.0)


@pytest.mark.slow
def test_trainer_packed_runs(rng):
    """Trainer with packed default: a few steps + a densify boundary + eval."""
    from gs_tpu.data.camera_utils import LoadedCamera
    from gs_tpu.data.dataset_readers import CameraInfo
    from gs_tpu.train.loop import Trainer
    W, H = 64, 48
    cam = default_camera(W, H)
    img = np.asarray(rng.uniform(0, 1, (3, H, W)), np.float32)
    info = CameraInfo(uid=0, R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=0.8,
                      image_path="", image_name="t", width=W, height=H)
    lc = LoadedCamera(camera=cam, info=info, image=img,
                      alpha_mask=np.ones((1, H, W), np.float32),
                      invdepth=None, depth_mask=None, depth_reliable=False)
    pts = rng.normal(0, 0.8, (64, 3)) + np.array([0, 0, 4.0])
    cols = rng.uniform(0, 1, (64, 3))
    opt = OptimizationConfig(iterations=30, densify_from_iter=5,
                             densification_interval=10,
                             opacity_reset_interval=20,
                             densify_until_iter=25,
                             position_lr_max_steps=30)
    raster = RasterConfig(backend="binned", dup_capacity=1 << 13,
                          max_per_tile=256, chunk=64)
    tr = Trainer([lc], (pts, cols, None), spatial_lr_scale=1.0,
                 model_cfg=ModelConfig(), opt=opt, pipe=PipelineConfig(),
                 raster=raster, initial_capacity=128)
    assert tr.packed
    tr.train(iterations=25)
    assert np.isfinite(tr.ema_loss)
    r = tr.evaluate([lc])
    assert np.isfinite(r["psnr"])


@pytest.mark.slow
def test_overflow_zeroes_raster_grads(rng):
    """Truncated (overflowed) binning must produce ZERO packet gradients, not
    mis-routed ones (advisor r2: run-end windows misalign past the cut)."""
    params, alive = _scene(rng, n=60, cap=64)
    cam = default_camera()
    from gs_tpu.render import render

    def loss(p, dup_cap):
        out = render(cam, p, jnp.zeros(3), active_sh_degree=3,
                     backend="pallas_interpret", alive=alive,
                     dup_capacity=dup_cap, max_per_tile=256, chunk=32)
        return jnp.mean(out.image), out.overflow

    am = np.asarray(alive)   # dead padded rows carry NaN grads by design
    (l_ok, ov_ok), g_ok = jax.value_and_grad(
        lambda p: loss(p, 1 << 13), has_aux=True)(params)
    assert not bool(ov_ok)
    assert float(np.abs(np.asarray(g_ok.xyz)[am]).max()) > 0

    (l_tr, ov_tr), g_tr = jax.value_and_grad(
        lambda p: loss(p, 128), has_aux=True)(params)  # way too small
    assert bool(ov_tr)
    # all raster-path gradients are conservative zeros under truncation
    assert float(np.abs(np.asarray(g_tr.xyz)[am]).max()) == 0.0
    assert float(np.abs(np.asarray(g_tr.sh_dc)[am]).max()) == 0.0
