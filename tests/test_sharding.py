"""Multi-chip sharding: the gauss-sharded train step must match the
single-device step numerically, and densify must run under GSPMD."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gs_tpu.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                           RasterConfig)
from gs_tpu.core.camera import stack_cameras
from gs_tpu.models.gaussian_model import (create_from_pcd, densify_and_prune,
                                          init_state)
from gs_tpu.parallel.mesh import make_mesh, shard_state, state_shardings
from gs_tpu.train.step import make_train_step

from utils import default_camera, random_params


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(2)
    pts = np.concatenate([rng.uniform(-1, 1, (100, 2)),
                          rng.uniform(3, 5, (100, 1))], axis=1)
    cols = rng.uniform(0, 1, (100, 3))
    params, alive = create_from_pcd(pts, cols, sh_degree=2, capacity=256)
    state = init_state(params, alive, num_images=3)
    cam = default_camera(64, 48)
    cams = stack_cameras([cam, cam, cam])
    gt = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (3, 48, 64)),
                     jnp.float32)
    opt = OptimizationConfig(iterations=100, position_lr_max_steps=100)
    raster = RasterConfig(backend="binned", dup_capacity=1 << 13,
                          max_per_tile=256, chunk=64)
    step = make_train_step(opt, ModelConfig(), PipelineConfig(), raster,
                           cams, spatial_lr_scale=2.0, max_sh_degree=2)
    return state, step, gt


@pytest.mark.slow
def test_sharded_step_matches_single(setup):
    state, step, gt = setup
    assert len(jax.devices()) >= 8
    key = jax.random.key(0)
    args = (jnp.int32(1), gt, None, None, None, jnp.float32(0.0),
            jnp.int32(1), key)

    s_single, m_single = step(state, *args)

    mesh = make_mesh(8)
    sharded = shard_state(state, mesh)
    shardings = state_shardings(state, mesh)
    sharded_step = jax.jit(step.__wrapped__,
                           in_shardings=(shardings,) + (None,) * 8,
                           out_shardings=(shardings, None))
    s_shard, m_shard = sharded_step(sharded, *args)

    np.testing.assert_allclose(float(m_single.loss), float(m_shard.loss),
                               rtol=1e-5)
    for name, a, b in zip(s_single.params._fields, s_single.params,
                          s_shard.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=f"param mismatch: {name}")


def test_sharded_densify_matches_single(setup):
    state, step, gt = setup
    # give the stats something to chew on
    state = state._replace(
        grad_accum=jnp.abs(jnp.asarray(
            np.random.default_rng(3).normal(0, 1e-3, (state.capacity,)),
            jnp.float32)),
        denom=jnp.ones((state.capacity,), jnp.float32))
    key = jax.random.key(7)
    kwargs = dict(grad_threshold=2e-4, min_opacity=0.005, extent=2.0,
                  percent_dense=0.01, use_size_threshold=jnp.bool_(False))

    s1, info1 = jax.jit(lambda s, k: densify_and_prune(s, k, **kwargs))(
        state, key)

    mesh = make_mesh(8)
    shardings = state_shardings(state, mesh)
    fn = jax.jit(lambda s, k: densify_and_prune(s, k, **kwargs),
                 in_shardings=(shardings, None),
                 out_shardings=(shardings, None))
    s2, info2 = fn(shard_state(state, mesh), key)

    assert int(info1.n_alive) == int(info2.n_alive)
    np.testing.assert_allclose(np.asarray(s1.params.xyz),
                               np.asarray(s2.params.xyz), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s1.alive), np.asarray(s2.alive))
