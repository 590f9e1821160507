"""Density-control and optimizer semantics at fixed capacity."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gs_tpu.config import OptimizationConfig
from gs_tpu.core.gaussians import get_opacity, get_scaling, inverse_sigmoid
from gs_tpu.models.gaussian_model import (create_from_pcd, densify_and_prune,
                                          init_state, reset_opacity,
                                          adam_update, group_lrs,
                                          grow_capacity)


def make_state(n=8, capacity=32, opacity=0.5):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (n, 3))
    cols = rng.uniform(0, 1, (n, 3))
    params, alive = create_from_pcd(pts, cols, sh_degree=1, capacity=capacity)
    params = params._replace(
        logit_opacity=jnp.where(alive[:, None],
                                inverse_sigmoid(jnp.full((capacity, 1), opacity)),
                                params.logit_opacity))
    return init_state(params, alive, num_images=3)


@pytest.mark.slow
def test_create_from_pcd():
    st = make_state()
    assert int(st.num_alive) == 8
    assert st.capacity == 32
    scales = np.asarray(get_scaling(st.params))[:8]
    assert (scales > 0).all()
    # isotropic init: all three axes equal (ref: gaussian_model.py:140-141)
    np.testing.assert_allclose(scales[:, 0], scales[:, 1])


def test_densify_clone():
    st = make_state()
    # mark gaussians 0,1 with high grad + tiny scale -> clone
    st = st._replace(
        grad_accum=st.grad_accum.at[:2].set(10.0),
        denom=st.denom.at[:8].set(1.0),
        params=st.params._replace(log_scale=jnp.full_like(st.params.log_scale, -5.0)))
    st2, info = densify_and_prune(st, jax.random.key(0), grad_threshold=0.0002,
                                  min_opacity=0.005, extent=10.0,
                                  percent_dense=0.01, use_size_threshold=False)
    assert int(info.n_cloned) == 2
    assert int(info.n_split) == 0
    assert int(st2.num_alive) == 10
    # clones are exact copies located in free slots
    xyz = np.asarray(st2.params.xyz)
    alive = np.asarray(st2.alive)
    clone_rows = xyz[alive]
    src = np.asarray(st.params.xyz[:2])
    for row in src:
        assert (np.abs(clone_rows - row).sum(1) < 1e-6).sum() == 2  # original + clone
    # stats reset
    assert float(jnp.sum(st2.grad_accum)) == 0.0


def test_densify_split():
    st = make_state()
    # gaussian 0: high grad + big scale -> split into 2, source pruned
    big = np.log(1.0)
    st = st._replace(
        grad_accum=st.grad_accum.at[0].set(10.0),
        denom=st.denom.at[:8].set(1.0),
        params=st.params._replace(
            log_scale=st.params.log_scale.at[0].set(big)))
    st2, info = densify_and_prune(st, jax.random.key(0), grad_threshold=0.0002,
                                  min_opacity=0.005, extent=1.0,
                                  percent_dense=0.01, use_size_threshold=False)
    assert int(info.n_split) == 1
    assert int(st2.num_alive) == 9  # 8 - 1 source + 2 children
    # children have scale / 1.6
    alive2 = np.asarray(st2.alive)
    ls = np.asarray(st2.params.log_scale)
    children = np.isclose(ls[:, 0], big - np.log(1.6), atol=1e-5) & alive2
    assert children.sum() == 2


def test_prune_low_opacity():
    st = make_state(opacity=0.5)
    st = st._replace(params=st.params._replace(
        logit_opacity=st.params.logit_opacity.at[3].set(
            float(inverse_sigmoid(jnp.float32(0.001))))))
    st2, info = densify_and_prune(st, jax.random.key(0), grad_threshold=0.0002,
                                  min_opacity=0.005, extent=10.0,
                                  percent_dense=0.01, use_size_threshold=False)
    assert int(info.n_pruned) == 1
    assert int(st2.num_alive) == 7
    assert not bool(st2.alive[3])


def test_world_size_prune_gated():
    st = make_state()
    st = st._replace(params=st.params._replace(
        log_scale=st.params.log_scale.at[2].set(np.log(5.0))))
    # gate off -> survives
    st2, _ = densify_and_prune(st, jax.random.key(0), grad_threshold=1e9,
                               min_opacity=0.005, extent=1.0,
                               percent_dense=0.01, use_size_threshold=False)
    assert bool(st2.alive[2])
    # gate on -> pruned (scale 5 > 0.1 * extent 1)
    st3, _ = densify_and_prune(st, jax.random.key(0), grad_threshold=1e9,
                               min_opacity=0.005, extent=1.0,
                               percent_dense=0.01, use_size_threshold=True)
    assert not bool(st3.alive[2])


def test_reset_opacity():
    st = make_state(opacity=0.9)
    st = st._replace(m=st.m._replace(logit_opacity=jnp.ones_like(st.m.logit_opacity)))
    st2 = reset_opacity(st)
    op = np.asarray(get_opacity(st2.params))[np.asarray(st2.alive)]
    assert (op <= 0.01 + 1e-6).all()
    assert float(jnp.abs(st2.m.logit_opacity).sum()) == 0.0


def test_adam_moves_params_and_respects_mask():
    st = make_state()
    opt = OptimizationConfig()
    lrs = group_lrs(opt, 100, spatial_lr_scale=1.0)
    g = jax.tree.map(jnp.ones_like, st.params)
    visible = jnp.zeros((st.capacity,), bool).at[0].set(True)
    st2 = adam_update(st, g, lrs, visible_mask=visible)
    dx = np.abs(np.asarray(st2.params.xyz - st.params.xyz)).sum(axis=1)
    assert dx[0] > 0
    assert (dx[1:] == 0).all()
    assert int(st2.step) == 1
    st3 = adam_update(st, g, lrs, visible_mask=None)
    dx3 = np.abs(np.asarray(st3.params.xyz - st.params.xyz)).sum(axis=1)
    assert (dx3 > 0).all()


def test_grow_capacity():
    st = make_state(n=8, capacity=16)
    st2 = grow_capacity(st, 64)
    assert st2.capacity == 64
    assert int(st2.num_alive) == 8
    np.testing.assert_allclose(np.asarray(st2.params.xyz[:16]),
                               np.asarray(st.params.xyz))


@pytest.mark.slow
def test_compact(rng):
    import numpy as np
    import jax.numpy as jnp
    from gs_tpu.models.gaussian_model import compact, create_from_pcd, init_state
    pts = np.asarray(rng.uniform(-1, 1, (100, 3)))
    cols = np.asarray(rng.uniform(0, 1, (100, 3)))
    params, alive = create_from_pcd(pts, cols, sh_degree=1, capacity=512)
    state = init_state(params, alive, 1)
    # kill every other gaussian
    mask = np.zeros(512, bool)
    mask[:100:2] = True
    state = state._replace(alive=jnp.asarray(mask),
                           grad_accum=jnp.arange(512, dtype=jnp.float32))
    out = compact(state, capacity=128)
    assert out.capacity == 128
    assert int(out.num_alive) == 50
    np.testing.assert_allclose(np.asarray(out.params.xyz[:50]),
                               pts[:100:2], atol=1e-6)
    # stats follow their rows
    np.testing.assert_allclose(np.asarray(out.grad_accum[:50]),
                               np.arange(0, 100, 2, dtype=np.float32))
    # padding slots are render-safe
    assert np.all(np.asarray(out.params.logit_opacity[50:]) == -10.0)
