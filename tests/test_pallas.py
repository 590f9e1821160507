"""Pallas rasterizer vs jnp oracle: forward values and parameter gradients.

Runs the kernel in interpret mode (CPU); the same code path compiles for TPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gs_tpu.core.project import preprocess
from gs_tpu.ops.binning import bin_gaussians
from gs_tpu.render import render

from utils import default_camera, random_params


def _render(params, cam, bg, backend, alive=None, **kw):
    return render(cam, params, bg, active_sh_degree=2, backend=backend,
                  alive=alive, dup_capacity=1 << 14, max_per_tile=256,
                  chunk=64, **kw)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    params = random_params(rng, 300, sh_degree=2)
    cam = default_camera(64, 48)
    bg = jnp.asarray([0.2, 0.5, 0.8])
    return params, cam, bg


def test_binning_ranges(scene):
    params, cam, bg = scene
    proj = preprocess(params, cam, active_sh_degree=2)
    bins = bin_gaussians(proj, cam.width, cam.height, 16, 16, 1 << 14)
    assert not bool(bins.overflow)
    start = np.asarray(bins.tile_start)
    end = np.asarray(bins.tile_end)
    assert np.all(end >= start)
    assert (end - start).sum() == int(bins.num_duplicates)
    # entries within a tile must be depth-ordered
    gid = np.asarray(bins.entry_gid)
    depth = np.asarray(proj.depth)
    t0, t1 = start[0], end[0]
    for t in range(len(start)):
        d = depth[gid[start[t]:end[t]]]
        assert np.all(np.diff(d) >= 0), f"tile {t} not depth-sorted"


def test_pallas_forward_matches_jnp(scene):
    params, cam, bg = scene
    out_jnp = jax.jit(lambda p: _render(p, cam, bg, "binned"))(params)
    out_pl = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret"))(params)
    assert not bool(out_pl.overflow)
    np.testing.assert_allclose(np.asarray(out_pl.image),
                               np.asarray(out_jnp.image), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pl.invdepth),
                               np.asarray(out_jnp.invdepth), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pl.final_T),
                               np.asarray(out_jnp.final_T), atol=2e-5)


def test_pallas_grads_match_jnp(scene):
    params, cam, bg = scene
    gt = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (3, cam.height, cam.width)), jnp.float32)

    def loss(p, backend):
        out = _render(p, cam, bg, backend)
        return (jnp.mean(jnp.abs(out.image - gt))
                + 0.1 * jnp.mean(out.invdepth)
                + 0.05 * jnp.mean(out.final_T))

    g_jnp = jax.jit(jax.grad(lambda p: loss(p, "binned")))(params)
    g_pl = jax.jit(jax.grad(lambda p: loss(p, "pallas_interpret")))(params)
    for name, a, b in zip(g_jnp._fields, g_jnp, g_pl):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=3e-4 * scale, rtol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_pallas_empty_scene(scene):
    params, cam, bg = scene
    # everything behind the camera -> pure background, finalT = 1
    p2 = params._replace(xyz=params.xyz * jnp.array([1.0, 1.0, -1.0]))
    out = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret"))(p2)
    np.testing.assert_allclose(
        np.asarray(out.image),
        np.broadcast_to(np.asarray(bg)[:, None, None],
                        (3, cam.height, cam.width)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.final_T), 1.0, atol=1e-6)


def test_pallas_alive_mask(scene):
    params, cam, bg = scene
    n = params.xyz.shape[0]
    alive = jnp.arange(n) < (n // 2)
    out_jnp = jax.jit(lambda p: _render(p, cam, bg, "binned", alive=alive))(params)
    out_pl = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret",
                                       alive=alive))(params)
    np.testing.assert_allclose(np.asarray(out_pl.image),
                               np.asarray(out_jnp.image), atol=2e-5)
