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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_pallas_alive_mask(scene):
    params, cam, bg = scene
    n = params.xyz.shape[0]
    alive = jnp.arange(n) < (n // 2)
    out_jnp = jax.jit(lambda p: _render(p, cam, bg, "binned", alive=alive))(params)
    out_pl = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret",
                                       alive=alive))(params)
    np.testing.assert_allclose(np.asarray(out_pl.image),
                               np.asarray(out_jnp.image), atol=2e-5)


@pytest.mark.slow
def test_pallas_bf16_features_parity(rng):
    """bf16 rgb/invdepth streaming: parity envelope vs the f32 pipeline.

    Quantization is bf16 (8 mantissa bits, ~0.4% rel) on the color/invdepth
    payload only; geometry stays f32 and the backward treats the cast as
    identity (straight-through). Documented tolerances: image/invdepth
    within 1% absolute, positional grads (xyz/scale/quat/opacity) within
    5% of the f32 run's max-magnitude (isolated small-gradient entries feel
    the color quantization hardest), color grads (sh) within 2%."""
    import jax
    import jax.numpy as jnp
    from gs_tpu.render import render
    from utils import default_camera, random_params

    params = random_params(rng, 300)
    cam = default_camera(96, 64)
    bg = jnp.asarray([0.2, 0.3, 0.4])
    kw = dict(active_sh_degree=3, backend="pallas_interpret",
              dup_capacity=1 << 12, max_per_tile=512)

    def loss(p, bf16):
        o = render(cam, p, bg, bf16_features=bf16, **kw)
        return (jnp.mean(jnp.abs(o.image - 0.5))
                + 0.1 * jnp.mean(o.invdepth)), o

    (l32, o32), g32 = jax.value_and_grad(
        lambda p: loss(p, False), has_aux=True)(params)
    (l16, o16), g16 = jax.value_and_grad(
        lambda p: loss(p, True), has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(o16.image), np.asarray(o32.image),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(o16.invdepth),
                               np.asarray(o32.invdepth), atol=1e-2)
    assert abs(float(l16) - float(l32)) < 5e-3
    for name in g32._fields:
        a = np.asarray(getattr(g32, name))
        b = np.asarray(getattr(g16, name))
        s = max(np.abs(a).max(), 1e-6)
        tol = 2e-2 * s if name.startswith("sh") else 5e-2 * s
        np.testing.assert_allclose(b, a, atol=tol,
                                   err_msg=f"bf16 grad drift: {name}")


def test_fwd_only_matches_and_grad_raises(scene):
    """fwd_only drops the entry gids from the tile sort (they feed only the
    backward fold). A stable sort on identical keys yields the identical
    permutation, so the image must be BITWISE unchanged — and any gradient
    through a fwd_only render must raise at trace time, never silently
    return garbage."""
    params, cam, bg = scene
    ref = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret"))(params)
    out = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret",
                                    fwd_only=True, exact_cull=True,
                                    pallas_expand=True))(params)
    ref_cull = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret",
                                         exact_cull=True,
                                         pallas_expand=True))(params)
    np.testing.assert_array_equal(np.asarray(out.image),
                                  np.asarray(ref_cull.image))
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=3e-6)
    with pytest.raises(ValueError, match="fwd_only"):
        jax.grad(lambda p: jnp.sum(
            _render(p, cam, bg, "pallas_interpret",
                    fwd_only=True).image))(params)


def test_bf16_pairs_pack_outside_expand_matmul(scene):
    """bf16_features x pallas_expand: the packed bf16-pair columns must be
    byte-identical to the repeat-expansion branch's. Regression for a latent
    TPU corruption: packing BEFORE the expansion fed bit-cast pairs through
    the one-hot dot_general, and TPU float arithmetic flushes denormal
    patterns (high half ~0, low half nonzero) to zero — e.g. any packet with
    g == 0, r != 0 would lose its red channel. The fix packs post-expansion
    (binning.py), so packed columns only ever ride the sort. Interpret mode
    cannot reproduce the flush (CPU keeps denormals) — this asserts the
    structural property instead: both branches produce identical streams,
    and a zero-green packet keeps its red."""
    params, cam, bg = scene
    # force the hazardous pattern: green exactly 0 on every gaussian
    sh_dc = np.asarray(params.sh_dc).copy()
    sh_dc[:, :, 1] = -0.5 / 0.28209479177387814   # SH DC for rgb 0 pre-clamp
    p0 = params._replace(sh_dc=jnp.asarray(sh_dc))
    o_rep = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret",
                                      bf16_features=True))(p0)
    o_exp = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret",
                                      bf16_features=True,
                                      pallas_expand=True))(p0)
    np.testing.assert_array_equal(np.asarray(o_rep.image),
                                  np.asarray(o_exp.image))
    # red must survive zero green: compare against the f32 pipeline
    o_f32 = jax.jit(lambda p: _render(p, cam, bg, "pallas_interpret"))(p0)
    np.testing.assert_allclose(np.asarray(o_exp.image),
                               np.asarray(o_f32.image), atol=1e-2)
