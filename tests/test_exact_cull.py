"""Exact per-(entry, tile) culling: same output, smaller tile ranges.

The cull bbox expansion emits every tile of the rect; the ellipse only
reaches ~a disk inside it. exact_cull marks unreachable (entry, tile) pairs
invalid before the tile sort. The kernel's alpha >= 1/255 skip mask would
zero those entries anyway, so every compositing TERM is identical — but
removing zero entries re-groups the survivors into different 128-entry
chunks, so the triangular-matmul cumsum and the cross-chunk partial sums
associate differently: outputs agree to f32 ULPs, not bitwise. The
tolerances here are a few ULPs of the largest value.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_tpu.render import render
from utils import default_camera, random_params

from gs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
from gs_tpu.core.sh import rgb2sh


def _aniso_params(rng, n):
    """Big, elongated, rotated gaussians — worst case for bbox corners."""
    xyz = np.concatenate([
        rng.uniform(-1.5, 1.5, (n, 2)),
        rng.uniform(3.0, 6.0, (n, 1)),
    ], axis=1).astype(np.float32)
    dc = rgb2sh(rng.uniform(0, 1, (n, 1, 3)))
    log_scale = np.stack([
        rng.uniform(-1.2, -0.2, n),       # long axis
        rng.uniform(-3.5, -2.5, n),       # thin axis
        rng.uniform(-3.0, -1.0, n),
    ], axis=1)
    quat = rng.normal(0, 1, (n, 4))       # random orientation
    op = inverse_sigmoid(jnp.asarray(rng.uniform(0.3, 0.95, (n, 1))))
    return GaussianParams(
        xyz=jnp.asarray(xyz),
        sh_dc=jnp.asarray(dc, jnp.float32),
        sh_rest=jnp.asarray(rng.normal(0, 0.02, (n, 15, 3)), jnp.float32),
        log_scale=jnp.asarray(log_scale, jnp.float32),
        quat=jnp.asarray(quat, jnp.float32),
        logit_opacity=jnp.asarray(op, jnp.float32))


def _assert_ulp_close(a, b, ulps=32.0):
    """|a-b| within a few ULPs of the array's own scale (re-chunking only
    reassociates f32 sums; any real term difference would be ~1e-3+)."""
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1e-6, float(np.max(np.abs(a))))
    tol = ulps * scale * 1.1920929e-07
    err = float(np.max(np.abs(a - b)))
    assert err <= tol, f"max err {err} > {tol} (scale {scale})"


def _assert_grads_in_envelope(g_cull, g_nocull, g_oracle):
    """Gradient sums reassociate over thousands of repositioned entries, so
    a fixed ULP bound on cull-vs-nocull is arbitrary; the meaningful
    statement is distance to TRUTH: the culled gradient must sit no further
    from the independently computed binned-backend gradient than ~the
    uncalled variant's own numerical distance to it (2x slack), i.e. the
    cull changes nothing beyond summation order."""
    for a, b, c in zip(jax.tree.leaves(g_cull), jax.tree.leaves(g_nocull),
                       jax.tree.leaves(g_oracle)):
        a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
        scale = max(1e-6, float(np.max(np.abs(b))))
        envelope = max(2.0 * float(np.max(np.abs(b - c))),
                       64 * scale * 1.1920929e-07)
        err = float(np.max(np.abs(a - c)))
        assert err <= envelope, \
            f"|cull-oracle| {err} exceeds envelope {envelope}"


def _loss_and_len(params, cam, cull, backend="pallas_interpret", **kw):
    def loss(p):
        out = render(cam, p, jnp.zeros(3), active_sh_degree=2,
                     backend=backend, exact_cull=cull, **kw)
        return (jnp.sum(out.image ** 2) + jnp.sum(out.invdepth ** 2),
                (out.image, out.invdepth, out.max_tile_len))
    (l, aux), g = jax.value_and_grad(loss, has_aux=True)(params)
    return l, aux, g


@pytest.mark.parametrize("maker,seed", [(_aniso_params, 0),
                                        (random_params, 4)])
@pytest.mark.slow
def test_exact_cull_identical_output(maker, seed):
    rng = np.random.default_rng(seed)
    params = maker(rng, 150)
    cam = default_camera(128, 96)
    kw = dict(dup_capacity=1 << 14, max_per_tile=2048)
    l0, (img0, inv0, ml0), g0 = _loss_and_len(params, cam, False, **kw)
    l1, (img1, inv1, ml1), g1 = _loss_and_len(params, cam, True, **kw)
    _assert_ulp_close(img0, img1)
    _assert_ulp_close(inv0, inv1)
    assert abs(float(l0) - float(l1)) <= 1e-5 * max(1.0, abs(float(l0)))
    _, _, gb = _loss_and_len(params, cam, False, backend="binned", **kw)
    _assert_grads_in_envelope(g1, g0, gb)
    # anisotropic scene: the corner cull must bite
    assert int(ml1) <= int(ml0)
    if maker is _aniso_params:
        assert int(ml1) < int(ml0), \
            f"exact_cull removed nothing (max_tile_len {int(ml0)})"


@pytest.mark.slow
def test_exact_cull_composes_with_pallas_expand():
    rng = np.random.default_rng(9)
    params = _aniso_params(rng, 120)
    cam = default_camera(96, 64)
    kw = dict(dup_capacity=1 << 13, max_per_tile=1024)
    l0, (img0, _, _), g0 = _loss_and_len(params, cam, False, **kw)
    l1, (img1, _, _), g1 = _loss_and_len(params, cam, True,
                                         pallas_expand=True, **kw)
    _assert_ulp_close(img0, img1)
    assert abs(float(l0) - float(l1)) <= 1e-5 * max(1.0, abs(float(l0)))
    _, _, gb = _loss_and_len(params, cam, False, backend="binned", **kw)
    _assert_grads_in_envelope(g1, g0, gb)
