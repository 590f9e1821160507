"""pallas_fold: the streaming one-hot gradient-fold kernel.

The fold reduces per-entry cotangents to per-gaussian packet gradients
(ref CUDA analogue: the atomicAdd accumulation in the rasterizer backward,
SURVEY.md §2.3-N1). fold_rows must match segment_sum_runend exactly up to
f32 summation order — the one-hot contraction at HIGHEST precision adds
entries in a different association than the cumsum difference.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_tpu.ops.fold_pallas import ROWS, fold_rows
from gs_tpu.ops.segment import segment_sum_runend
from gs_tpu.render import render
from utils import default_camera, random_params


@pytest.mark.parametrize("n,dcap,seed", [(300, 2048, 0), (7, 128, 1),
                                         (1000, 8192, 2)])
def test_fold_rows_matches_runend(n, dcap, seed):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(3.0, n).astype(np.int32)
    counts[rng.integers(0, n, n // 5)] = 0          # empty runs
    counts[min(5, n - 1)] = min(600, dcap // 3)     # one huge run
    total = int(counts.sum())
    assert total <= dcap
    gid = np.concatenate([np.repeat(np.arange(n, dtype=np.int32), counts),
                          np.full(dcap - total, n, np.int32)])
    cols = rng.standard_normal((10, dcap)).astype(np.float32)
    cols[:, total:] = 0.0                           # sentinel cotangents
    perm = rng.permutation(dcap)                    # arrive tile-ordered
    gid_s, cols_s = gid[perm], cols[:, perm]

    ref = segment_sum_runend(tuple(jnp.asarray(c) for c in cols_s),
                             jnp.asarray(gid_s), jnp.asarray(counts), n)
    ops = jax.lax.sort((jnp.asarray(gid_s),)
                       + tuple(jnp.asarray(c) for c in cols_s),
                       dimension=0, is_stable=False, num_keys=1)
    data = jnp.concatenate([jnp.stack(ops[1:], axis=0),
                            jnp.zeros((ROWS - 10, dcap), jnp.float32)],
                           axis=0)
    cj = jnp.asarray(counts)
    out = fold_rows(data, jnp.cumsum(cj) - cj, cj, n, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:10].T), np.asarray(ref),
                               rtol=0, atol=1e-4)


def _grads(params, cam, **kw):
    def loss(p):
        out = render(cam, p, jnp.zeros(3), active_sh_degree=2,
                     backend="pallas_interpret", dup_capacity=1 << 13,
                     max_per_tile=1024, **kw)
        return jnp.sum(out.image ** 2) + jnp.sum(out.invdepth ** 2)
    return jax.value_and_grad(loss)(params)


def test_render_pallas_fold_grad_parity():
    rng = np.random.default_rng(3)
    params = random_params(rng, 150)
    cam = default_camera(96, 64)
    l0, g0 = _grads(params, cam, pallas_fold=False)
    l1, g1 = _grads(params, cam, pallas_fold=True)
    assert float(l0) == float(l1)                   # forward identical
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-6, float(np.max(np.abs(a))))
        assert float(np.max(np.abs(a - b))) <= 256 * scale * 1.19e-07


def test_render_pallas_fold_composes_with_levers():
    rng = np.random.default_rng(4)
    params = random_params(rng, 120)
    cam = default_camera(96, 64)
    l0, g0 = _grads(params, cam)
    l1, g1 = _grads(params, cam, pallas_fold=True, pallas_expand=True,
                    exact_cull=True)
    assert abs(float(l0) - float(l1)) <= 1e-5 * max(1.0, abs(float(l0)))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-6, float(np.max(np.abs(a))))
        assert float(np.max(np.abs(a - b))) <= 1e-3 * scale
