"""bwd_skip_read: the backward kernel's d-chunk read-elision.

A d-chunk read is needed only for a tile's HEAD chunk when it starts
mid-chunk (earlier tiles wrote there); every other chunk is a first write
over the aliased-zeros buffer. Pure DMA-schedule change — gradients must be
BITWISE identical, including under early termination and shared boundary
chunks.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_tpu.render import render
from utils import default_camera, random_params


def _grads(params, cam, skip, **kw):
    def loss(p):
        out = render(cam, p, jnp.zeros(3), active_sh_degree=2,
                     backend="pallas_interpret", bwd_skip_read=skip, **kw)
        return jnp.sum(out.image ** 2) + jnp.sum(out.invdepth ** 2)
    return jax.value_and_grad(loss)(params)


@pytest.mark.parametrize("seed,n,mpt", [(7, 200, 2048), (1, 150, 256)])
def test_skip_read_bitwise_identical(seed, n, mpt):
    rng = np.random.default_rng(seed)
    params = random_params(rng, n)
    cam = default_camera(128, 96)
    kw = dict(dup_capacity=1 << 14, max_per_tile=mpt, exact_cull=True,
              pallas_expand=True, pallas_fold=True)
    l0, g0 = _grads(params, cam, False, **kw)
    l1, g1 = _grads(params, cam, True, **kw)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_skip_read_opaque_early_termination():
    """Dense opaque splats drive per-tile early termination (kproc <
    nchunks) — the skipped tail chunks of one tile may be another tile's
    head; reads must still happen exactly where needed."""
    rng = np.random.default_rng(3)
    params = random_params(rng, 300)
    params = params._replace(
        logit_opacity=jnp.full_like(params.logit_opacity, 6.0),
        log_scale=params.log_scale + 1.0)
    cam = default_camera(96, 64)
    kw = dict(dup_capacity=1 << 14, max_per_tile=4096)
    l0, g0 = _grads(params, cam, False, **kw)
    l1, g1 = _grads(params, cam, True, **kw)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0
