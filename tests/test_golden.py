"""Golden regression fixtures: committed oracle renders + parameter grads.

All backends are compared against the COMMITTED arrays, not against each
other — a silent drift in the shared math (core/project.py, core/sh.py,
ops/composite.py) changes every backend identically and would pass the
backend-vs-backend suite; it cannot pass this one.

Regenerate (deliberately, after an intended math change):
    JAX_PLATFORMS=cpu python tests/golden/gen_golden.py
"""
import math
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gs_tpu.core.camera import make_camera, focal2fov
from gs_tpu.core.gaussians import GaussianParams
from gs_tpu.render import render
from utils import default_camera

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_small.npz")
W, H = 128, 96


@pytest.fixture(scope="module")
def golden():
    data = np.load(GOLDEN)
    params = GaussianParams(**{k: jnp.asarray(data[f"p_{k}"])
                               for k in GaussianParams._fields})
    return data, params


def _cameras():
    ang = math.radians(8.0)
    R = np.array([[math.cos(ang), 0, math.sin(ang)],
                  [0, 1, 0],
                  [-math.sin(ang), 0, math.cos(ang)]])
    t = np.array([0.3, -0.1, 0.2])
    fovx = math.radians(60.0)
    fovy = focal2fov(W / (2 * math.tan(fovx / 2)), H)
    return [default_camera(W, H),
            make_camera(R, t, fovx, fovy, W, H)]


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["depthwise", "binned", "pallas_interpret"])
@pytest.mark.parametrize("ci", [0, 1])
def test_golden_values_and_grads(golden, backend, ci):
    data, params = golden
    cam = _cameras()[ci]
    bg = jnp.zeros(3) if ci == 0 else jnp.ones(3)
    kwargs = dict(active_sh_degree=3, backend=backend,
                  antialiasing=(ci == 1))
    if backend != "depthwise":
        kwargs.update(dup_capacity=1 << 13, max_per_tile=512)

    def loss_fn(p):
        o = render(cam, p, bg, **kwargs)
        return (jnp.mean(jnp.abs(o.image - 0.5))
                + 0.1 * jnp.mean(o.invdepth)), o

    (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(o.image), data[f"img_{ci}"],
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(o.invdepth), data[f"invd_{ci}"],
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(o.final_T), data[f"finalT_{ci}"],
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(float(loss), float(data[f"loss_{ci}"]),
                               atol=1e-6)
    for k in GaussianParams._fields:
        ref = data[f"g{ci}_{k}"]
        got = np.asarray(getattr(grads, k))
        scale = max(np.abs(ref).max(), 1e-3)
        np.testing.assert_allclose(
            got, ref, atol=2e-4 * scale, rtol=0,
            err_msg=f"grad mismatch: {k} (backend={backend}, cam={ci})")
