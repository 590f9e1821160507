"""Shared test helpers: synthetic scenes and cameras."""
import numpy as np
import jax.numpy as jnp

from gs_tpu.core.camera import make_camera, focal2fov
from gs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
from gs_tpu.core.sh import rgb2sh


def random_params(rng, n, sh_degree=3, spread=1.0, z_center=4.0,
                  scale_range=(-3.5, -1.5), opacity=(0.2, 0.95)):
    """Random Gaussian cloud in front of the default camera (looking +z)."""
    xyz = np.concatenate([
        rng.uniform(-spread, spread, (n, 2)),
        rng.uniform(z_center - spread, z_center + spread, (n, 1)),
    ], axis=1)
    rest_dim = (sh_degree + 1) ** 2 - 1
    dc = rgb2sh(rng.uniform(0.0, 1.0, (n, 1, 3)))
    rest = rng.normal(0.0, 0.02, (n, rest_dim, 3))
    log_scale = rng.uniform(*scale_range, (n, 3))
    quat = rng.normal(0.0, 1.0, (n, 4))
    quat[:, 0] += 2.0
    op = inverse_sigmoid(jnp.asarray(rng.uniform(*opacity, (n, 1))))
    return GaussianParams(
        xyz=jnp.asarray(xyz, jnp.float32),
        sh_dc=jnp.asarray(dc, jnp.float32),
        sh_rest=jnp.asarray(rest, jnp.float32),
        log_scale=jnp.asarray(log_scale, jnp.float32),
        quat=jnp.asarray(quat, jnp.float32),
        logit_opacity=jnp.asarray(op, jnp.float32),
    )


def lpips_random_weights(seed: int):
    """Deterministic random LPIPS/VGG16 weights (PCG64 is reproducible
    across platforms). Shared by the architecture test, the committed tap
    fixture generator, and the fixture regression test — committing only the
    seed keeps the fixture small (full random VGG16 weights are ~59 MB)."""
    from gs_tpu.ops import lpips as L
    rng = np.random.default_rng(seed)
    arrays = {}
    cin = 3
    conv_idx = 0
    for c in L.VGG16_CFG:
        if c == "M":
            continue
        arrays[f"conv{conv_idx}_w"] = rng.normal(
            0, 0.05, (c, cin, 3, 3)).astype(np.float32)
        arrays[f"conv{conv_idx}_b"] = rng.normal(0, 0.05, (c,)).astype(
            np.float32)
        cin = c
        conv_idx += 1
    for i, nc in enumerate(L.TAP_CHANNELS):
        arrays[f"lin{i}"] = np.abs(rng.normal(0, 0.1, (1, nc))).astype(
            np.float32)
    return arrays


def default_camera(width=128, height=96, fov_deg=60.0):
    """Identity-pose camera at origin looking down +z."""
    R = np.eye(3)
    t = np.zeros(3)
    import math
    fovx = math.radians(fov_deg)
    fovy = focal2fov(width / (2 * math.tan(fovx / 2)), height)
    return make_camera(R, t, fovx, fovy, width, height)
