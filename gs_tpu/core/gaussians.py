"""Gaussian parameter pytree and activations.

The parameter store mirrors the reference's six parameter groups
(ref: scene/gaussian_model.py:53-58) but as a capacity-padded pytree with an
explicit alive mask so every training-step shape is static under jit
(densify/prune reallocate tensors in the reference; here they write into
padded slots — see gs_tpu/models/gaussian_model.py).

Activations (ref: scene/gaussian_model.py:31-47):
  scaling  = exp(log_scale)
  opacity  = sigmoid(logit)
  rotation = L2-normalized quaternion (w, x, y, z)
  cov3d    = R S S^T R^T packed to the 6 upper-triangle entries
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GaussianParams(NamedTuple):
    """Trainable parameters, all arrays padded to a static capacity C."""
    xyz: jnp.ndarray        # [C, 3]
    sh_dc: jnp.ndarray      # [C, 1, 3]  DC SH coefficients (reference f_dc layout)
    sh_rest: jnp.ndarray    # [C, (d+1)^2-1, 3]
    log_scale: jnp.ndarray  # [C, 3]
    quat: jnp.ndarray       # [C, 4]  (w, x, y, z) unnormalized
    logit_opacity: jnp.ndarray  # [C, 1]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round((self.sh_rest.shape[1] + 1) ** 0.5)) - 1


def inverse_sigmoid(x):
    # ref: utils/general_utils.py:17-18
    return jnp.log(x / (1.0 - x))


def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.log_scale)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.logit_opacity)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    return normalize_quat(p.quat)


def get_features(p: GaussianParams) -> jnp.ndarray:
    """[C, (d+1)^2, 3] concatenated SH features (ref: gaussian_model.py:113-117)."""
    return jnp.concatenate([p.sh_dc, p.sh_rest], axis=1)


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / norm


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3]; normalizes first.

    ref: utils/general_utils.py:78-99 (build_rotation)
    """
    q = normalize_quat(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s), ref: utils/general_utils.py:101-110."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def covariance_3d(scaling: jnp.ndarray, scaling_modifier, quat: jnp.ndarray) -> jnp.ndarray:
    """Packed symmetric covariance [..., 6] = (xx, xy, xz, yy, yz, zz).

    ref: scene/gaussian_model.py:31-36 + utils/general_utils.py:64-76
    """
    L = build_scaling_rotation(scaling_modifier * scaling, quat)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6] upper triangle (ref: utils/general_utils.py:64-76)."""
    return jnp.stack([
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2],
    ], axis=-1)


def unpack_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
