"""Training checkpoints: full TrainState (params + Adam moments + densify
stats + exposure) plus iteration, as a msgpack blob via flax.serialization.

TPU equivalent of ``torch.save((gaussians.capture(), iteration), chkpntN.pth)``
(ref: train.py:181-183, scene/gaussian_model.py:67-99 capture/restore). The
capacity and SH degree are stored so restore can rebuild the pytree skeleton
without the original config.
"""
from __future__ import annotations

import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..core.gaussians import GaussianParams
from ..models.gaussian_model import TrainState, init_state

MAGIC = b"GSTPUCK1"


def save_checkpoint(path: str, state, iteration: int,
                    spatial_lr_scale: float = 1.0):
    """``state`` may be a TrainState or a PackedState (converted here so the
    on-disk format stays layout-independent and reference-meaningful)."""
    from ..models.packed_state import PackedState, unpack_state
    if isinstance(state, PackedState):
        state = unpack_state(state)
    state = jax.device_get(state)
    blob = serialization.to_bytes(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = struct.pack("<iiiif", iteration, state.capacity,
                         state.params.sh_rest.shape[1],
                         state.exposure.shape[0], spatial_lr_scale)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        f.write(blob)


def load_checkpoint(path: str) -> tuple[TrainState, int, float]:
    """Returns (state, iteration, spatial_lr_scale)."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not a gs_tpu checkpoint")
        iteration, capacity, rest_dim, num_images, slrs = struct.unpack(
            "<iiiif", f.read(20))
        blob = f.read()
    sh_degree = int(round((rest_dim + 1) ** 0.5)) - 1
    skeleton_params = GaussianParams(
        xyz=jnp.zeros((capacity, 3)),
        sh_dc=jnp.zeros((capacity, 1, 3)),
        sh_rest=jnp.zeros((capacity, rest_dim, 3)),
        log_scale=jnp.zeros((capacity, 3)),
        quat=jnp.zeros((capacity, 4)),
        logit_opacity=jnp.zeros((capacity, 1)))
    skeleton = init_state(skeleton_params, jnp.zeros(capacity, bool),
                          num_images)
    state = serialization.from_bytes(skeleton, blob)
    state = jax.tree.map(jnp.asarray, state)
    return state, iteration, slrs
