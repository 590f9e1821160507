"""Device mesh and sharding layout for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.4); this module is the new
TPU-native scaling design: Gaussians (the N axis of every [C, ...] parameter,
moment, and statistic array) are sharded over the ``gauss`` mesh axis —
parameter + optimizer sharding, FSDP-style — while cameras and images stay
replicated. Rasterization gathers the culled working set (XLA inserts the
all-gather over ICI from the sharding annotations) and the backward pass
reduce-scatters per-Gaussian gradients back to their shards. Densify/prune
runs as the same pure function under GSPMD; its global reductions (counts,
cumsum ranks) become collectives.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GAUSS_AXIS = "gauss"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (GAUSS_AXIS,))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(GAUSS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_shardings(state, mesh: Mesh):
    """Sharding pytree for a TrainState or PackedState: arrays with a
    capacity-sized axis shard on the gauss axis (axis 0 for the reference-
    shaped [C, ...] leaves, axis 1 for the channel-major [R, C] packed
    blocks), everything else replicated. Capacity must divide the mesh
    size."""
    c = state.capacity
    n = mesh.devices.size
    assert c % n == 0, f"capacity {c} not divisible by mesh size {n}"
    gs = gauss_sharding(mesh)
    rep = replicated(mesh)
    col = NamedSharding(mesh, P(None, GAUSS_AXIS))

    def pick(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return rep
        if x.shape[0] == c:
            return gs
        if x.ndim == 2 and x.shape[1] == c:
            return col
        return rep

    return jax.tree.map(pick, state)


def shard_state(state, mesh: Mesh):
    return jax.device_put(state, state_shardings(state, mesh))
