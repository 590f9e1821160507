"""Spatial helpers: scene extent and kNN initial-scale estimation.

``mean_sq_dist_to_3nn`` is the TPU-native replacement for the simple-knn CUDA
extension's ``distCUDA2`` (ref: scene/gaussian_model.py:140-141; SURVEY.md
§2.3-N2): mean squared distance to the 3 nearest neighbors, clamped to 1e-7,
feeding initial isotropic scales. The upstream kernel is itself approximate
(Morton-order window search); we use the same idea — sort by Morton code and
scan a +/-window in code order — exactness is not part of the contract.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def camera_extent(cam_centers: np.ndarray) -> tuple[np.ndarray, float]:
    """NeRF++-style normalization: (translate, radius).

    radius = 1.1 * max distance from the average camera center
    (ref: scene/dataset_readers.py:51-72 getNerfppNorm).
    """
    avg = cam_centers.mean(axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - avg, axis=1)
    diagonal = float(dist.max())
    radius = diagonal * 1.1
    translate = -avg[0]
    return translate, radius


def _morton3d(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10-bit quantized coords -> 30-bit Morton code. q: [N,3] int32."""
    def split3(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & jnp.int32(0x30000FF)
        x = (x | (x << 8)) & jnp.int32(0x300F00F)
        x = (x | (x << 4)) & jnp.int32(0x30C30C3)
        x = (x | (x << 2)) & jnp.int32(0x9249249)
        return x
    return split3(q[:, 0]) | (split3(q[:, 1]) << 1) | (split3(q[:, 2]) << 2)


def mean_sq_dist_to_3nn(points: jnp.ndarray, window: int = 24) -> jnp.ndarray:
    """[N,3] -> [N] mean squared distance to 3 approximate nearest neighbors."""
    n = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    scale = jnp.maximum(hi - lo, 1e-9)
    q = ((points - lo) / scale * 1023.0).astype(jnp.int32)
    code = _morton3d(q)
    order = jnp.argsort(code)
    ps = points[order]                                   # [N,3] in Morton order

    # distances to +/-window neighbors in code order
    best = jnp.full((n, 3), jnp.inf)
    for shift in range(1, window + 1):
        for sgn in (1, -1):
            nb = jnp.roll(ps, sgn * shift, axis=0)
            d2 = jnp.sum((ps - nb) ** 2, axis=1)
            # roll wraps around — mask the wrapped ends
            idx = jnp.arange(n)
            ok = (idx >= shift) if sgn == 1 else (idx < n - shift)
            d2 = jnp.where(ok, d2, jnp.inf)
            worst = jnp.argmax(best, axis=1)
            improved = d2 < best[jnp.arange(n), worst]
            best = best.at[jnp.arange(n), worst].set(
                jnp.where(improved, d2, best[jnp.arange(n), worst]))
    k = jnp.minimum(3, n - 1)
    finite = jnp.isfinite(best)
    mean3 = jnp.sum(jnp.where(finite, best, 0.0), axis=1) / jnp.maximum(
        jnp.sum(finite, axis=1), 1)
    out = jnp.zeros((n,)).at[order].set(mean3)
    return jnp.maximum(out, 1e-7)                        # clamp, ref: gaussian_model.py:140
