"""EWA projection (the rasterizer "preprocess" stage) — pure XLA, batched over N.

Behavioral spec reconstructed from the reference CUDA rasterizer's call sites
(ref: SURVEY.md §2.3-N1; gaussian_renderer/__init__.py:32-109):

* frustum cull at view z <= 0.2
* perspective division with +1e-7 guard
* EWA: cov2d = J W Sigma W^T J^T with the Jacobian's (x,y)/z clamped to
  1.3*tan(fov); +0.3 px low-pass on the diagonal
* antialiasing (Mip-Splatting) rescales opacity by
  sqrt(max(2.5e-5, det(cov)/det(cov+0.3 I)))
* conic = inverse of the dilated 2x2 covariance
* radius = ceil(3 * sqrt(max eigenvalue)), with the eigen-discriminant
  clamped at 0.1
* pixel coords: ((ndc + 1) * S - 1) / 2
* SH -> RGB for the active degree with clamp at max(c + 0.5, 0)

Everything is differentiable w.r.t. the Gaussian parameters; integer outputs
(radius, tile rects) are gradient-free by construction.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .camera import Camera
from .gaussians import (GaussianParams, covariance_3d, get_opacity,
                        get_scaling, unpack_symmetric)
from .sh import eval_sh

NEAR_CULL_Z = 0.2
LOWPASS = 0.3
AA_DET_CLAMP = 0.000025


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""
    mean2d: jnp.ndarray    # [N, 2] pixel coordinates
    conic: jnp.ndarray     # [N, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray     # [N] view-space z
    radius: jnp.ndarray    # [N] int32, 0 => invisible
    rgb: jnp.ndarray       # [N, 3]
    opacity: jnp.ndarray   # [N] effective opacity (sigmoid, AA-scaled)
    visible: jnp.ndarray   # [N] bool (radius > 0)
    radius_cull: Optional[jnp.ndarray] = None  # [N, 2] int32 (rx, ry), each
    # <= radius: tight opacity-aware binning half-widths (beyond them
    # alpha < 1/255 everywhere, so the in-kernel skip mask drops those
    # pixels anyway — culling the tiles is EXACT for values and gradients).
    # The reference always bins at the 3-sigma square; ``radius`` keeps that
    # value for the densification/prune semantics (radii2D stats,
    # visibility filter).


def project_points(camera: Camera, xyz: jnp.ndarray):
    """Returns (p_view [N,3], pix [N,2]) for the camera's matrix chain."""
    ones = jnp.ones_like(xyz[:, :1])
    hom = jnp.concatenate([xyz, ones], axis=1)          # [N,4]
    p_view = hom @ camera.world_view.T                  # [N,4]
    p_hom = hom @ camera.full_proj.T                    # [N,4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    W = jnp.float32(camera.width)
    H = jnp.float32(camera.height)
    pix_x = ((ndc[:, 0] + 1.0) * W - 1.0) * 0.5
    pix_y = ((ndc[:, 1] + 1.0) * H - 1.0) * 0.5
    return p_view[:, :3], jnp.stack([pix_x, pix_y], axis=-1)


def compute_cov2d(camera: Camera, p_view: jnp.ndarray, cov3d_packed: jnp.ndarray):
    """EWA projection of the 3D covariance to 2D.

    Returns (cov2d [N,3] = (xx, xy, yy) after low-pass, det_orig, det_dilated).
    """
    tz = p_view[:, 2]
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    txtz = p_view[:, 0] / tz
    tytz = p_view[:, 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    fx = camera.focal_x
    fy = camera.focal_y
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    zeros = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
        jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
    ], axis=-2)                                          # [N,2,3]
    Wr = camera.world_view[:3, :3]                       # world->view rotation
    Sigma = unpack_symmetric(cov3d_packed)               # [N,3,3]
    JW = J @ Wr                                          # [N,2,3]
    cov = JW @ Sigma @ jnp.swapaxes(JW, -1, -2)          # [N,2,2]
    cxx = cov[:, 0, 0]
    cxy = cov[:, 0, 1]
    cyy = cov[:, 1, 1]
    det_orig = cxx * cyy - cxy * cxy
    cxx = cxx + LOWPASS
    cyy = cyy + LOWPASS
    det_dilated = cxx * cyy - cxy * cxy
    return jnp.stack([cxx, cxy, cyy], axis=-1), det_orig, det_dilated


def preprocess(params: GaussianParams, camera: Camera, *,
               active_sh_degree: int,
               scaling_modifier: float = 1.0,
               antialiasing: bool = False,
               alive: Optional[jnp.ndarray] = None,
               override_color: Optional[jnp.ndarray] = None,
               cov3d_precomp: Optional[jnp.ndarray] = None) -> Projected:
    """Full per-Gaussian preprocess: cull, project, EWA, SH shading.

    Dead (padding) slots are forced invisible via ``alive``.
    """
    xyz = params.xyz
    p_view, pix = project_points(camera, xyz)
    depth = p_view[:, 2]
    in_front = depth > NEAR_CULL_Z

    if cov3d_precomp is None:
        cov3d = covariance_3d(get_scaling(params), scaling_modifier, params.quat)
    else:
        cov3d = cov3d_precomp
    cov2d, det_orig, det = compute_cov2d(camera, p_view, cov3d)

    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([cov2d[:, 2] * inv_det,
                       -cov2d[:, 1] * inv_det,
                       cov2d[:, 0] * inv_det], axis=-1)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))

    opacity = get_opacity(params)[:, 0]
    if antialiasing:
        h_scale = jnp.sqrt(jnp.maximum(AA_DET_CLAMP, det_orig / det))
        opacity = opacity * h_scale

    visible = in_front & det_ok
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    visible = radius > 0

    # opacity-aware per-axis cull radii: alpha = op*exp(-0.5 d^T Sigma^-1 d)
    # >= 1/255 only inside the ellipse d^T Sigma^-1 d <= 2 ln(255 op), whose
    # exact bounding box has half-widths sqrt(2 ln(255 op) * Sigma_xx|yy)
    # (marginal variances of the dilated covariance — the same matrix the
    # conic inverts). Tiles outside that box never pass the kernel's
    # alpha >= 1/255 skip mask, so culling them changes nothing (values or
    # grads). +1 px guards the tile_rect max-side convention (it only
    # guarantees pixel coverage to r-1) and any f32 rounding at tangency.
    log_term = jnp.log(jnp.maximum(255.0 * opacity, 1e-12))
    two_l = 2.0 * jnp.maximum(log_term, 0.0)
    rcx = jnp.ceil(jnp.sqrt(two_l * jnp.maximum(cov2d[:, 0], 0.0))) + 1.0
    rcy = jnp.ceil(jnp.sqrt(two_l * jnp.maximum(cov2d[:, 2], 0.0))) + 1.0
    keep = visible & (log_term > 0.0)
    radius_cull = jnp.stack([
        jnp.where(keep, jnp.minimum(rcx, radius_f), 0.0),
        jnp.where(keep, jnp.minimum(rcy, radius_f), 0.0)], axis=-1
    ).astype(jnp.int32)

    if override_color is not None:
        rgb = override_color
    else:
        dirs = xyz - camera.camera_center[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        feats = jnp.concatenate([params.sh_dc, params.sh_rest], axis=1)  # [N, K, 3]
        sh = jnp.swapaxes(feats, 1, 2)                                   # [N, 3, K]
        rgb = eval_sh(active_sh_degree, sh, dirs)
        rgb = jnp.maximum(rgb + 0.5, 0.0)

    return Projected(
        mean2d=pix,
        conic=conic,
        depth=depth,
        radius=radius,
        rgb=rgb,
        opacity=opacity,
        visible=visible,
        radius_cull=radius_cull,
    )


def mark_visible(camera: Camera, xyz: jnp.ndarray) -> jnp.ndarray:
    """Frustum-visibility mask without a full render.

    Equivalent of the rasterizer package's ``markVisible(positions,
    viewmatrix, projmatrix)`` (exposed by the upstream
    diff-gaussian-rasterization API as ``GaussianRasterizer.markVisible``;
    the CUDA in_frustum test reduces to view-space z > 0.2 — the same
    NEAR_CULL_Z used by the preprocess)."""
    p_view, _ = project_points(camera, xyz)
    return p_view[:, 2] > NEAR_CULL_Z


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray,
              grid_x: int, grid_y: int, tile_x: int, tile_y: int,
              radius_y: Optional[jnp.ndarray] = None):
    """Tile-span rectangle per Gaussian, clamped to the tile grid.

    Matches the CUDA getRect math (min/max over the block grid); returns
    (rx0, ry0, rx1, ry1) int32 half-open ranges. ``radius_y`` (defaults to
    ``radius``) allows an anisotropic span for the opacity-aware cull bbox.
    """
    rx = radius.astype(jnp.float32)
    ry = rx if radius_y is None else radius_y.astype(jnp.float32)
    rx0 = jnp.clip(jnp.floor((mean2d[:, 0] - rx) / tile_x).astype(jnp.int32), 0, grid_x)
    ry0 = jnp.clip(jnp.floor((mean2d[:, 1] - ry) / tile_y).astype(jnp.int32), 0, grid_y)
    rx1 = jnp.clip(jnp.floor((mean2d[:, 0] + rx + tile_x - 1) / tile_x).astype(jnp.int32), 0, grid_x)
    ry1 = jnp.clip(jnp.floor((mean2d[:, 1] + ry + tile_y - 1) / tile_y).astype(jnp.int32), 0, grid_y)
    return rx0, ry0, rx1, ry1
