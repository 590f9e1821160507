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
from .sh import eval_sh_channels

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


def _project_channels(camera: Camera, x, y, z):
    """project_points as flat [N] channels (identical math, no [N,4]
    intermediates — keeps the whole chain in one XLA fusion)."""
    V = camera.world_view
    P = camera.full_proj
    vx = V[0, 0] * x + V[0, 1] * y + V[0, 2] * z + V[0, 3]
    vy = V[1, 0] * x + V[1, 1] * y + V[1, 2] * z + V[1, 3]
    vz = V[2, 0] * x + V[2, 1] * y + V[2, 2] * z + V[2, 3]
    hx = P[0, 0] * x + P[0, 1] * y + P[0, 2] * z + P[0, 3]
    hy = P[1, 0] * x + P[1, 1] * y + P[1, 2] * z + P[1, 3]
    hw = P[3, 0] * x + P[3, 1] * y + P[3, 2] * z + P[3, 3]
    p_w = 1.0 / (hw + 1e-7)
    W = jnp.float32(camera.width)
    H = jnp.float32(camera.height)
    pix_x = ((hx * p_w + 1.0) * W - 1.0) * 0.5
    pix_y = ((hy * p_w + 1.0) * H - 1.0) * 0.5
    return vx, vy, vz, pix_x, pix_y


def _cov3d_channels(ls, scaling_modifier, q):
    """covariance_3d as 6 flat channels (xx, xy, xz, yy, yz, zz) from
    log-scale channels ``ls`` (3-tuple) and quat channels ``q`` (4-tuple).

    Same math as build_scaling_rotation + L L^T (utils/general_utils.py:
    64-110) with no [N,3,3] intermediates."""
    qn = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    r = q[0] / qn
    qx = q[1] / qn
    qy = q[2] / qn
    qz = q[3] / qn
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - r * qz)
    r02 = 2 * (qx * qz + r * qy)
    r10 = 2 * (qx * qy + r * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - r * qx)
    r20 = 2 * (qx * qz - r * qy)
    r21 = 2 * (qy * qz + r * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0 = scaling_modifier * jnp.exp(ls[0])
    s1 = scaling_modifier * jnp.exp(ls[1])
    s2 = scaling_modifier * jnp.exp(ls[2])
    a0, a1, a2 = s0 * s0, s1 * s1, s2 * s2   # Sigma = R diag(s^2) R^T
    xx = a0 * r00 * r00 + a1 * r01 * r01 + a2 * r02 * r02
    xy = a0 * r00 * r10 + a1 * r01 * r11 + a2 * r02 * r12
    xz = a0 * r00 * r20 + a1 * r01 * r21 + a2 * r02 * r22
    yy = a0 * r10 * r10 + a1 * r11 * r11 + a2 * r12 * r12
    yz = a0 * r10 * r20 + a1 * r11 * r21 + a2 * r12 * r22
    zz = a0 * r20 * r20 + a1 * r21 * r21 + a2 * r22 * r22
    return xx, xy, xz, yy, yz, zz


def _cov2d_channels(camera: Camera, vx, vy, vz, sig):
    """EWA projection as flat channels; ``sig`` = 6-tuple (xx..zz).

    Identical math to compute_cov2d: cov2d = (J W) Sigma (J W)^T with the
    clamped Jacobian, +0.3 px low-pass on the diagonal."""
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    # anything at or behind the near plane is frustum-culled (visible mask),
    # so clamping z here is exact for every visible gaussian while keeping
    # culled/dead slots NaN-free (0/0 primals poison backward cotangents
    # even under the visibility where-mask)
    vz = jnp.maximum(vz, NEAR_CULL_Z)
    txtz = vx / vz
    tytz = vy / vz
    tx = jnp.clip(txtz, -limx, limx) * vz
    ty = jnp.clip(tytz, -limy, limy) * vz
    fx = camera.focal_x
    fy = camera.focal_y
    inv_z = 1.0 / vz
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    Wr = camera.world_view[:3, :3]
    # rows of (J W): u_k = j00*W[0,k] + j02*W[2,k]; v_k = j11*W[1,k] + j12*W[2,k]
    u0 = j00 * Wr[0, 0] + j02 * Wr[2, 0]
    u1 = j00 * Wr[0, 1] + j02 * Wr[2, 1]
    u2 = j00 * Wr[0, 2] + j02 * Wr[2, 2]
    v0 = j11 * Wr[1, 0] + j12 * Wr[2, 0]
    v1 = j11 * Wr[1, 1] + j12 * Wr[2, 1]
    v2 = j11 * Wr[1, 2] + j12 * Wr[2, 2]
    xx, xy, xz, yy, yz, zz = sig
    # Sigma u and Sigma v (symmetric)
    su0 = xx * u0 + xy * u1 + xz * u2
    su1 = xy * u0 + yy * u1 + yz * u2
    su2 = xz * u0 + yz * u1 + zz * u2
    sv0 = xx * v0 + xy * v1 + xz * v2
    sv1 = xy * v0 + yy * v1 + yz * v2
    sv2 = xz * v0 + yz * v1 + zz * v2
    cxx = u0 * su0 + u1 * su1 + u2 * su2
    cxy = v0 * su0 + v1 * su1 + v2 * su2
    cyy = v0 * sv0 + v1 * sv1 + v2 * sv2
    det_orig = cxx * cyy - cxy * cxy
    cxx = cxx + LOWPASS
    cyy = cyy + LOWPASS
    det_dilated = cxx * cyy - cxy * cxy
    return cxx, cxy, cyy, det_orig, det_dilated


def compute_cov2d(camera: Camera, p_view: jnp.ndarray, cov3d_packed: jnp.ndarray):
    """EWA projection of the 3D covariance to 2D.

    Returns (cov2d [N,3] = (xx, xy, yy) after low-pass, det_orig, det_dilated).
    """
    tz = jnp.maximum(p_view[:, 2], NEAR_CULL_Z)  # see _cov2d_channels
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
    x, y, z = params.xyz[:, 0], params.xyz[:, 1], params.xyz[:, 2]
    ls = tuple(params.log_scale[:, i] for i in range(3))
    quat = tuple(params.quat[:, i] for i in range(4))
    lop = params.logit_opacity[:, 0]
    coeffs = None
    if override_color is None:
        coeffs = ([params.sh_dc[:, 0, c] for c in range(3)] +
                  [params.sh_rest[:, k, c]
                   for k in range(params.sh_rest.shape[1])
                   for c in range(3)])
    return _preprocess_from_channels(
        camera, x, y, z, ls, quat, lop, coeffs,
        active_sh_degree=active_sh_degree,
        scaling_modifier=scaling_modifier, antialiasing=antialiasing,
        alive=alive, override_color=override_color,
        cov3d_precomp=cov3d_precomp)


def preprocess_packed(packed: jnp.ndarray, camera: Camera, *,
                      sh_degree: int, active_sh_degree: int,
                      scaling_modifier: float = 1.0,
                      antialiasing: bool = False,
                      alive: Optional[jnp.ndarray] = None,
                      override_color: Optional[jnp.ndarray] = None,
                      cov3d_precomp: Optional[jnp.ndarray] = None) -> Projected:
    """preprocess() over the channel-major packed parameter block [R, C]
    (core.packed) — the training hot path. One differentiable row read feeds
    the identical channel math; the parameter gradient materializes as a
    single [R, C] stack instead of six reference-shaped pytree leaves."""
    from .packed import all_channels
    ch = all_channels(packed, sh_degree)
    coeffs = None
    if override_color is None:
        coeffs = list(ch["sh_dc"]) + list(ch["sh_rest"])
    return _preprocess_from_channels(
        camera, ch["x"], ch["y"], ch["z"], ch["ls"], ch["quat"], ch["lop"],
        coeffs, active_sh_degree=active_sh_degree,
        scaling_modifier=scaling_modifier, antialiasing=antialiasing,
        alive=alive, override_color=override_color,
        cov3d_precomp=cov3d_precomp)


def _preprocess_from_channels(camera: Camera, x, y, z, ls, quat, lop,
                              coeffs, *, active_sh_degree: int,
                              scaling_modifier, antialiasing: bool,
                              alive, override_color,
                              cov3d_precomp) -> Projected:
    """Shared flat-channel preprocess core. ``coeffs`` is the SH coefficient
    channel list ordered (band, color) with band 0 = DC; may be None when
    ``override_color`` is given."""
    vx, vy, vz, pix_x, pix_y = _project_channels(camera, x, y, z)
    depth = vz
    in_front = depth > NEAR_CULL_Z

    if cov3d_precomp is None:
        sig = _cov3d_channels(ls, scaling_modifier, quat)
    else:
        sig = tuple(cov3d_precomp[:, i] for i in range(6))
    cxx, cxy, cyy, det_orig, det = _cov2d_channels(camera, vx, vy, vz, sig)

    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    pix = jnp.stack([pix_x, pix_y], axis=-1)
    conic = jnp.stack([cyy * inv_det,
                       -cxy * inv_det,
                       cxx * inv_det], axis=-1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))

    opacity = jax.nn.sigmoid(lop)
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
    rcx = jnp.ceil(jnp.sqrt(two_l * jnp.maximum(cxx, 0.0))) + 1.0
    rcy = jnp.ceil(jnp.sqrt(two_l * jnp.maximum(cyy, 0.0))) + 1.0
    keep = visible & (log_term > 0.0)
    radius_cull = jnp.stack([
        jnp.where(keep, jnp.minimum(rcx, radius_f), 0.0),
        jnp.where(keep, jnp.minimum(rcy, radius_f), 0.0)], axis=-1
    ).astype(jnp.int32)

    if override_color is not None:
        rgb = override_color
    else:
        # flat-channel SH: per-color Horner accumulation over (band, color)
        # coefficient channels — XLA CSEs the shared basis polynomials
        cc = camera.camera_center
        dx, dy, dz = x - cc[0], y - cc[1], z - cc[2]
        # dead (padding) slots can sit exactly at the camera center; an
        # unguarded rsqrt(0) makes their PRIMAL direction NaN, and the
        # backward multiplies cotangents by those primals (0 * NaN = NaN),
        # poisoning dead-slot grads -> dense-Adam moments. Guard is inert
        # for real gaussians (any distance > 1e-9 m).
        inv_n = 1.0 / jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz,
                                           1e-18))
        dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n
        rgb = jnp.stack([
            eval_sh_channels(active_sh_degree, coeffs[c::3], dx, dy, dz)
            for c in range(3)], axis=-1)
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
