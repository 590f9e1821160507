"""Render facade — the TPU equivalent of ``gaussian_renderer.render()``.

Mirrors the reference facade's contract (ref: gaussian_renderer/__init__.py:18-121):
takes a camera, the Gaussian parameters, pipeline options, and a background
color; returns a dict with ``render`` [3,H,W], ``depth`` (inverse depth,
[1,H,W]), ``radii`` [N], ``visibility_filter`` [N] — plus ``final_T`` and the
screen-space means gradient tap used for densification.

The ``means2d_grad_scale`` trick: the reference exposes dL/d(means2D) through a
zero tensor in NDC-half-resolution units (ref: gaussian_renderer/__init__.py:26-30,
scene/gaussian_model.py:431-433). Here the caller differentiates w.r.t.
``proj.mean2d`` (pixels) and rescales by (0.5*W, 0.5*H) to reproduce the
reference's densification statistics.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .core.camera import Camera
from .core.gaussians import GaussianParams
from .core.project import preprocess, Projected
from .ops.binning import bin_gaussians, TileBins
from .ops.rasterize_jnp import rasterize_binned, rasterize_depthwise

TILE_X = 16
TILE_Y = 16


class RenderOutput(NamedTuple):
    image: jnp.ndarray        # [3, H, W]
    invdepth: jnp.ndarray     # [1, H, W]
    final_T: jnp.ndarray      # [H, W]
    radii: jnp.ndarray        # [N] int32
    visibility: jnp.ndarray   # [N] bool
    num_duplicates: jnp.ndarray  # [] int32 (binned backends)
    max_tile_len: jnp.ndarray    # [] int32 longest per-tile list
    overflow: jnp.ndarray     # [] bool
    band_duplicates: Optional[jnp.ndarray] = None  # [k] per-device band
    # duplicate counts (multichip path only) — the tile-band load-balance
    # diagnostic; max/mean of this is the imbalance factor
    band_visible: Optional[jnp.ndarray] = None  # [k] per-device visible
    # gaussian counts (multichip path only) — sizes visible_capacity
    num_valid: Optional[jnp.ndarray] = None  # [] int32 entries surviving
    # the validity culls (exact_cull / column segments) — the entries the
    # kernel actually composites (binned/pallas backends)
    band_work: Optional[jnp.ndarray] = None  # [k] per-device num_valid
    # (multichip path only) — the REAL per-device kernel work; with
    # split_rows the pre-cull band_duplicates overstates heavy-row devices


def resolve_backend(backend: str) -> str:
    """'auto' picks the Pallas kernel on TPU, the XLA path elsewhere."""
    if backend == "auto":
        import jax
        return "pallas" if jax.default_backend() == "tpu" else "binned"
    return backend


def raster_lever_kwargs(raster, fwd_only: bool = False) -> dict:
    """render()/render_projected() kwargs for a RasterConfig's validated
    perf levers — so every caller (train step, eval renders, render CLI,
    viewer) runs the same configured pipeline instead of silently dropping
    to the all-off render() defaults. ``fwd_only=True`` marks a no-grad
    caller (viewer/eval/CLI): the entry gids leave the tile sort (~3 ms per
    sort operand on v5e); gradients through such a render raise loudly."""
    return dict(
        bf16_features=getattr(raster, "bf16_features", False),
        pallas_expand=getattr(raster, "pallas_expand", False),
        exact_cull=getattr(raster, "exact_cull", False),
        pallas_fold=getattr(raster, "pallas_fold", False),
        fwd_only=fwd_only)


def render(camera: Camera, params: GaussianParams, bg: jnp.ndarray, *,
           active_sh_degree: int,
           scaling_modifier: float = 1.0,
           antialiasing: bool = False,
           alive: Optional[jnp.ndarray] = None,
           override_color: Optional[jnp.ndarray] = None,
           convert_SHs_python: bool = False,
           compute_cov3D_python: bool = False,
           backend: str = "binned",
           dup_capacity: int = 1 << 18,
           max_per_tile: int = 1024,
           chunk: int = 64,
           tile_block: int = 0,
           bf16_features: bool = False,
           pallas_expand: bool = False,
           exact_cull: bool = False,
           pallas_fold: bool = False,
           fwd_only: bool = False) -> RenderOutput:
    """Render one view. Differentiable w.r.t. ``params`` (and bg).

    ``convert_SHs_python`` / ``compute_cov3D_python`` recompute SH shading /
    the 3D covariance outside the preprocess and feed them back as
    override_color / cov3d_precomp — the reference's kernel cross-check
    switches (ref: gaussian_renderer/__init__.py:63-84,
    arguments/__init__.py:67-68); the math is identical.
    """
    # cov3D_python is independent of override_color (the reference computes
    # cov3D_precomp unconditionally when the flag is set,
    # gaussian_renderer/__init__.py:63-67); only the SH debug path is gated
    # on no override color being supplied
    cov3d_precomp = None
    if compute_cov3D_python:
        from .core.gaussians import covariance_3d, get_scaling
        cov3d_precomp = covariance_3d(get_scaling(params), scaling_modifier,
                                      params.quat)
    if convert_SHs_python and override_color is None:
        from .core.sh import eval_sh
        dirs = params.xyz - camera.camera_center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        feats = jnp.concatenate([params.sh_dc, params.sh_rest], axis=1)
        sh = jnp.swapaxes(feats, 1, 2)
        override_color = jnp.maximum(
            eval_sh(active_sh_degree, sh, dirs) + 0.5, 0.0)
    proj = preprocess(params, camera, active_sh_degree=active_sh_degree,
                      scaling_modifier=scaling_modifier,
                      antialiasing=antialiasing, alive=alive,
                      override_color=override_color,
                      cov3d_precomp=cov3d_precomp)
    return render_projected(proj, camera.width, camera.height, bg,
                            backend=backend, dup_capacity=dup_capacity,
                            max_per_tile=max_per_tile, chunk=chunk,
                            tile_block=tile_block,
                            bf16_features=bf16_features,
                            pallas_expand=pallas_expand,
                            exact_cull=exact_cull,
                            pallas_fold=pallas_fold,
                            fwd_only=fwd_only)


def render_projected(proj: Projected, width: int, height: int, bg: jnp.ndarray,
                     *, backend: str = "binned", dup_capacity: int = 1 << 18,
                     max_per_tile: int = 1024, chunk: int = 64,
                     tile_block: int = 0, row_phase=0,
                     row_stride: int = 1,
                     bf16_features: bool = False,
                     pallas_expand: bool = False,
                     exact_cull: bool = False,
                     pallas_fold: bool = False,
                               fwd_only: bool = False,
                     row_map=None, row_cumown=None,
                     col0_map=None, col1_map=None) -> RenderOutput:
    """``row_phase`` (traced ok) / ``row_stride`` (static): render only the
    global tile rows phase + j*stride into the local height — the
    interleaved multi-chip band assignment (parallel/render_mc.py).
    ``col0_map``/``col1_map`` [gy_local] (with row_map): per-local-row owned
    tile-column ranges — sub-row band splitting."""
    backend = resolve_backend(backend)
    zero_i = jnp.int32(0)
    nv = zero_i
    if backend == "depthwise":
        assert row_stride == 1, "depthwise oracle renders full frames only"
        image, invd, finalT = rasterize_depthwise(
            proj, width, height, bg, tile_x=TILE_X, tile_y=TILE_Y, chunk=chunk)
        nd, ml, ov = zero_i, zero_i, jnp.bool_(False)
    elif backend == "binned":
        bins = bin_gaussians(proj, width, height, TILE_X, TILE_Y, dup_capacity,
                             row_phase=row_phase, row_stride=row_stride,
                             row_map=row_map, row_cumown=row_cumown,
                             col0_map=col0_map, col1_map=col1_map)
        image, invd, finalT = rasterize_binned(
            proj, bins, width, height, bg, tile_x=TILE_X, tile_y=TILE_Y,
            max_per_tile=max_per_tile, chunk=chunk, tile_block=tile_block,
            row_phase=row_phase, row_stride=row_stride, row_map=row_map)
        nd = bins.num_duplicates
        ml = jnp.max(bins.tile_end - bins.tile_start)
        ov = bins.overflow | (ml > max_per_tile)
        nv = bins.num_valid
    elif backend in ("pallas", "pallas_interpret"):
        from .ops.rasterize_pallas import rasterize_pallas
        image, invd, finalT, nd, ml, ov, nv = rasterize_pallas(
            proj, width, height, bg, tile_x=TILE_X, tile_y=TILE_Y,
            max_per_tile=max_per_tile, dup_capacity=dup_capacity,
            interpret=(backend == "pallas_interpret"),
            row_phase=row_phase, row_stride=row_stride,
            bf16_features=bf16_features,
            pallas_expand=pallas_expand,
            exact_cull=exact_cull,
            pallas_fold=pallas_fold,
            fwd_only=fwd_only,
            row_map=row_map, row_cumown=row_cumown,
            col0_map=col0_map, col1_map=col1_map)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return RenderOutput(image=image, invdepth=invd, final_T=finalT,
                        radii=proj.radius, visibility=proj.visible,
                        num_duplicates=nd, max_tile_len=ml, overflow=ov,
                        num_valid=nv)
