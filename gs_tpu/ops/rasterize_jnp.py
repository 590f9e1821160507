"""Pure-jnp differentiable rasterizers.

Two interchangeable backends with identical semantics:

* :func:`rasterize_depthwise` — the O(N·P) correctness oracle: every pixel
  walks all Gaussians in global depth order (with the reference's tile-rect
  visibility test). Small scenes / tests; fully autograd-differentiable.
* :func:`rasterize_binned` — tile-binned renderer driven by
  :mod:`gs_tpu.ops.binning`; scans fixed-size chunks of each tile's
  depth-ordered entry list. This is the production math that the Pallas
  kernel (gs_tpu/ops/rasterize_pallas.py) implements on-chip.

Both return ``(image [3,H,W], invdepth [1,H,W], final_T [H,W])`` matching the
reference rasterizer outputs (rendered_image, invdepth_image; ref:
gaussian_renderer/__init__.py:89-109) plus the final transmittance.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.project import Projected, tile_rect
from .binning import TileBins, tile_grid
from .composite import composite_chunk, splat_alpha


def pack_projected(proj: Projected) -> jnp.ndarray:
    """[N, 10] rows (x, y, conic_a, conic_b, conic_c, opacity, r, g, b, invdepth).

    Invisible rows are zeroed ENTIRELY: culled/padded gaussians can carry
    non-finite conic (singular covariance) and rgb (zero view direction), and
    a single NaN row poisons the Pallas kernel's [entries, 4] contraction
    even at zero blend weight (0 * NaN = NaN on the MXU).
    """
    safe_depth = jnp.where(proj.depth > 0, proj.depth, 1.0)
    invd = 1.0 / safe_depth
    packets = jnp.concatenate([
        proj.mean2d,
        proj.conic,
        proj.opacity[:, None],
        proj.rgb,
        invd[:, None],
    ], axis=-1)
    return jnp.where(proj.visible[:, None], packets, 0.0)


def _pixel_coords(width: int, height: int):
    py, px = jnp.mgrid[0:height, 0:width]
    return px.reshape(-1).astype(jnp.float32), py.reshape(-1).astype(jnp.float32)


def _finalize(color, invdepth, Tmin, bg, width, height):
    img = color + Tmin[:, None] * bg[None, :]
    image = img.reshape(height, width, 3).transpose(2, 0, 1)
    invd = invdepth.reshape(1, height, width)
    return image, invd, Tmin.reshape(height, width)


def rasterize_depthwise(proj: Projected, width: int, height: int,
                        bg: jnp.ndarray, *, tile_x: int = 16, tile_y: int = 16,
                        chunk: int = 128):
    """O(N·P) oracle: all pixels, all Gaussians, exact reference semantics."""
    n = proj.depth.shape[0]
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    packets = pack_projected(proj)[order]                      # [N, 10]
    rx0, ry0, rx1, ry1 = tile_rect(proj.mean2d[order], proj.radius[order],
                                   gx, gy, tile_x, tile_y)
    vis = proj.visible[order]

    px, py = _pixel_coords(width, height)
    tcol = (px / tile_x).astype(jnp.int32)
    trow = (py / tile_y).astype(jnp.int32)
    P = width * height

    n_pad = -(-n // chunk) * chunk
    pad = n_pad - n

    def pad0(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    packets_p = pad0(packets).reshape(-1, chunk, 10)
    rect = jnp.stack([rx0, ry0, rx1, ry1], axis=-1)
    rect_p = pad0(rect).reshape(-1, chunk, 4)
    vis_p = pad0(vis, False).reshape(-1, chunk)

    def step(carry, inp):
        color, invd, U, Tmin = carry
        pk, rc, vs = inp
        alpha = splat_alpha(pk, px, py)                        # [CS, P]
        in_rect = ((rc[:, 0:1] <= tcol[None, :]) & (tcol[None, :] < rc[:, 2:3]) &
                   (rc[:, 1:2] <= trow[None, :]) & (trow[None, :] < rc[:, 3:4]))
        alpha = jnp.where(in_rect & vs[:, None], alpha, 0.0)
        dc, dinv, U, Tmin = composite_chunk(alpha, pk[:, 6:9], pk[:, 9], U, Tmin)
        return (color + dc, invd + dinv, U, Tmin), None

    init = (jnp.zeros((P, 3)), jnp.zeros((P,)), jnp.ones((P,)), jnp.ones((P,)))
    (color, invd, _, Tmin), _ = jax.lax.scan(
        jax.checkpoint(step), init, (packets_p, rect_p, vis_p))
    return _finalize(color, invd, Tmin, bg, width, height)


def rasterize_binned(proj: Projected, bins: TileBins, width: int, height: int,
                     bg: jnp.ndarray, *, tile_x: int = 16, tile_y: int = 16,
                     max_per_tile: int = 1024, chunk: int = 64,
                     tile_block: int = 0, row_phase=0, row_stride: int = 1,
                     row_map=None):
    """Tile-binned renderer over the sorted duplicated entry list.

    ``tile_block`` > 0 processes tiles in sequential blocks of that size
    (bounds the [tiles, chunk, pixels] working set at high resolutions).
    ``row_phase``/``row_stride`` map local tile rows to global ones
    (interleaved multi-chip bands; ``bins`` must be built with the same).
    """
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    T = gx * gy
    P = tile_x * tile_y
    packets = pack_projected(proj)                              # [N, 10]
    cap = bins.entry_gid.shape[0]
    K = max_per_tile
    n_chunks = -(-K // chunk)

    if tile_block <= 0 or tile_block > T:
        tile_block = T
    nb = -(-T // tile_block)
    T_pad = nb * tile_block

    def pad_tiles(x):
        return jnp.pad(x, (0, T_pad - T))

    start_b = pad_tiles(bins.tile_start).reshape(nb, tile_block)
    end_b = pad_tiles(bins.tile_end).reshape(nb, tile_block)
    tid_b = pad_tiles(jnp.arange(T, dtype=jnp.int32)).reshape(nb, tile_block)

    lx = jnp.arange(P, dtype=jnp.float32) % tile_x
    ly = jnp.arange(P, dtype=jnp.float32) // tile_x
    vm_composite = jax.vmap(composite_chunk)

    def render_block(blk):
        start, end, t_ids = blk                                 # [TB]
        pos = start[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        valid = pos < end[:, None]
        gid = jnp.where(valid, bins.entry_gid[jnp.clip(pos, 0, cap - 1)], 0)
        px = (t_ids % gx).astype(jnp.float32)[:, None] * tile_x + lx[None, :]
        if row_map is not None:
            trow = row_map.astype(jnp.int32).at[t_ids // gx].get(mode='clip')
        else:
            trow = (t_ids // gx) * row_stride + row_phase
        py = trow.astype(jnp.float32)[:, None] * tile_y + ly[None, :]

        gid_c = gid.reshape(-1, n_chunks, chunk).transpose(1, 0, 2)   # [NC, TB, CS]
        valid_c = valid.reshape(-1, n_chunks, chunk).transpose(1, 0, 2)

        def step(carry, inp):
            color, invd, U, Tmin = carry
            g, v = inp                                          # [TB, CS]
            pk = packets[g]                                     # [TB, CS, 10]
            alpha = splat_alpha(pk, px, py)                     # [TB, CS, P]
            alpha = jnp.where(v[:, :, None], alpha, 0.0)
            dc, dinv, U, Tmin = vm_composite(alpha, pk[:, :, 6:9], pk[:, :, 9],
                                             U, Tmin)
            return (color + dc, invd + dinv, U, Tmin), None

        tb = start.shape[0]
        init = (jnp.zeros((tb, P, 3)), jnp.zeros((tb, P)),
                jnp.ones((tb, P)), jnp.ones((tb, P)))
        (color, invd, _, Tmin), _ = jax.lax.scan(
            jax.checkpoint(step), init, (gid_c, valid_c))
        return color, invd, Tmin

    if nb == 1:
        color, invd, Tmin = render_block((start_b[0], end_b[0], tid_b[0]))
    else:
        color, invd, Tmin = jax.lax.map(render_block, (start_b, end_b, tid_b))
        color = color.reshape(T_pad, P, 3)[:T]
        invd = invd.reshape(T_pad, P)[:T]
        Tmin = Tmin.reshape(T_pad, P)[:T]

    img = color + Tmin[:, :, None] * bg[None, None, :]

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(gy, gx, tile_y, tile_x, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(gy * tile_y, gx * tile_x, c)
        return x[:height, :width]

    image = untile(img).transpose(2, 0, 1)
    invdepth = untile(invd[:, :, None]).transpose(2, 0, 1)
    finalT = untile(Tmin[:, :, None])[:, :, 0]
    return image, invdepth, finalT
