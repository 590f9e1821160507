"""Tile binning: duplicate Gaussians over their tile span and group by tile.

TPU-native replacement for the CUDA rasterizer's binning stage (inclusive-scan
of touched-tile counts -> (tile|depth) key expansion -> global radix sort ->
per-tile ranges; ref: SURVEY.md §2.3-N1). Instead of a 64-bit radix sort we:

1. argsort all N Gaussians by view depth once (invisible pushed to +inf),
2. expand each Gaussian to its touched tiles with ``jnp.repeat`` at a static
   duplicate capacity (depth order is preserved by the expansion),
3. one stable int32 sort by tile id — stability keeps entries depth-ordered
   within each tile, which is exactly the (tile, depth) lexicographic order
   the reference's radix sort produces,
4. per-tile [start, end) ranges via searchsorted.

All shapes are static; overflow of the duplicate capacity is reported so the
caller can re-jit with a bigger capacity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.project import Projected, tile_rect


class TileBins(NamedTuple):
    entry_gid: jnp.ndarray    # [D] original Gaussian index per sorted entry
    entry_valid: jnp.ndarray  # [D] bool
    tile_start: jnp.ndarray   # [T] int32
    tile_end: jnp.ndarray     # [T] int32
    num_duplicates: jnp.ndarray  # [] int32 — actual duplicates (pre-clamp)
    overflow: jnp.ndarray     # [] bool — true if capacity was exceeded


def tile_grid(width: int, height: int, tile_x: int, tile_y: int):
    gx = -(-width // tile_x)
    gy = -(-height // tile_y)
    return gx, gy


def bin_gaussians(proj: Projected, width: int, height: int,
                  tile_x: int, tile_y: int, capacity: int) -> TileBins:
    bins, _ = bin_gaussians_payload(proj, None, width, height,
                                    tile_x, tile_y, capacity)
    return bins


def bin_gaussians_payload(proj: Projected, payload, width: int, height: int,
                          tile_x: int, tile_y: int, capacity: int):
    """Binning that optionally carries per-gaussian ``payload`` [N, F] columns
    through the expansion and the tile sort, returning them per sorted entry
    [D, F]. Carrying the payload in the sort replaces the post-sort random
    row gather, which is ~25x slower than the sort itself on v5e (the
    expansion gather is monotone and streams).
    """
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    num_tiles = gx * gy
    n = proj.depth.shape[0]

    # 1. global depth order (stable; invisible last)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)                       # [N] stable
    mean2d_s = jnp.take(proj.mean2d, order, axis=0)
    radius_s = jnp.take(proj.radius, order, axis=0)
    visible_s = jnp.take(proj.visible, order, axis=0)

    # 2. tile spans in depth order
    rx0, ry0, rx1, ry1 = tile_rect(mean2d_s, radius_s, gx, gy, tile_x, tile_y)
    span_w = rx1 - rx0
    span_h = ry1 - ry0
    counts = jnp.where(visible_s, span_w * span_h, 0)
    total = jnp.sum(counts)

    # expansion: per-gaussian rows repeated by their touched-tile counts.
    # jnp.repeat on whole rows is the cheapest expansion on v5e (~24 ms at
    # 4.2M rows); index-array construction + row gathers measured ~3x more,
    # per-column scalar gathers ~7x.
    offsets = jnp.cumsum(counts) - counts                # exclusive
    table = jnp.stack([offsets, rx0, ry0, jnp.maximum(span_w, 1),
                       order.astype(jnp.int32)], axis=1)  # [N, 5]
    rows = jnp.repeat(table, counts, axis=0,
                      total_repeat_length=capacity)      # [D, 5]
    eidx = jnp.arange(capacity, dtype=jnp.int32)
    local = eidx - rows[:, 0]
    sw = rows[:, 3]
    t_col = rows[:, 1] + local % sw
    t_row = rows[:, 2] + local // sw
    tile_id = t_row * gx + t_col
    valid = eidx < total
    tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    # 3. stable sort by tile — entries stay depth-ordered within a tile;
    # payload columns ride along instead of being re-gathered afterwards
    if payload is not None:
        f = payload.shape[1]
        payload_s = jnp.take(payload, order, axis=0)     # [N, F]
        exp = jnp.repeat(payload_s, counts, axis=0,
                         total_repeat_length=capacity)   # [D, F]
        ops = jax.lax.sort((tile_key, rows[:, 4]) +
                           tuple(exp[:, i] for i in range(f)),
                           dimension=0, is_stable=True, num_keys=1)
        sorted_key, sorted_gid = ops[0], ops[1]
        sorted_payload = jnp.stack(ops[2:], axis=1)      # [D, F]
    else:
        sorted_key, sorted_gid = jax.lax.sort(
            (tile_key, rows[:, 4]), dimension=0, is_stable=True, num_keys=1)
        sorted_payload = None

    # 4. per-tile ranges
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_key, tiles, side='left').astype(jnp.int32)
    end = jnp.searchsorted(sorted_key, tiles + 1, side='left').astype(jnp.int32)

    bins = TileBins(
        entry_gid=sorted_gid,
        entry_valid=sorted_key < num_tiles,
        tile_start=start,
        tile_end=end,
        num_duplicates=total.astype(jnp.int32),
        overflow=total > capacity,
    )
    return bins, sorted_payload
