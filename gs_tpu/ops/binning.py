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

    # expansion: entry e belongs to depth-sorted gaussian rep[e]
    rep = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                     total_repeat_length=capacity)
    offsets = jnp.cumsum(counts) - counts                # exclusive
    eidx = jnp.arange(capacity, dtype=jnp.int32)
    local = eidx - offsets[rep]
    sw = jnp.maximum(span_w[rep], 1)
    t_col = rx0[rep] + local % sw
    t_row = ry0[rep] + local // sw
    tile_id = t_row * gx + t_col
    valid = eidx < total
    tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    # 3. stable sort by tile — entries stay depth-ordered within a tile
    gid = order[rep].astype(jnp.int32)
    sorted_key, sorted_gid = jax.lax.sort((tile_key, gid), dimension=0,
                                          is_stable=True, num_keys=1)

    # 4. per-tile ranges
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_key, tiles, side='left').astype(jnp.int32)
    end = jnp.searchsorted(sorted_key, tiles + 1, side='left').astype(jnp.int32)

    return TileBins(
        entry_gid=sorted_gid,
        entry_valid=sorted_key < num_tiles,
        tile_start=start,
        tile_end=end,
        num_duplicates=total.astype(jnp.int32),
        overflow=total > capacity,
    )


class AlignedBins(NamedTuple):
    """Chunk-aligned entry lists for the Pallas kernel: every tile's segment
    starts at a multiple of ``chunk`` so per-chunk DMA slices are aligned."""
    entry_gid: jnp.ndarray     # [DA] int32 (0 where invalid)
    entry_valid: jnp.ndarray   # [DA] bool
    tile_start: jnp.ndarray    # [T] int32, multiples of chunk
    tile_nchunks: jnp.ndarray  # [T] int32, clamped to max_chunks
    num_duplicates: jnp.ndarray
    max_tile_len: jnp.ndarray  # [] int32 (pre-clamp true max)
    overflow: jnp.ndarray      # [] bool


def bin_gaussians_aligned(proj: Projected, width: int, height: int,
                          tile_x: int, tile_y: int, capacity: int,
                          chunk: int, max_chunks: int) -> AlignedBins:
    """Binning with per-tile chunk alignment (for aligned HBM DMA on TPU).

    Entries stay depth-ordered within each tile; the gap slots introduced by
    rounding each tile's count up to a multiple of ``chunk`` are marked
    invalid. ``capacity`` is the size of the aligned entry array.

    Built entirely from sorts + gathers + searchsorted — no scatters, which
    serialize on TPU (measured 9x slowdown with the scatter formulation).
    """
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    num_tiles = gx * gy
    bins = bin_gaussians(proj, width, height, tile_x, tile_y, capacity)

    counts = bins.tile_end - bins.tile_start                  # [T]
    padded = ((counts + chunk - 1) // chunk) * chunk
    aligned_off = jnp.cumsum(padded) - padded                 # exclusive
    total_aligned = jnp.sum(padded)
    max_len = jnp.max(counts)

    # gather formulation: for every aligned slot find its tile, then its
    # source position in the sorted entry list
    d = bins.entry_gid.shape[0]
    slot = jnp.arange(capacity, dtype=jnp.int32)
    tile_of_slot = jnp.searchsorted(aligned_off, slot,
                                    side='right').astype(jnp.int32) - 1
    tile_of_slot = jnp.clip(tile_of_slot, 0, num_tiles - 1)
    local = slot - aligned_off[tile_of_slot]
    src = bins.tile_start[tile_of_slot] + local
    valid = (local < counts[tile_of_slot]) & (slot < total_aligned)
    gid = jnp.where(valid, bins.entry_gid[jnp.clip(src, 0, d - 1)], 0)

    nchunks = jnp.minimum((counts + chunk - 1) // chunk, max_chunks)
    # memory-safety clamp under overflow: never let a tile's chunk range read
    # past the aligned buffer (the overflow flag triggers a re-jit anyway)
    start_clamped = jnp.minimum(aligned_off, capacity - chunk)
    nchunks = jnp.minimum(nchunks,
                          jnp.maximum(capacity - start_clamped, 0) // chunk)
    return AlignedBins(
        entry_gid=gid,
        entry_valid=valid,
        tile_start=start_clamped.astype(jnp.int32),
        tile_nchunks=nchunks.astype(jnp.int32),
        num_duplicates=bins.num_duplicates,
        max_tile_len=max_len.astype(jnp.int32),
        overflow=(bins.overflow | (total_aligned > capacity) |
                  (max_len > max_chunks * chunk)),
    )
