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

from typing import NamedTuple, Optional

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
    gauss_counts: Optional[jnp.ndarray] = None  # [N] duplicates per gaussian
    # (ORIGINAL index order) — lets the gradient segment-sum derive run-end
    # positions directly instead of detecting boundaries + compacting


def tile_grid(width: int, height: int, tile_x: int, tile_y: int):
    gx = -(-width // tile_x)
    gy = -(-height // tile_y)
    return gx, gy


def bin_gaussians(proj: Projected, width: int, height: int,
                  tile_x: int, tile_y: int, capacity: int,
                  row_phase=0, row_stride: int = 1) -> TileBins:
    bins, _ = bin_gaussians_payload(proj, None, width, height,
                                    tile_x, tile_y, capacity,
                                    row_phase=row_phase,
                                    row_stride=row_stride)
    return bins


def bin_gaussians_payload(proj: Projected, payload, width: int, height: int,
                          tile_x: int, tile_y: int, capacity: int,
                          row_phase=0, row_stride: int = 1):
    """Binning that optionally carries per-gaussian ``payload`` [N, F] columns
    through the expansion and the tile sort, returning them per sorted entry
    as F separate [D] columns. Carrying the payload in the sort replaces the
    post-sort random row gather, which is ~25x slower than the sort itself on
    v5e (the expansion gather is monotone and streams).

    ``row_phase`` (traced ok) / ``row_stride`` (static): bin only the global
    tile rows phase + j*stride, j in [0, height/tile_y) — the interleaved
    multi-chip band assignment. Coordinates stay global; the tile ids emitted
    are LOCAL (j*gx + col).
    """
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    num_tiles = gx * gy
    n = proj.depth.shape[0]

    # 1. global depth order (stable; invisible last)
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)                       # [N] stable
    # bin at the opacity-aware cull bbox when the preprocess provides it
    # (exact: beyond it alpha < 1/255 at every pixel — see core/project.py).
    # ONE packed gather by `order` replaces 4-5 separate ones (each random
    # [N]-row gather costs ~ the same regardless of width).
    if proj.radius_cull is not None:
        rcull = proj.radius_cull
    else:
        rcull = jnp.stack([proj.radius, proj.radius], axis=1)
    # radii ride as f32 VALUES (exact below 2^24) — NOT bitcast patterns:
    # under GSPMD a partitioned gather can lower to select+psum, and TPU
    # arithmetic flushes denormals, zeroing bitcast small-int payloads
    geom = jnp.concatenate([
        proj.mean2d,                                            # 0:2
        rcull.astype(jnp.float32),                              # 2:4
        proj.visible.astype(jnp.float32)[:, None],              # 4
    ] + ([payload] if payload is not None else []), axis=1)     # 5:
    geom_s = jnp.take(geom, order, axis=0)               # [N, 5(+F)]
    mean2d_s = geom_s[:, 0:2]
    radius_sx = geom_s[:, 2].astype(jnp.int32)
    radius_sy = geom_s[:, 3].astype(jnp.int32)
    visible_s = (geom_s[:, 4] > 0.5) & (radius_sx > 0) & (radius_sy > 0)

    # 2. tile spans in depth order
    if row_stride == 1:
        rx0, ry0, rx1, ry1 = tile_rect(mean2d_s, radius_sx, gx, gy,
                                       tile_x, tile_y, radius_y=radius_sy)
    else:
        # global rect rows, then remap to this device's interleaved rows
        # (global row = phase + j*stride): the owned rows inside
        # [gy0, gy1) form the LOCAL range [ceil((gy0-phase)/stride),
        # floor((gy1-1-phase)/stride)+1)
        gy_glob = gy * row_stride
        rx0, gy0, rx1, gy1 = tile_rect(mean2d_s, radius_sx, gx, gy_glob,
                                       tile_x, tile_y, radius_y=radius_sy)
        phase = jnp.asarray(row_phase, jnp.int32)
        ry0 = jnp.clip((gy0 - phase + row_stride - 1) // row_stride, 0, gy)
        ry1 = jnp.clip((gy1 - 1 - phase) // row_stride + 1, 0, gy)
        ry1 = jnp.maximum(ry1, ry0)
    span_w = rx1 - rx0
    span_h = ry1 - ry0
    counts = jnp.where(visible_s, span_w * span_h, 0)
    total = jnp.sum(counts)

    # expansion: per-gaussian rows repeated by their touched-tile counts.
    # jnp.repeat on whole rows is the cheapest expansion on v5e (a monotone
    # row gather); ONE fused repeat of the int table (bitcast to f32) plus
    # the payload halves the expansion traffic vs two separate repeats
    # (measured 22 + 27 ms -> ~30 ms at 4.2M rows).
    offsets = jnp.cumsum(counts) - counts                # exclusive
    table = jnp.stack([offsets, rx0, ry0, jnp.maximum(span_w, 1),
                       order.astype(jnp.int32)], axis=1)  # [N, 5] i32
    if payload is not None:
        f = payload.shape[1]
        payload_s = geom_s[:, 5:]                        # [N, F] (pre-packed)
        # int columns ride as f32 VALUES — exact below 2^24 (offsets <
        # capacity, ids < N) and immune to the denormal-flush hazard that
        # bitcast patterns have under GSPMD-partitioned gathers
        assert capacity < (1 << 24), "f32 exact-int range (offsets)"
        assert n < (1 << 24), \
            "f32 exact-int range (gids): >16.7M gaussians would silently " \
            "round entry ids, corrupting kernel routing and gradient " \
            "segmentation — shard over a mesh instead"
        comb = jnp.concatenate(
            [table.astype(jnp.float32), payload_s], axis=1)  # [N, 5+F]
        comb_rows = jnp.repeat(comb, counts, axis=0,
                               total_repeat_length=capacity)  # [D, 5+F]
        rows = comb_rows[:, :5].astype(jnp.int32)
        exp = comb_rows[:, 5:]                           # [D, F]
    else:
        rows = jnp.repeat(table, counts, axis=0,
                          total_repeat_length=capacity)  # [D, 5]
        exp = None
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
    # (the 12-operand stable sort measures ~9.5 ms at 4.2M rows on v5e —
    # the sort is NOT the expensive part of binning)
    if payload is not None:
        ops = jax.lax.sort((tile_key, rows[:, 4]) +
                           tuple(exp[:, i] for i in range(f)),
                           dimension=0, is_stable=True, num_keys=1)
        sorted_key, sorted_gid = ops[0], ops[1]
        sorted_cols = tuple(ops[2:])                     # F x [D] (SoA —
        # stacking to [D, F] here measured ~10x the sort cost; callers keep
        # columns separate and stack along axis 0 where a [F, D] layout is
        # the target)
    else:
        sorted_key, sorted_gid = jax.lax.sort(
            (tile_key, rows[:, 4]), dimension=0, is_stable=True, num_keys=1)
        sorted_cols = None

    # 4. per-tile ranges
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_key, tiles, side='left').astype(jnp.int32)
    end = jnp.searchsorted(sorted_key, tiles + 1, side='left').astype(jnp.int32)

    # counts back in ORIGINAL index order (2-operand sort at N — cheap)
    counts_orig = jax.lax.sort(
        (order.astype(jnp.int32), counts.astype(jnp.int32)),
        dimension=0, num_keys=1)[1]

    bins = TileBins(
        entry_gid=sorted_gid,
        entry_valid=sorted_key < num_tiles,
        tile_start=start,
        tile_end=end,
        num_duplicates=total.astype(jnp.int32),
        overflow=total > capacity,
        gauss_counts=counts_orig,
    )
    return bins, sorted_cols
