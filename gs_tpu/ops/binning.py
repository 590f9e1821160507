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
    entry_gid: jnp.ndarray    # [D] original Gaussian index per sorted entry;
    # capacity-padding entries carry the sentinel N. Exact-culled entries
    # (entry_valid False) keep their REAL gid — required for the run-end
    # gradient segmentation, which re-sorts cotangents by gid and derives
    # window positions from the full per-gaussian counts.
    entry_valid: jnp.ndarray  # [D] bool
    tile_start: jnp.ndarray   # [T] int32
    tile_end: jnp.ndarray     # [T] int32
    num_duplicates: jnp.ndarray  # [] int32 — actual duplicates (pre-clamp)
    overflow: jnp.ndarray     # [] bool — true if capacity was exceeded
    gauss_counts: Optional[jnp.ndarray] = None  # [N] duplicates per gaussian
    # (ORIGINAL index order) — lets the gradient segment-sum derive run-end
    # positions directly instead of detecting boundaries + compacting
    num_valid: Optional[jnp.ndarray] = None  # [] int32 — entries surviving
    # the validity culls (exact_cull, column segments): the entries the
    # kernel actually composites — the per-device WORK diagnostic for the
    # multi-chip band balance (num_duplicates stays pre-cull: it is the
    # capacity/overflow accounting and must not depend on per-device culls)


def pack_bf16_pair(a, b):
    """Two f32 columns -> one f32-typed column carrying the bf16 pair.

    Pure bit transport: SAFE only through ops that never do float
    arithmetic on the column (row gathers, sorts). TPU arithmetic flushes
    denormals — a pair whose f32 interpretation is denormal (high half
    ~ 0 while the low half isn't) would be silently zeroed by any
    multiply/add, including the pallas expansion kernel's one-hot
    dot_general and GSPMD's select+psum lowering of partitioned gathers.
    bin_gaussians_payload(bf16_pairs=True) therefore packs AFTER the
    expansion in the pallas-expand branch, and callers must not feed
    packed columns through partitioned collectives."""
    pair = jnp.stack([a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)],
                     axis=-1)                              # [N, 2] bf16
    return jax.lax.bitcast_convert_type(pair, jnp.float32)  # [N]


def unpack_bf16_pair(x):
    pair = jax.lax.bitcast_convert_type(x, jnp.bfloat16)    # [D, 2]
    return pair[..., 0].astype(jnp.float32), pair[..., 1].astype(jnp.float32)


def tile_grid(width: int, height: int, tile_x: int, tile_y: int):
    gx = -(-width // tile_x)
    gy = -(-height // tile_y)
    return gx, gy


def bin_gaussians(proj: Projected, width: int, height: int,
                  tile_x: int, tile_y: int, capacity: int,
                  row_phase=0, row_stride: int = 1,
                  row_map=None, row_cumown=None,
                  col0_map=None, col1_map=None) -> TileBins:
    bins, _ = bin_gaussians_payload(proj, None, width, height,
                                    tile_x, tile_y, capacity,
                                    row_phase=row_phase,
                                    row_stride=row_stride,
                                    row_map=row_map, row_cumown=row_cumown,
                                    col0_map=col0_map, col1_map=col1_map)
    return bins


def bin_gaussians_payload(proj: Projected, payload, width: int, height: int,
                          tile_x: int, tile_y: int, capacity: int,
                          row_phase=0, row_stride: int = 1,
                          expand: str = "repeat",
                          expand_interpret: bool = False,
                          exact_cull: bool = False,
                          sort_gid: bool = True,
                          bf16_pairs: bool = False,
                          row_map=None, row_cumown=None,
                          col0_map=None, col1_map=None):
    """Binning that optionally carries per-gaussian ``payload`` [N, F] columns
    through the expansion and the tile sort, returning them per sorted entry
    as F separate [D] columns. Carrying the payload in the sort replaces the
    post-sort random row gather, which is ~25x slower than the sort itself on
    v5e (the expansion gather is monotone and streams).

    ``row_phase`` (traced ok) / ``row_stride`` (static): bin only the global
    tile rows phase + j*stride, j in [0, height/tile_y) — the interleaved
    multi-chip band assignment. Coordinates stay global; the tile ids emitted
    are LOCAL (j*gx + col).

    ``row_map`` (traced [gy_local] int32, ASCENDING global tile rows) with
    ``row_cumown`` (traced [gy_global + 1] int32, exclusive prefix count of
    owned rows): bin an ARBITRARY set of global tile rows — the
    cost-balanced multi-chip band assignment (parallel/render_mc.py). Local
    tile row j renders global row row_map[j]. Overrides phase/stride.

    ``col0_map``/``col1_map`` ([gy_local] int32, traced, with row_map):
    local tile row j additionally owns only global tile columns
    [col0_map[j], col1_map[j]) — sub-row column-segment band splitting.
    Entries outside the owned segment are culled like exact_cull (they
    sort to the sentinel tail with their true gid); counts/offsets — and
    therefore capacity accounting and gradient run windows — are
    unaffected.

    ``expand``: "repeat" (XLA jnp.repeat row expansion) or "pallas" (the
    block one-hot MXU expansion kernel, ops/expand_pallas.py — requires
    payload, F <= 10, and capacity a multiple of its BLOCK).

    ``exact_cull``: additionally mark expanded entries whose TILE the
    gaussian cannot actually reach (alpha < 1/255 at every point of the
    tile rect) as invalid before the tile sort. The expansion is over the
    cull bbox, whose corner tiles (~20% of entries on isotropic scenes,
    far more on heavy-tailed ones) the ellipse never touches; those
    entries sort to the sentinel tail, shrinking every per-tile range and
    max_tile_len while leaving counts/offsets — and therefore the
    gradient run-end segmentation — untouched. Exact: the minimum of the
    conic quadratic over the (1px-dilated) tile rect is closed-form
    (interior => 0, else min over the four clamped edge minimizers), and
    q_min > 2 ln(255 op) is precisely the kernel's alpha >= 1/255 skip
    mask never passing. Requires payload (packet layout of
    rasterize_jnp.pack_projected: x, y, conic_a/b/c, opacity in cols 0-5).
    """
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    num_tiles = gx * gy
    n = proj.depth.shape[0]

    # 1. tile spans + duplicate counts, PRE-SORT (all elementwise).
    # Binning uses the opacity-aware cull bbox when the preprocess provides
    # it (exact: beyond it alpha < 1/255 at every pixel — core/project.py).
    if proj.radius_cull is not None:
        rcull = proj.radius_cull
    else:
        rcull = jnp.stack([proj.radius, proj.radius], axis=1)
    radius_x = rcull[:, 0].astype(jnp.int32)
    radius_y = rcull[:, 1].astype(jnp.int32)
    visible0 = proj.visible & (radius_x > 0) & (radius_y > 0)
    if row_map is not None:
        # arbitrary owned-row set: rect rows remap through the ownership
        # prefix table. "ry0" becomes the LOCAL starting row index j0 (the
        # rect's first owned row's position in this device's ascending row
        # list) and the row count is the number of owned rows in the rect —
        # the expansion's local // sw then enumerates owned rows directly.
        gy_glob = row_cumown.shape[0] - 1
        rx0, gy0, rx1, gy1 = tile_rect(proj.mean2d, radius_x, gx, gy_glob,
                                       tile_x, tile_y, radius_y=radius_y)
        j0 = row_cumown[gy0]                           # [N] tiny-table gather
        ry0 = j0
        ry1 = row_cumown[gy1]                          # j0 + owned rows
    elif row_stride == 1:
        rx0, ry0, rx1, ry1 = tile_rect(proj.mean2d, radius_x, gx, gy,
                                       tile_x, tile_y, radius_y=radius_y)
    else:
        # global rect rows, then remap to this device's interleaved rows
        # (global row = phase + j*stride): the owned rows inside
        # [gy0, gy1) form the LOCAL range [ceil((gy0-phase)/stride),
        # floor((gy1-1-phase)/stride)+1)
        gy_glob = gy * row_stride
        rx0, gy0, rx1, gy1 = tile_rect(proj.mean2d, radius_x, gx, gy_glob,
                                       tile_x, tile_y, radius_y=radius_y)
        phase = jnp.asarray(row_phase, jnp.int32)
        ry0 = jnp.clip((gy0 - phase + row_stride - 1) // row_stride, 0, gy)
        ry1 = jnp.clip((gy1 - 1 - phase) // row_stride + 1, 0, gy)
        ry1 = jnp.maximum(ry1, ry0)
    counts0 = jnp.where(visible0, (rx1 - rx0) * (ry1 - ry0), 0)

    # 2. global depth order. Gaussians producing NO entries (invisible, zero
    # radius, or empty local rect) sort to the END — this makes offsets
    # strictly increasing over the active prefix, which the pallas expansion
    # kernel relies on to bound its per-block source window (a B-entry block
    # then spans <= B gaussians). Entry output is unchanged: zero-count
    # gaussians never produced entries anyway.
    depth_key = jnp.where(counts0 > 0, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)                       # [N] stable
    if bf16_pairs and expand != "pallas":
        # rgb+invdepth (packet cols 6-9) as two bf16-pair columns through
        # the depth gather, the repeat expansion and the sort — all pure
        # row movement. The pallas-expand branch must NOT pre-pack: its
        # one-hot dot_general is float arithmetic and would flush
        # denormal-patterned pairs to zero (it packs post-expansion below).
        assert payload is not None and payload.shape[1] == 10, \
            "bf16_pairs expects the 10-column pack_projected packet"
        payload = jnp.concatenate(
            [payload[:, :6],
             pack_bf16_pair(payload[:, 6], payload[:, 7])[:, None],
             pack_bf16_pair(payload[:, 8], payload[:, 9])[:, None]], axis=1)
    # ONE packed gather by `order` replaces 4-5 separate ones (each random
    # [N]-row gather costs ~ the same regardless of width). Int columns
    # ride as f32 VALUES (exact below 2^24) — NOT bitcast patterns: under
    # GSPMD a partitioned gather can lower to select+psum, and TPU
    # arithmetic flushes denormals, zeroing bitcast small-int payloads.
    geom = jnp.concatenate([
        counts0.astype(jnp.float32)[:, None],                   # 0
        rx0.astype(jnp.float32)[:, None],                       # 1
        ry0.astype(jnp.float32)[:, None],                       # 2
        jnp.maximum(rx1 - rx0, 1).astype(jnp.float32)[:, None],  # 3
    ] + ([payload] if payload is not None else []), axis=1)     # 4:
    geom_s = jnp.take(geom, order, axis=0)               # [N, 4(+F)]
    counts = geom_s[:, 0].astype(jnp.int32)
    total = jnp.sum(counts)
    offsets = jnp.cumsum(counts) - counts                # exclusive

    assert capacity < (1 << 24), "f32 exact-int range (offsets)"
    assert n < (1 << 24), \
        "f32 exact-int range (gids): >16.7M gaussians would silently " \
        "round entry ids, corrupting kernel routing and gradient " \
        "segmentation — shard over a mesh instead"

    # 3. expansion: per-gaussian rows repeated by their touched-tile counts.
    f = payload.shape[1] if payload is not None else 0
    eidx = jnp.arange(capacity, dtype=jnp.int32)
    if expand == "pallas":
        from .expand_pallas import BLOCK, ROWS, expand_rows
        assert payload is not None and f <= ROWS - 6, \
            f"pallas expansion carries at most {ROWS - 6} payload columns"
        assert capacity % BLOCK == 0, \
            f"pallas expansion needs capacity % {BLOCK} == 0"
        comb16 = jnp.stack(
            [offsets.astype(jnp.float32),                     # 0 offsets
             geom_s[:, 0],                                    # 1 counts
             geom_s[:, 1],                                    # 2 rx0
             geom_s[:, 2],                                    # 3 ry0
             geom_s[:, 3],                                    # 4 sw (>=1)
             order.astype(jnp.float32)]                       # 5 gid
            + [geom_s[:, 4 + i] for i in range(f)]
            + [jnp.zeros((n,), jnp.float32)] * (ROWS - 6 - f),
            axis=0)                                      # [16, N]
        out16 = expand_rows(comb16, offsets, capacity,
                            interpret=expand_interpret)  # [16, D]
        off_e = out16[0].astype(jnp.int32)
        rx0_e = out16[2].astype(jnp.int32)
        ry0_e = out16[3].astype(jnp.int32)
        # zero rows (entries past the total) come out sw=0 — clamp for the
        # div/mod below; `valid` masks their tile ids to the sentinel
        sw_e = jnp.maximum(out16[4].astype(jnp.int32), 1)
        gid_e = out16[5].astype(jnp.int32)
        exp_cols = tuple(out16[6 + i] for i in range(f))  # F x [D] rows
        if bf16_pairs:
            # pack AFTER the one-hot matmul (see above): the packed bit
            # patterns then only ever ride the sort, which moves rows
            # without arithmetic. Elementwise [D] packing fuses into the
            # sort-operand production (CLAUDE.md rule 5).
            assert f == 10, "bf16_pairs expects the 10-column packet"
            exp_cols = exp_cols[:6] + (
                pack_bf16_pair(exp_cols[6], exp_cols[7]),
                pack_bf16_pair(exp_cols[8], exp_cols[9]))
    else:
        # jnp.repeat on whole rows is a monotone row gather; ONE fused
        # repeat of the int table (as exact f32) plus the payload halves
        # the expansion traffic vs two separate repeats (measured
        # 22 + 27 ms -> ~30 ms at 4.2M rows).
        table = jnp.stack(
            [offsets.astype(jnp.float32), geom_s[:, 1], geom_s[:, 2],
             geom_s[:, 3], order.astype(jnp.float32)], axis=1)  # [N, 5]
        if payload is not None:
            comb = jnp.concatenate([table, geom_s[:, 4:]], axis=1)
            comb_rows = jnp.repeat(comb, counts, axis=0,
                                   total_repeat_length=capacity)  # [D, 5+F]
            exp_cols = tuple(comb_rows[:, 5 + i] for i in range(f))
        else:
            comb_rows = jnp.repeat(table, counts, axis=0,
                                   total_repeat_length=capacity)
            exp_cols = None
        rows = comb_rows[:, :5].astype(jnp.int32)
        off_e, rx0_e, ry0_e, sw_e, gid_e = (rows[:, 0], rows[:, 1],
                                            rows[:, 2], rows[:, 3],
                                            rows[:, 4])
    local = eidx - off_e
    t_col = rx0_e + local % sw_e
    t_row = ry0_e + local // sw_e
    tile_id = t_row * gx + t_col
    valid = eidx < total
    if col0_map is not None:
        # sub-row column-segment ownership (multi-chip split rows,
        # parallel/render_mc.py): local tile row j owns only global tile
        # columns [col0_map[j], col1_map[j]) — entries outside belong to
        # another device's segment of the same global row. Culled exactly
        # like exact_cull below: sentinel tile_key, TRUE gid kept (zero
        # cotangents; run-end windows stay aligned). Expansion/counts are
        # untouched, so capacity accounting stays device-independent.
        c0e = col0_map.astype(jnp.int32).at[t_row].get(mode='clip')
        c1e = col1_map.astype(jnp.int32).at[t_row].get(mode='clip')
        valid = valid & (t_col >= c0e) & (t_col < c1e)
    if exact_cull:
        assert payload is not None, "exact_cull needs the packet payload"
        # per-entry exact tile-reach test on flat [D] channels (fuses into
        # the sort-operand production). Packet cols: 0 x, 1 y, 2 conic_a,
        # 3 conic_b, 4 conic_c, 5 opacity (rasterize_jnp.pack_projected).
        ex, ey = exp_cols[0], exp_cols[1]
        ca = exp_cols[2] + 1e-20
        cb = exp_cols[3]
        cc = exp_cols[4] + 1e-20
        # alpha >= 1/255 anywhere in the tile iff min over the rect of
        # q = ca dx^2 + 2 cb dx dy + cc dy^2 is <= 2 ln(255 op) — the same
        # ellipse radius_cull bounds per-axis (core/project.py:300-316);
        # +-1 px dilation mirrors its rounding guard
        two_l = 2.0 * jnp.log(jnp.maximum(255.0 * exp_cols[5], 1.0))
        if row_map is not None:
            # local -> global row via the traced map (tiny-table gather;
            # junk rows on padding entries clip harmlessly — they are
            # already invalid)
            grow = row_map.astype(jnp.int32).at[t_row].get(mode='clip')
        else:
            grow = t_row * row_stride + jnp.asarray(row_phase, jnp.int32)
        dx0 = (t_col * tile_x - 1).astype(jnp.float32) - ex
        dx1 = (t_col * tile_x + tile_x).astype(jnp.float32) - ex
        dy0 = (grow * tile_y - 1).astype(jnp.float32) - ey
        dy1 = (grow * tile_y + tile_y).astype(jnp.float32) - ey

        def _q(dx, dy):
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        # rect minimum of the PSD quadratic: 0 at the interior stationary
        # point (the mean), else attained on an edge, where the 1D
        # minimizer clamps to the segment
        cx0 = jnp.clip(-cb * dy0 / ca, dx0, dx1)
        cx1 = jnp.clip(-cb * dy1 / ca, dx0, dx1)
        cy0 = jnp.clip(-cb * dx0 / cc, dy0, dy1)
        cy1 = jnp.clip(-cb * dx1 / cc, dy0, dy1)
        qmin = jnp.minimum(jnp.minimum(_q(cx0, dy0), _q(cx1, dy1)),
                           jnp.minimum(_q(dx0, cy0), _q(dx1, cy1)))
        inside = (dx0 <= 0) & (dx1 >= 0) & (dy0 <= 0) & (dy1 >= 0)
        qmin = jnp.where(inside, 0.0, qmin)
        # cull only on a CONFIDENT miss (relative margin absorbs the
        # kernel's different operation order); NaN compares false => kept
        culled = qmin > two_l * (1.0 + 1e-4) + 1e-3
        valid = valid & ~culled
    tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    # capacity-padding entries carry junk gids from the expansion fill —
    # sentinel them HERE (not downstream) so exact-culled entries can keep
    # their TRUE gid: they carry exactly-zero cotangents (no tile range
    # ever covers the sentinel region), and with the real gid they sort
    # back into their gaussian's run in the backward, keeping the run-end
    # windows derived from cumsum(gauss_counts) aligned. Sentineling them
    # instead would shift every later gaussian's window (the same damage
    # mode as capacity overflow).
    gid_e = jnp.where(eidx < total, gid_e, n)

    # 3. stable sort by tile — entries stay depth-ordered within a tile;
    # payload columns ride along instead of being re-gathered afterwards
    # (the 12-operand stable sort measures ~9.5 ms at 4.2M rows on v5e —
    # the sort is NOT the expensive part of binning)
    if payload is not None and not sort_gid:
        # forward-only callers (viewer/eval, no grads): entry gids are
        # consumed ONLY by the backward gradient fold — dropping the gid
        # operand from the sort saves ~3 ms/operand at D=4M on v5e
        # (ROADMAP r4 calibration). Stable sort on identical keys yields the
        # identical permutation, so payload outputs are bitwise unchanged.
        ops = jax.lax.sort((tile_key,) + exp_cols,
                           dimension=0, is_stable=True, num_keys=1)
        sorted_key = ops[0]
        sorted_gid = jnp.zeros_like(tile_key)            # poisoned: fwd-only
        sorted_cols = tuple(ops[1:])
    elif payload is not None:
        ops = jax.lax.sort((tile_key, gid_e) + exp_cols,
                           dimension=0, is_stable=True, num_keys=1)
        sorted_key, sorted_gid = ops[0], ops[1]
        sorted_cols = tuple(ops[2:])                     # F x [D] (SoA —
        # stacking to [D, F] here measured ~10x the sort cost; callers keep
        # columns separate and stack along axis 0 where a [F, D] layout is
        # the target)
    else:
        sorted_key, sorted_gid = jax.lax.sort(
            (tile_key, gid_e), dimension=0, is_stable=True, num_keys=1)
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
        num_valid=jnp.sum((sorted_key < num_tiles).astype(jnp.int32)),
    )
    return bins, sorted_cols
