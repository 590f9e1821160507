"""Multi-chip rendering: gaussians sharded over the mesh, tiles banded.

The scaling design the single-GPU reference lacks (ref: SURVEY.md §2.4 — "no
multi-GPU of any kind"; BASELINE.json north star): under ``shard_map``,

  1. each device preprocesses ITS shard of the gaussians (EWA projection,
     SH shading) — embarrassingly parallel over the ``gauss`` axis,
  2. the per-gaussian screen-space packets are compacted to the VISIBLE
     prefix (a fixed ``visible_capacity`` buffer per device, overflow-
     flagged like the binning capacities) and ``all_gather``ed over ICI —
     60 B/visible gaussian, the culled working set, not the parameters
     (SURVEY §5 "all-gather of the culled working set"; with
     ``visible_capacity=0`` the full capacity-padded shard is gathered),
  3. each device bins and rasterizes an INTERLEAVED set of tile rows
     (device d owns global tile rows d, d+k, d+2k, ... — adjacent image
     rows differ little in splat load, so sky-vs-ground scenes stay
     balanced where contiguous bands imbalance 3x+; the kernel takes the
     (phase, stride) row mapping and keeps packet coordinates global),
  4. the row groups are all-gathered and re-interleaved into the full
     frame; in the backward pass XLA transposes that to a slice and
     transposes the packet all-gather into a reduce-scatter — per-gaussian
     gradients arrive pre-sharded on their owner device with no manual
     collective code.

Densification/optimizer state stay sharded on ``gauss`` (parallel/mesh.py);
this module only parallelizes the render/backward sweep.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..core.project import Projected, preprocess, tile_rect
from ..ops.binning import tile_grid
from ..render import RenderOutput, render_projected
from .mesh import GAUSS_AXIS


def _row_costs(proj, gx, gy_glob, tile_x, tile_y):
    """Per-global-tile-row duplicate cost of this shard's gaussians.

    cost[r] = sum over gaussians whose cull rect covers row r of the rect
    width — exactly the entries row r contributes to binning. Computed with
    two tiny 2-op sorts + cumsum + a gy-query searchsorted (a scatter-add
    histogram would serialize; gy is tiny so the searchsorted is cheap)."""
    if proj.radius_cull is not None:
        rcull = proj.radius_cull
    else:
        rcull = jnp.stack([proj.radius, proj.radius], axis=1)
    rx_ = rcull[:, 0].astype(jnp.int32)
    ry_ = rcull[:, 1].astype(jnp.int32)
    rx0, gy0, rx1, gy1 = tile_rect(proj.mean2d, rx_, gx, gy_glob,
                                   tile_x, tile_y, radius_y=ry_)
    vis = proj.visible & (rx_ > 0) & (ry_ > 0)
    w = jnp.where(vis & (gy1 > gy0), (rx1 - rx0).astype(jnp.float32), 0.0)
    rows = jnp.arange(gy_glob, dtype=jnp.int32)

    def prefix_at(keys, rq):
        ks, ws = jax.lax.sort((keys, w), dimension=0, num_keys=1)
        cw = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(ws)])
        return cw[jnp.searchsorted(ks, rq, side='right')]

    # covers r  <=>  gy0 <= r  and  not (gy1 <= r)
    return prefix_at(gy0, rows) - prefix_at(gy1, rows)


def _heavy_col_costs(proj, heavy, gx, gy_glob, tile_x, tile_y):
    """Per-tile-column duplicate cost of this shard's gaussians restricted
    to each heavy row — colcosts[h, c] = number of this shard's entries
    that land in (row heavy[h], column c). Same prefix-sum-of-sorted-
    boundaries trick as _row_costs (a scatter-add histogram would
    serialize); heavy is a tiny static-H traced index vector."""
    if proj.radius_cull is not None:
        rcull = proj.radius_cull
    else:
        rcull = jnp.stack([proj.radius, proj.radius], axis=1)
    rx_ = rcull[:, 0].astype(jnp.int32)
    ry_ = rcull[:, 1].astype(jnp.int32)
    rx0, gy0, rx1, gy1 = tile_rect(proj.mean2d, rx_, gx, gy_glob,
                                   tile_x, tile_y, radius_y=ry_)
    vis = proj.visible & (rx_ > 0) & (ry_ > 0) & (gy1 > gy0) & (rx1 > rx0)
    cols = jnp.arange(gx, dtype=jnp.int32)

    def one_row(r):
        w = jnp.where(vis & (gy0 <= r) & (r < gy1), 1.0, 0.0)

        def prefix_at(keys, cq):
            ks, ws = jax.lax.sort((keys, w), dimension=0, num_keys=1)
            cw = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                  jnp.cumsum(ws)])
            return cw[jnp.searchsorted(ks, cq, side='right')]

        # covers column c  <=>  rx0 <= c  and  not (rx1 <= c)
        return prefix_at(rx0, cols) - prefix_at(rx1, cols)

    return jax.vmap(one_row)(heavy)                    # [H, gx]


def _assign_bands_split(cost, heavy, colcosts, k, B, H, gx):
    """Cost-balanced band assignment with the H heaviest rows split by
    columns across ALL devices (sub-row splitting — the only way below the
    one-row partition floor of the plain snake deal).

    The non-heavy rows are snake-dealt exactly like _snake_row_map; each
    heavy row h is given to every device d with the tile-column segment
    [qb[h,d], qb[h,d+1]) holding ~1/k of that row's entry load (quantiles
    of the psum'd per-column cost). Returns ALL devices' maps — the
    reassembly needs every device's (row, column-range) list and the
    assignment is replicated (derived from psum'd costs):
    rows [k, B+H] ascending per device, col0/col1 [k, B+H]."""
    gyp = cost.shape[0]                               # k*B + H padded rows
    kB = k * B
    # heavy rows leave the deal: real rows have cost >= 0, so -1 sorts
    # them (and only them) to the very end of the descending order
    cost2 = cost.at[heavy].set(-1.0)
    order = jnp.argsort(-cost2)                       # [gyp]
    dealt = order[:kB]
    pos = jnp.arange(kB, dtype=jnp.int32)
    rnd, rin = pos // k, pos % k
    dev_sorted = jnp.where(rnd % 2 == 0, rin, k - 1 - rin)
    _, rows_grouped = jax.lax.sort(
        (dev_sorted * gyp + dealt, dealt), dimension=0, num_keys=1)
    rows_all = rows_grouped.reshape(k, B)
    # per-heavy-row column quantile boundaries: device d owns columns
    # [qb[d], qb[d+1]) — searchsorted on the cumulative column cost puts
    # ~total/k entry load in each segment; boundaries are monotone in d,
    # so the segments partition [0, gx) exactly
    cums = jnp.cumsum(colcosts, axis=1)               # [H, gx]
    total = cums[:, -1:]
    targets = (jnp.arange(k, dtype=jnp.float32)[None, :] * total) / k
    qb = jax.vmap(lambda cu, tg: jnp.searchsorted(cu, tg, side='left'))(
        cums, targets).astype(jnp.int32)              # [H, k]
    qb = jnp.concatenate([qb, jnp.full((qb.shape[0], 1), gx, jnp.int32)],
                         axis=1)                      # [H, k+1]
    rows_dev = jnp.concatenate(
        [rows_all, jnp.broadcast_to(heavy[None, :], (k, H))], axis=1)
    c0_dev = jnp.concatenate(
        [jnp.zeros((k, B), jnp.int32), qb[:, :k].T], axis=1)
    c1_dev = jnp.concatenate(
        [jnp.full((k, B), gx, jnp.int32), qb[:, 1:].T], axis=1)
    perm = jnp.argsort(rows_dev, axis=1)              # ascending row lists
    rows_dev = jnp.take_along_axis(rows_dev, perm, axis=1)
    c0_dev = jnp.take_along_axis(c0_dev, perm, axis=1)
    c1_dev = jnp.take_along_axis(c1_dev, perm, axis=1)
    return rows_dev, c0_dev, c1_dev


def _snake_row_map(cost, k, band_rows, me):
    """Deal the gy rows to k devices by descending cost in snake order
    (LPT-style); returns this device's ascending global-row list and the
    exclusive owned-row prefix table.

    Exact balance is NP-hard; the snake on sorted costs bounds the max
    band at (sum/k + max_row_cost) and measured <1.2x on centered scenes
    where strided rows hit 2.5x (MULTICHIP_r03)."""
    gy_glob = cost.shape[0]
    order = jnp.argsort(-cost)                        # rows by cost desc
    pos = jnp.arange(gy_glob, dtype=jnp.int32)
    rnd, rin = pos // k, pos % k
    dev_sorted = jnp.where(rnd % 2 == 0, rin, k - 1 - rin)
    dev_of_row = jnp.zeros((gy_glob,), jnp.int32).at[order].set(dev_sorted)
    # rows grouped by device, ascending within each (tiny 2-op sort)
    _, rows_grouped = jax.lax.sort(
        (dev_of_row * gy_glob + pos, pos), dimension=0, num_keys=1)
    row_map = jax.lax.dynamic_slice(rows_grouped, (me * band_rows,),
                                    (band_rows,))
    own = jnp.zeros((gy_glob,), jnp.int32).at[row_map].set(1)
    cumown = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(own)])
    return row_map, cumown


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _compact_rows(x, idx, inv, vcap: int):
    """Prefix-compaction gather ``x[idx]`` with a GATHER-based VJP.

    ``idx`` [vcap] are unique row ids (the visible-first permutation
    prefix); ``inv`` [n] is each row's position in that permutation.
    Autodiff's transpose of the gather is a scatter-add, which serializes
    on TPU (ops/segment.py header: 303 ms for a few M rows on v5e); because
    the permutation is injective the exact cotangent is itself a gather:
    row r receives ct[inv[r]] if it was kept, else 0."""
    return x[idx]


def _compact_fwd(x, idx, inv, vcap):
    return x[idx], (inv,)


def _compact_bwd(vcap, res, ct):
    (inv,) = res
    ctz = jnp.concatenate([ct, jnp.zeros((1, ct.shape[1]), ct.dtype)])
    return ctz[jnp.minimum(inv, vcap)], None, None


_compact_rows.defvjp(_compact_fwd, _compact_bwd)


def render_multichip(params: GaussianParams, camera: Camera, bg: jnp.ndarray,
                     mesh: Mesh, *, active_sh_degree: int,
                     antialiasing: bool = False,
                     alive: Optional[jnp.ndarray] = None,
                     mean2d_tap: Optional[jnp.ndarray] = None,
                     backend: str = "pallas",
                     dup_capacity: int = 1 << 18,
                     max_per_tile: int = 1024,
                     chunk: int = 64,
                     packed_sh_degree: Optional[int] = None,
                     visible_capacity: int = 0,
                     band_assign: str = "cost",
                     split_rows: int = 0) -> RenderOutput:
    """Render one view with gaussians sharded over ``mesh`` (axis 'gauss').

    ``dup_capacity`` is PER DEVICE (each band bins only the entries that
    touch it). ``mean2d_tap`` is the densification gradient tap added to the
    sharded screen-space means. Returns a replicated image and per-gaussian
    stats sharded like the parameters.

    ``packed_sh_degree``: when set, ``params`` is the channel-major packed
    [R, C] block (core/packed.py, sharded on axis 1) of that SH degree and
    each device preprocesses its column shard via ``preprocess_packed`` —
    the training-hot-path layout under the mesh. SH-degree masking
    (mask_sh_rows) happens OUTSIDE (elementwise, sharding-preserving),
    exactly like mask_sh_rest on the tree path.

    ``visible_capacity``: per-device static cap on packets entering the
    collective. Each device sorts its shard visible-first and gathers only
    the first ``visible_capacity`` rows — O(visible) ICI traffic instead of
    O(capacity) (dead padded slots dominate real capacities). If a shard
    has more visible gaussians than the cap, ``overflow`` is raised (same
    contract as the binning capacities: the trainer grows + replays).
    0 disables compaction (full-capacity gather, round-3 behavior).

    ``band_assign``: "cost" (default) deals global tile rows to devices by
    descending per-row duplicate cost in snake order, recomputed every
    frame from the projected rects; "stride" is the fixed interleaved
    assignment (device d owns rows d, d+k, ...).

    ``split_rows`` (static H, with band_assign="cost"): additionally split
    the H heaviest tile rows by COLUMNS across all k devices (each owns a
    per-row cost quantile of its tile columns) — the only way below the
    one-row partition floor of whole-row assignment when the load
    concentrates in very few rows. Every device expands the full width of
    a split row (entries outside its column segment are culled at binning,
    like exact_cull), so H extra local rows + the heavy rows' full-width
    expansion is the per-device overhead; keep H small (1-2).
    """
    k = mesh.devices.size
    width, height = camera.width, camera.height
    tile_x = tile_y = 16
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    split = int(split_rows) if band_assign == "cost" and k > 1 else 0
    split = min(split, max(gy - 1, 0))
    if split:
        # every device carries B dealt rows + all H heavy rows; padded
        # global row count k*B + H >= gy so the deal covers every real row
        B = -(-(gy - split) // k)
        gy_pad = k * B + split
        band_rows = B + split
    else:
        gy_pad = -(-gy // k) * k
        band_rows = gy_pad // k
    band_h = band_rows * tile_y

    gspec = P(GAUSS_AXIS)
    rspec = P()
    pspec = P(None, GAUSS_AXIS) if packed_sh_degree is not None else gspec

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(pspec, gspec if alive is not None else rspec,
                  gspec if mean2d_tap is not None else rspec, rspec),
        out_specs=(rspec, rspec, rspec, gspec, gspec, rspec, rspec, rspec,
                   rspec, rspec, rspec),
        check_vma=False)
    def fn(p_shard, alive_shard, tap_shard, bg_in):
        if packed_sh_degree is not None:
            from ..core.project import preprocess_packed
            proj = preprocess_packed(
                p_shard, camera, sh_degree=packed_sh_degree,
                active_sh_degree=active_sh_degree,
                antialiasing=antialiasing,
                alive=alive_shard if alive is not None else None)
        else:
            proj = preprocess(p_shard, camera,
                              active_sh_degree=active_sh_degree,
                              antialiasing=antialiasing,
                              alive=alive_shard if alive is not None else None)
        if mean2d_tap is not None:
            proj = proj._replace(mean2d=proj.mean2d + tap_shard)

        from ..ops.rasterize_jnp import pack_projected
        packets = pack_projected(proj)                  # [n_local, 10]
        geom = jnp.concatenate([
            proj.radius.astype(jnp.float32)[:, None],
            proj.depth[:, None],
            proj.visible.astype(jnp.float32)[:, None],
            proj.radius_cull.astype(jnp.float32)], axis=1)   # cols 3,4
        n_local = packets.shape[0]
        n_vis_local = jnp.sum(proj.visible.astype(jnp.int32))

        if visible_capacity and visible_capacity < n_local:
            vcap = visible_capacity
            feats = jnp.concatenate([packets, geom], axis=1)  # [n, 15]
            # visible-first stable order; ties keep index order so depth
            # sorting downstream sees the same relative sequence
            order = jnp.argsort(
                jnp.where(proj.visible, 0, 1).astype(jnp.int32),
                stable=True)
            idx = jax.lax.stop_gradient(order[:vcap])
            inv = jax.lax.stop_gradient(jnp.argsort(order))  # row -> pos
            featc = _compact_rows(feats, idx, inv, vcap)     # [vcap, 15]
            feats_full = jax.lax.all_gather(featc, GAUSS_AXIS, axis=0,
                                            tiled=True)      # [k*vcap, 15]
            packets_full = feats_full[:, :10]
            geom_full = feats_full[:, 10:]
            # dropped rows beyond the cap: visible ones overflow (truncated
            # render — flag it); invisible ones carry zero packets anyway
            vis_overflow = n_vis_local > vcap
        else:
            packets_full = jax.lax.all_gather(packets, GAUSS_AXIS, axis=0,
                                              tiled=True)   # [N, 10]
            geom_full = jax.lax.all_gather(geom, GAUSS_AXIS, axis=0,
                                           tiled=True)
            vis_overflow = jnp.bool_(False)

        # coordinates stay GLOBAL; this device renders its assigned set of
        # global tile rows
        phase = jax.lax.axis_index(GAUSS_AXIS).astype(jnp.int32)
        proj_band = Projected(
            mean2d=packets_full[:, 0:2],
            conic=packets_full[:, 2:5],
            depth=geom_full[:, 1],
            radius=geom_full[:, 0].astype(jnp.int32),
            rgb=packets_full[:, 6:9],
            opacity=packets_full[:, 5],
            visible=geom_full[:, 2] > 0.5,
            radius_cull=geom_full[:, 3:5].astype(jnp.int32),
        )
        rows_dev = c0_dev = c1_dev = None
        if band_assign == "cost" and split:
            # sub-row splitting: snake-deal the non-heavy rows, carve the
            # H heaviest rows into per-device column quantiles. Assignment
            # inputs are psum'd, so every device derives the same maps.
            cost = jax.lax.stop_gradient(jax.lax.psum(
                _row_costs(proj, gx, gy_pad, tile_x, tile_y), GAUSS_AXIS))
            heavy = jax.lax.top_k(cost, split)[1].astype(jnp.int32)
            colcosts = jax.lax.stop_gradient(jax.lax.psum(
                _heavy_col_costs(proj, heavy, gx, gy_pad, tile_x, tile_y),
                GAUSS_AXIS))
            rows_dev, c0_dev, c1_dev = _assign_bands_split(
                cost, heavy, colcosts, k, band_rows - split, split, gx)
            row_map = rows_dev[phase]
            own = jnp.zeros((gy_pad,), jnp.int32).at[row_map].set(1)
            cumown = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                      jnp.cumsum(own)])
            out = render_projected(proj_band, width, band_h, bg_in,
                                   backend=backend,
                                   dup_capacity=dup_capacity,
                                   max_per_tile=max_per_tile, chunk=chunk,
                                   row_map=row_map, row_cumown=cumown,
                                   col0_map=c0_dev[phase],
                                   col1_map=c1_dev[phase])
            inv = None
        elif band_assign == "cost":
            # per-frame cost-balanced rows: duplicate cost per global row
            # (psum of each shard's histogram), dealt in snake order —
            # the strided assignment hits 2.5x band imbalance on centered
            # scenes (MULTICHIP_r03 band_dups); this bounds it near 1x
            cost = jax.lax.psum(
                _row_costs(proj, gx, gy_pad, tile_x, tile_y), GAUSS_AXIS)
            row_map, cumown = _snake_row_map(cost, k, band_rows, phase)
            out = render_projected(proj_band, width, band_h, bg_in,
                                   backend=backend,
                                   dup_capacity=dup_capacity,
                                   max_per_tile=max_per_tile, chunk=chunk,
                                   row_map=row_map, row_cumown=cumown)
            # inverse permutation of the gathered row order (replicated:
            # every device derives the same assignment from the psum'd cost)
            flat = jax.lax.all_gather(row_map, GAUSS_AXIS,
                                      axis=0).reshape(-1)   # [gy_pad]
            inv = jnp.argsort(flat)
        else:
            # strided rows: device d renders global rows d + j*k
            out = render_projected(proj_band, width, band_h, bg_in,
                                   backend=backend,
                                   dup_capacity=dup_capacity,
                                   max_per_tile=max_per_tile, chunk=chunk,
                                   row_phase=phase, row_stride=k)
            inv = None

        def reassemble_split(x, ax):
            """all_gather the per-device bands and select, for every
            (global row, pixel column), the one copy whose device owns
            that column segment. Split rows have k copies with DISJOINT
            column ranges partitioning the width; dealt rows have exactly
            one full-width copy — so a column-masked one-hot row matmul
            (MXU-friendly; its transpose is the same matmul, no
            serializing scatter in the backward) selects exactly one
            owner per pixel."""
            g = jax.lax.all_gather(x, GAUSS_AXIS, axis=0)   # [k, ...]
            if ax == 0:                                     # finalT [h, W]
                g = g[:, None]
            nc = g.shape[1]
            w_pix = g.shape[-1]
            ni = k * band_rows
            g = g.reshape(k, nc, band_rows, tile_y, w_pix)
            g = jnp.moveaxis(g, 2, 1).reshape(ni, nc, tile_y, w_pix)
            cols = jnp.arange(w_pix, dtype=jnp.int32)[None, :]
            c0p = (c0_dev.reshape(-1) * tile_x)[:, None]
            c1p = (c1_dev.reshape(-1) * tile_x)[:, None]
            mask = ((cols >= c0p) & (cols < c1p)).astype(g.dtype)
            masked = g * mask[:, None, None, :]
            rowhot = (rows_dev.reshape(-1)[None, :] ==
                      jnp.arange(gy_pad, dtype=jnp.int32)[:, None])
            outx = jnp.einsum('ri,icyw->rcyw', rowhot.astype(g.dtype),
                              masked)
            outx = jnp.moveaxis(outx, 0, 1).reshape(
                nc, gy_pad * tile_y, w_pix)
            return outx[0] if ax == 0 else outx

        def reassemble(x, ax):
            """all_gather the per-device row groups and restore global row
            order (strided: global row = device + j*k; cost: via the
            assignment's inverse permutation)."""
            if split:
                return reassemble_split(x, ax)
            g = jax.lax.all_gather(x, GAUSS_AXIS, axis=0)   # [k, ...]
            g = jnp.moveaxis(g, 0, ax)                      # k at axis ax
            shape = list(g.shape)
            g = g.reshape(shape[:ax] + [k, band_rows, tile_y]
                          + shape[ax + 2:])
            if inv is None:
                g = jnp.swapaxes(g, ax, ax + 1)  # [band_rows, k, tile_y]
            else:
                g = g.reshape(shape[:ax] + [k * band_rows, tile_y]
                              + shape[ax + 2:])
                g = jnp.take(g, inv, axis=ax)    # [gy_pad, tile_y]
            return g.reshape(shape[:ax] + [band_rows * k * tile_y]
                             + shape[ax + 2:])

        image = reassemble(out.image, 1)                    # [3, gy_pad*ty, W]
        invd = reassemble(out.invdepth, 1)
        finalT = reassemble(out.final_T, 0)
        # per-gaussian stats (non-differentiable): straight from the LOCAL
        # shard's projection — identical values to slicing the gathered
        # geometry back, without depending on what entered the collective
        radii_loc = jax.lax.stop_gradient(proj.radius)
        vis_loc = jax.lax.stop_gradient(proj.visible)
        stats = jax.lax.stop_gradient(jnp.stack([
            out.num_duplicates.astype(jnp.float32),
            out.max_tile_len.astype(jnp.float32),
            (out.overflow | vis_overflow).astype(jnp.float32)]))
        nd = jax.lax.psum(stats[0], GAUSS_AXIS).astype(jnp.int32)
        ml = jax.lax.pmax(stats[1], GAUSS_AXIS).astype(jnp.int32)
        ov = jax.lax.pmax(stats[2], GAUSS_AXIS) > 0
        # per-band duplicate counts: the tile-band load-balance diagnostic
        band_nd = jax.lax.all_gather(
            out.num_duplicates.astype(jnp.int32), GAUSS_AXIS)   # [k]
        # per-band POST-CULL work (entries the kernel composites): with
        # split_rows the pre-cull duplicates overstate heavy-row devices
        # (every device expands a split row's full width) — this is the
        # real balance metric
        band_work = jax.lax.all_gather(
            out.num_valid.astype(jnp.int32), GAUSS_AXIS)        # [k]
        # per-device visible counts: sizes the visible_capacity compaction
        # (max of this is what the trainer grows the cap to on overflow)
        band_vis = jax.lax.all_gather(n_vis_local, GAUSS_AXIS)  # [k]
        return (image, invd, finalT, radii_loc, vis_loc, nd, ml, ov,
                band_nd, band_vis, band_work)

    alive_in = alive if alive is not None else jnp.zeros((1,), bool)
    tap_in = (mean2d_tap if mean2d_tap is not None
              else jnp.zeros((1, 2), jnp.float32))
    (image, invd, finalT, radii, vis, nd, ml, ov, band_nd, band_vis,
     band_work) = fn(params, alive_in, tap_in, bg)
    return RenderOutput(
        image=image[:, :height, :],
        invdepth=invd[:, :height, :],
        final_T=finalT[:height, :],
        radii=radii, visibility=vis,
        num_duplicates=nd, max_tile_len=ml, overflow=ov,
        band_duplicates=band_nd, band_visible=band_vis,
        num_valid=jnp.sum(band_work), band_work=band_work)
