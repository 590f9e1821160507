"""Pallas TPU rasterizer: per-tile alpha compositing, forward + custom VJP.

TPU-native replacement for the CUDA render/backward kernels
(ref: SURVEY.md §2.3-N1; semantics identical to gs_tpu.ops.composite and the
jnp binned backend, which serve as its correctness oracles).

Design (one grid program per 16x16 tile):
  * the binning stage produces a dense (tile, depth)-sorted entry stream plus
    per-tile [start, end) ranges (ops/binning.bin_gaussians); the kernel DMAs
    128-entry feature chunks starting at the chunk-aligned floor of ``start``
    and masks entries outside the tile's range in-register — no aligned
    re-layout pass is needed (a searchsorted-based aligned rebuild measured
    226 ms at 2M entries on v5e; this formulation removes it entirely)
  * alpha is computed as a [128 entries, 256 pixels] VPU block; the running
    transmittance uses the log1p/cumsum formulation with the cumulative sum
    done as a triangular-ones matmul on the MXU
  * per-pixel color/invdepth accumulate via a [entries, pixels] x [entries, 4]
    contraction on the MXU
  * tiles terminate early once every pixel's transmittance falls below 1e-4
    (the CUDA kernel's per-pixel `done` flag, done per-tile here)
  * backward walks each tile's chunks back-to-front carrying the suffix sum
    S_g = sum_{h>g} w_h (c_h . dL/dC + invd_h . dL/dI) (per-chunk entering
    transmittance comes from the forward's checkpoint) and emits per-entry
    gradients for all 10 packet features. Shared boundary chunks use the
    round-5 PEND protocol (see _bwd_kernel): each d-chunk is written to HBM
    exactly once, with the only future-shareable chunk held in VMEM until
    the next tile merges into it — no read-modify-write stream, which
    exposed one HBM round trip per tile in r4. Relies on grid programs
    executing sequentially on the core (scratch persists across programs).
    The d-entry buffer is zero-initialized via input/output aliasing. XLA's
    gather-VJP (segment sum over entry -> gaussian ids) completes the chain.
  * both kernels HEAD-PREFETCH: every tile's first chunk DMA is issued at
    program start, so the head-chunk wait is exposed once per program, not
    once per tile.

Feature-row layout ([NFEAT=16, D] f32, rows beyond 10 are padding):
  0 x, 1 y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity, 6 r, 7 g, 8 b,
  9 invdepth.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.project import Projected
from .binning import bin_gaussians_payload, tile_grid
from .composite import ALPHA_MAX, ALPHA_MIN, T_EPS
from .rasterize_jnp import pack_projected
from .segment import segment_sum_runend

CS = 128          # entries per chunk (= lane width)
NFEAT = 16   # 10 packet features + 6 pad rows: Mosaic requires HBM slice
# dim-0 aligned to the (8,128) tiling, so 10 rows is not DMA-able


def _tri_matrices(cs: int):
    """(L_incl [cs,cs], SU [cs,cs]) built in-kernel via iota compares."""
    row = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    l_incl = (col <= row).astype(jnp.float32)   # cum[j] = sum_{i<=j}
    s_upper = (col > row).astype(jnp.float32)   # suffix[j] = sum_{i>j}
    return l_incl, s_upper


def _global_trow(t, gx, rowp_ref, row_stride, use_row_map):
    """LOCAL tile t's GLOBAL tile row: phase + local_row * stride (strided
    multi-chip bands; rowp_ref is the [1] phase) or rowp_ref[local_row]
    (arbitrary traced row map — the cost-balanced band assignment)."""
    if use_row_map:
        return rowp_ref[t // gx]
    return (t // gx) * row_stride + rowp_ref[0]


def _pixel_rows(t, gx, tile_x, tile_y, pix, trow):
    """Tile t's pixel coordinates as [1, pix] rows; ``trow`` is the global
    tile row (packets keep global coordinates)."""
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1).astype(jnp.float32)
    tcol = (t % gx).astype(jnp.float32)
    px = tcol * tile_x + pid % tile_x
    py = trow.astype(jnp.float32) * tile_y + jnp.floor(pid / tile_x)
    return px, py


def _entry_mask(base, k, start, end):
    """[CS, 1] validity of chunk k's entries against the tile range."""
    eidx = jax.lax.broadcasted_iota(jnp.int32, (CS, 1), 0) + base + k * CS
    return (eidx >= start) & (eidx < end)


def _chunk_alpha(f, vmask, px, py):
    """f: [CS, NFEAT] chunk features; vmask: [CS, 1]; px/py: [1, PIX].

    Returns (alpha [CS, PIX] after all forward masks, plus intermediates
    needed by the backward chain)."""
    x = f[:, 0:1]
    y = f[:, 1:2]
    ca = f[:, 2:3]
    cb = f[:, 3:4]
    cc = f[:, 4:5]
    op = f[:, 5:6]
    dx = x - px
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    opg = op * g
    alpha_c = jnp.minimum(ALPHA_MAX, opg)
    keep = (power <= 0.0) & (alpha_c >= ALPHA_MIN) & vmask
    alpha = jnp.where(keep, alpha_c, 0.0)
    # gate for d(op*g): skip-masked or clamped entries pass no gradient
    gate = (keep & (opg < ALPHA_MAX)).astype(jnp.float32)
    return alpha, g, opg, dx, dy, gate


def _chunk_dma(feats_hbm, fbuf, sem, base, k, slot):
    return pltpu.make_async_copy(
        feats_hbm.at[:, pl.ds(pl.multiple_of(base + k * CS, CS), CS)],
        fbuf.at[slot], sem.at[slot])


def _fwd_kernel(tile_start_ref, tile_end_ref, rowp_ref, feats_hbm, out_ref,
                ustore_ref, hbuf, fbuf, hsem, sem, *, gx, tile_x, tile_y,
                pix, max_chunks, tiles_per_program, row_stride, save_ustore,
                use_row_map=False):
    l_incl, _ = _tri_matrices(CS)
    pid = pl.program_id(0)
    tbp = tiles_per_program

    # HEAD PREFETCH (r5 probe perf_r5c, studies/r5_measure_perf_r5c.log):
    # issue every tile's first-chunk DMA at program start so a tile's head
    # chunk is in flight while earlier tiles composite — the head wait was
    # one exposed HBM round trip per TILE; now it is one per PROGRAM.
    metas = []
    for tb in range(tbp):
        t = pid * tbp + tb
        start = tile_start_ref[t]
        end = tile_end_ref[t]
        base = pl.multiple_of((start // CS) * CS, CS)
        nchunks = jnp.minimum(pl.cdiv(end - base, CS), max_chunks)
        metas.append((t, start, end, base, nchunks))

        @pl.when(nchunks > 0)
        def _(base=base, tb=tb):
            pltpu.make_async_copy(feats_hbm.at[:, pl.ds(base, CS)],
                                  hbuf.at[tb], hsem.at[tb]).start()

    for tb in range(tbp):                                # static unroll
        t, start, end, base, nchunks = metas[tb]
        trow = _global_trow(t, gx, rowp_ref, row_stride, use_row_map)
        px, py = _pixel_rows(t, gx, tile_x, tile_y, pix, trow)

        out_ref[tb] = jnp.zeros((8, pix), jnp.float32)
        out_ref[tb, 4:5] = jnp.ones((1, pix), jnp.float32)   # running T
        out_ref[tb, 5:6] = jnp.ones((1, pix), jnp.float32)   # frozen T

        def composite(k, f, tb=tb, start=start, end=end, base=base,
                      px=px, py=py):
            vmask = _entry_mask(base, k, start, end)
            alpha, _, _, _, _, _ = _chunk_alpha(f, vmask, px, py)

            lg = jnp.log1p(-alpha)                   # [CS, PIX]
            cum = jnp.dot(l_incl, lg,
                          preferred_element_type=jnp.float32)
            u_prev = out_ref[tb, 4:5]                # [1, PIX]
            if save_ustore:
                # checkpoint the chunk's ENTERING transmittance — the
                # backward reads it instead of re-sweeping the tile
                # (no-grad renders compile without this store)
                ustore_ref[tb, pl.ds(k, 1), :] = u_prev
            u_incl = u_prev * jnp.exp(cum)
            # == u_prev * exp(cum - lg); division trades the second
            # [CS,PIX] transcendental for a cheap reciprocal
            u_excl = u_incl / (1.0 - alpha)
            live = (u_incl >= T_EPS).astype(jnp.float32)
            w = alpha * u_excl * live                # [CS, PIX]

            contrib = jax.lax.dot_general(
                f[:, 6:10], w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [4, PIX]
            out_ref[tb, 0:4] += contrib
            tmin = jnp.min(jnp.where(live > 0, u_incl, jnp.inf), axis=0,
                           keepdims=True)
            out_ref[tb, 5:6] = jnp.minimum(out_ref[tb, 5:6], tmin)
            out_ref[tb, 4:5] = u_incl[CS - 1:CS, :]

        # chunk 0 peeled out of the loop: it composites from the
        # program-start head buffer; remaining chunks stream through the
        # double-buffered fbuf ring (chunk k+1 in flight while k runs)
        @pl.when(nchunks > 0)
        def _(tb=tb, base=base, nchunks=nchunks):
            pltpu.make_async_copy(feats_hbm.at[:, pl.ds(base, CS)],
                                  hbuf.at[tb], hsem.at[tb]).wait()

            @pl.when(nchunks > 1)
            def _():
                _chunk_dma(feats_hbm, fbuf, sem, base, 1, 1).start()
            composite(0, hbuf[tb].T)

            def body(k, carry, tb=tb, base=base, nchunks=nchunks):
                umax, kproc = carry
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < nchunks)
                def _():
                    _chunk_dma(feats_hbm, fbuf, sem, base, k + 1,
                               1 - slot).start()
                _chunk_dma(feats_hbm, fbuf, sem, base, k, slot).wait()
                active = umax >= T_EPS

                @pl.when(active)
                def _():
                    composite(k, fbuf[slot].T)
                kproc = jnp.where(active, k + 1, kproc)
                return jnp.max(out_ref[tb, 4:5]), kproc

            _, kproc = jax.lax.fori_loop(
                1, nchunks, body,
                (jnp.max(out_ref[tb, 4:5]), jnp.int32(1)))
            # chunks actually composited before early termination; the
            # backward walks exactly these (row 6 was spare)
            out_ref[tb, 6:7] = jnp.full((1, pix), kproc.astype(jnp.float32))


def _moment_matrix(tile_x, pix):
    """[PIX, 6] columns (1, pl, ql, pl^2, ql^2, pl*ql) of TILE-LOCAL pixel
    coordinates. One [CS,PIX] x [PIX,6] MXU contraction of dpower against
    this replaces six cross-lane reductions: every geometry gradient is a
    polynomial in dx = xl - pl, dy = yl - ql, so it expands into these
    moments. Local coordinates (|pl| < 16) keep the expansion cancellation-
    free — global pixel coordinates would lose ~4 digits at 1080p."""
    pidx = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    plx = (pidx % tile_x).astype(jnp.float32)
    qly = (pidx // tile_x).astype(jnp.float32)
    one = jnp.ones((pix, 1), jnp.float32)
    return jnp.concatenate(
        [one, plx, qly, plx * plx, qly * qly, plx * qly], axis=1)


def _bwd_kernel(tile_start_ref, tile_end_ref, rowp_ref, feats_hbm,
                out_fwd_ref, ustore_ref, dout_ref, zeros_hbm, dfeats_hbm,
                hbuf, fbuf, wrbuf, pbuf, scar, st, hsem, sem_in, sem_wr,
                sem_pf, *, gx, tile_x, tile_y, pix, max_chunks, row_stride,
                tiles_per_program, use_row_map=False):
    """PEND-protocol backward (round 5; perf_r5c/r5d probes, bitwise ==
    the r4 RMW kernel): every d-chunk is written to HBM exactly ONCE.

    Tiles are processed in ascending entry order, so the only chunk a
    FUTURE tile can share is the current tile's top processed chunk; that
    chunk accumulates in a VMEM pending buffer (ping-pong pair ``pbuf``)
    until the next tile merges its own bottom-chunk contribution into it,
    or it is flushed. Interior chunks are pure writes through the
    ``wrbuf`` ring. This deletes the r4 read-modify-write d-stream whose
    cross-tile write->read ordering exposed an HBM round trip per tile.
    Pend state lives in scratch (``st`` SMEM: 0 pend chunk id, 1 pend
    slot, 2-3 wrbuf pending ids, 4-5 pbuf flush pending ids), which
    persists across the sequentially-executed grid programs — the same
    in-order-grid property the old RMW accumulation relied on. Feature
    chunks head-prefetch per program exactly like the forward."""
    del zeros_hbm  # aliased into dfeats_hbm (zero initialization)
    l_incl, s_upper = _tri_matrices(CS)
    moments = _moment_matrix(tile_x, pix)                 # [PIX, 6]
    pid = pl.program_id(0)
    tbp = tiles_per_program

    @pl.when(pid == 0)
    def _():
        for i in range(6):
            st[i] = -1
        st[1] = 0

    def chunk_addr(c):
        return pl.multiple_of(c * CS, CS)

    def pf_dma(slot, c):
        return pltpu.make_async_copy(
            pbuf.at[slot], dfeats_hbm.at[:, pl.ds(chunk_addr(c), CS)],
            sem_pf.at[slot])

    def wr_dma(slot, c):
        return pltpu.make_async_copy(
            wrbuf.at[slot], dfeats_hbm.at[:, pl.ds(chunk_addr(c), CS)],
            sem_wr.at[slot])

    metas = []
    for tb in range(tbp):
        t = pid * tbp + tb
        start = tile_start_ref[t]
        end = tile_end_ref[t]
        base = pl.multiple_of((start // CS) * CS, CS)
        kproc = out_fwd_ref[tb, 6, 0].astype(jnp.int32)
        metas.append((t, start, end, base, kproc))

        @pl.when(kproc > 0)
        def _(base=base, kproc=kproc, tb=tb):
            pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(pl.multiple_of(
                    base + (kproc - 1) * CS, CS), CS)],
                hbuf.at[tb], hsem.at[tb]).start()

    for tb in range(tbp):                                 # static unroll
        t, start, end, base, kproc = metas[tb]
        cb = base // CS
        c_top = cb + kproc - 1
        trow = _global_trow(t, gx, rowp_ref, row_stride, use_row_map)
        px, py = _pixel_rows(t, gx, tile_x, tile_y, pix, trow)
        # tile origin: pixel coords = origin + local (moment expansion frame)
        ox = (t % gx).astype(jnp.float32) * tile_x
        oy = trow.astype(jnp.float32) * tile_y

        dldc = dout_ref[tb, 0:3]                          # [3, PIX]
        dldi = dout_ref[tb, 3:4]                          # [1, PIX]
        dldt = dout_ref[tb, 5:6]                          # [1, PIX]
        tmin = out_fwd_ref[tb, 5:6]                       # [1, PIX] value

        def dgrad_chunk(k, f, tb=tb, start=start, end=end, base=base,
                        px=px, py=py, ox=ox, oy=oy, dldc=dldc, dldi=dldi,
                        dldt=dldt, tmin=tmin):
            """Chunk k's per-entry gradients [NFEAT, CS]; the suffix carry
            reads/writes the ``scar`` scratch row."""
            vmask = _entry_mask(base, k, start, end)
            alpha, g, opg, dx, dy, gate = _chunk_alpha(f, vmask, px, py)
            lg = jnp.log1p(-alpha)
            cum = jnp.dot(l_incl, lg, preferred_element_type=jnp.float32)
            u_prev = ustore_ref[tb, pl.ds(k, 1), :]
            u_incl = u_prev * jnp.exp(cum)
            inv1ma = 1.0 / (1.0 - alpha)
            u_excl = u_incl * inv1ma           # == u_prev * exp(cum - lg)
            live = (u_incl >= T_EPS).astype(jnp.float32)
            w = alpha * u_excl * live                 # [CS, PIX]

            # per-(entry,pixel) upstream: c_e . dL/dC_p + invd_e dL/dI_p
            cdot = jax.lax.dot_general(
                f[:, 6:9], dldc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [CS, PIX]
            cdot = cdot + f[:, 9:10] * dldi
            wc = w * cdot
            suffix = jnp.dot(s_upper, wc,
                             preferred_element_type=jnp.float32)
            s_total = suffix + scar[...]              # [CS, PIX]

            dalpha = (cdot * u_excl * live
                      - s_total * inv1ma
                      - dldt * tmin * inv1ma * live)

            # geometry gradients via the moment expansion: every reduction
            # sum_p dpower * poly(dx, dy) becomes a polynomial in the six
            # pixel moments of dpower (dx = xl - pl with tile-local coords)
            dpower = dalpha * gate * opg              # [CS, PIX]
            S = jax.lax.dot_general(
                dpower, moments, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [CS, 6]
            s0 = S[:, 0:1]
            sx = S[:, 1:2]
            sy = S[:, 2:3]
            sxx = S[:, 3:4]
            syy = S[:, 4:5]
            sxy = S[:, 5:6]
            xl = f[:, 0:1] - ox
            yl = f[:, 1:2] - oy
            op = f[:, 5:6]
            ca = f[:, 2:3]
            cb = f[:, 3:4]
            cc = f[:, 4:5]
            # d_op = sum_p dalpha*gate*g = sum_p dpower / op
            d_op = jnp.where(op > 0.0, s0 / jnp.where(op > 0.0, op, 1.0),
                             0.0)
            d_ca = -0.5 * (xl * xl * s0 - 2.0 * xl * sx + sxx)
            d_cb = -(xl * yl * s0 - xl * sy - yl * sx + sxy)
            d_cc = -0.5 * (yl * yl * s0 - 2.0 * yl * sy + syy)
            mx = xl * s0 - sx                         # sum_p dpower * dx
            my = yl * s0 - sy
            d_x = -(ca * mx + cb * my)
            d_y = -(cc * my + cb * mx)
            d_rgb = jax.lax.dot_general(
                w, dldc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [CS, 3]
            d_invd = jax.lax.dot_general(
                w, dldi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [CS, 1]

            zeros6 = jnp.zeros((CS, NFEAT - 10), jnp.float32)
            dgrad = jnp.concatenate(
                [d_x, d_y, d_ca, d_cb, d_cc, d_op, d_rgb, d_invd, zeros6],
                axis=1)                               # [CS, NFEAT]
            dgrad = jnp.where(vmask, dgrad, 0.0)
            scar[...] = jnp.sum(wc, axis=0, keepdims=True) + scar[...]
            return dgrad.T

        @pl.when(kproc > 0)
        def _(tb=tb, kproc=kproc, base=base, cb=cb, c_top=c_top,
              start=start, end=end):
            scar[...] = jnp.zeros((1, pix), jnp.float32)
            old_id = st[0]
            old_slot = st[1]
            # this tile's bottom chunk merges into the pending chunk?
            carry_in = old_id == cb

            # flush the old pend unless the bottom chunk will merge it
            @pl.when(~carry_in & (old_id >= 0))
            def _():
                pf_dma(old_slot, old_id).start()
                st[4 + old_slot] = old_id

            # ---- top chunk (peeled): composites from the head buffer --
            pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(pl.multiple_of(
                    base + (kproc - 1) * CS, CS), CS)],
                hbuf.at[tb], hsem.at[tb]).wait()

            @pl.when(kproc > 1)
            def _():
                _chunk_dma(feats_hbm, fbuf, sem_in, base, kproc - 2,
                           1).start()
            dg_top = dgrad_chunk(kproc - 1, hbuf[tb].T)

            @pl.when(carry_in & (kproc == 1))
            def _():
                # whole tile inside the pending chunk: accumulate in place
                pbuf[old_slot] += dg_top

            @pl.when(~(carry_in & (kproc == 1)))
            def _():
                new_slot = 1 - old_slot

                @pl.when(st[4 + new_slot] >= 0)
                def _():
                    pf_dma(new_slot, st[4 + new_slot]).wait()
                st[4 + new_slot] = -1
                pbuf[new_slot] = dg_top
                st[0] = c_top
                st[1] = new_slot

            # ---- remaining chunks, top-1 .. 0 (fbuf ring) -------------
            def body2(j, carry, tb=tb, kproc=kproc, base=base, cb=cb,
                      old_slot=old_slot, carry_in=carry_in):
                k = kproc - 1 - j
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < kproc)
                def _():
                    _chunk_dma(feats_hbm, fbuf, sem_in, base, k - 1,
                               1 - slot).start()
                _chunk_dma(feats_hbm, fbuf, sem_in, base, k, slot).wait()
                dg = dgrad_chunk(k, fbuf[slot].T)
                wslot = slot

                @pl.when(st[2 + wslot] >= 0)
                def _():
                    wr_dma(wslot, st[2 + wslot]).wait()
                wrbuf[wslot] = dg

                @pl.when((k == 0) & carry_in)
                def _():
                    # bottom chunk: fold the carried pending chunk in —
                    # chunk cb is now final (no future tile reaches below
                    # this tile's top chunk), so it writes out here
                    wrbuf[wslot] = wrbuf[wslot] + pbuf[old_slot]
                wr_dma(wslot, cb + k).start()
                st[2 + wslot] = cb + k
                return carry

            jax.lax.fori_loop(1, kproc, body2, jnp.int32(0))

    # program end: drain write/flush slots (buffer-reuse safety across the
    # program boundary; the live pend buffer itself has no DMA in flight)
    for s_ in (0, 1):
        @pl.when(st[2 + s_] >= 0)
        def _(s_=s_):
            wr_dma(s_, st[2 + s_]).wait()
            st[2 + s_] = -1

        @pl.when(st[4 + s_] >= 0)
        def _(s_=s_):
            pf_dma(s_, st[4 + s_]).wait()
            st[4 + s_] = -1

    # very last program: flush the live pending chunk
    @pl.when(pid == pl.num_programs(0) - 1)
    def _():
        @pl.when(st[0] >= 0)
        def _():
            pf_dma(st[1], st[0]).start()
            pf_dma(st[1], st[0]).wait()


class _Statics(NamedTuple):
    num_tiles: int
    gx: int
    tile_x: int
    tile_y: int
    max_chunks: int
    interpret: bool
    tiles_per_program: int = 1   # fwd grid batching (amortizes per-program
                                 # overhead; tile count is padded to a multiple)
    row_stride: int = 1          # interleaved multi-chip tile-row assignment
    use_row_map: bool = False    # row_phase arg is a [gy_local] global-row
                                 # map instead of a [1] phase (cost-balanced
                                 # multi-chip bands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _raster_tiles(feats, tile_start, tile_end, row_phase, statics: _Statics):
    # primal (no-grad) path skips the transmittance checkpoint entirely —
    # eval/viewer renders compile a leaner kernel; the grad path's fwd rule
    # computes the identical `out` WITH the checkpoint
    out, _ = _raster_tiles_fwd(feats, tile_start, tile_end, row_phase,
                               statics, save_ustore=False)
    return out


def _raster_tiles_fwd(feats, tile_start, tile_end, row_phase,
                      statics: _Statics, save_ustore: bool = True):
    s = statics
    pix = s.tile_x * s.tile_y
    tbp = s.tiles_per_program
    t_pad = -(-s.num_tiles // tbp) * tbp
    if t_pad != tile_start.shape[0]:
        pad = t_pad - tile_start.shape[0]
        tile_start = jnp.pad(tile_start, (0, pad))
        tile_end = jnp.pad(tile_end, (0, pad))   # empty padded tiles
    # Memory note (advisor r2): the transmittance checkpoint is
    # [num_tiles, max_chunks, 256] f32 in HBM between forward and backward —
    # ~67 MB at 1080p/max_per_tile=1024, scaling linearly with max_per_tile
    # (~330 MB at 4096, ~600 MB at 8192). Deliberate recompute-vs-store
    # trade (it deleted the whole backward re-sweep); if capacity
    # auto-growth ever drives max_per_tile into the tens of thousands,
    # size max_chunks from the measured max tile length instead.
    u_chunks = s.max_chunks if save_ustore else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tbp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[
            pl.BlockSpec((tbp, 8, pix), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # per-chunk entering-transmittance checkpoint, consumed by the
            # backward (rows >= kproc are left unwritten and never read)
            pl.BlockSpec((tbp, u_chunks, pix), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tbp, NFEAT, CS), jnp.float32),   # hbuf (head chunks)
            pltpu.VMEM((2, NFEAT, CS), jnp.float32),     # fbuf (stream ring)
            pltpu.SemaphoreType.DMA((tbp,)),             # hsem
            pltpu.SemaphoreType.DMA((2,)),               # sem
        ],
    )
    kernel = functools.partial(_fwd_kernel, gx=s.gx, tile_x=s.tile_x,
                               tile_y=s.tile_y, pix=pix,
                               max_chunks=s.max_chunks,
                               tiles_per_program=tbp,
                               row_stride=s.row_stride,
                               save_ustore=save_ustore,
                               use_row_map=s.use_row_map)
    out, ustore = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 8, pix), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, u_chunks, pix), jnp.float32),
        ],
        interpret=s.interpret,
    )(tile_start, tile_end, row_phase, feats)
    out = out[:s.num_tiles]
    return out, (feats, tile_start[:s.num_tiles], tile_end[:s.num_tiles],
                 row_phase, out, ustore[:s.num_tiles])


def _raster_tiles_bwd(statics: _Statics, residuals, dout):
    s = statics
    feats, tile_start, tile_end, row_phase, out_fwd, ustore = residuals
    pix = s.tile_x * s.tile_y
    tbp = s.tiles_per_program
    t_pad = -(-s.num_tiles // tbp) * tbp
    if t_pad != s.num_tiles:
        pad = t_pad - s.num_tiles
        tile_start = jnp.pad(tile_start, (0, pad))
        tile_end = jnp.pad(tile_end, (0, pad))       # empty padded tiles
        out_fwd = jnp.pad(out_fwd, ((0, pad), (0, 0), (0, 0)))
        ustore = jnp.pad(ustore, ((0, pad), (0, 0), (0, 0)))
        dout = jnp.pad(dout, ((0, pad), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tbp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((tbp, 8, pix), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbp, s.max_chunks, pix), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbp, 8, pix), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((tbp, NFEAT, CS), jnp.float32),  # hbuf (head chunks)
            pltpu.VMEM((2, NFEAT, CS), jnp.float32),    # fbuf (stream ring)
            pltpu.VMEM((2, NFEAT, CS), jnp.float32),    # wrbuf (write ring)
            pltpu.VMEM((2, NFEAT, CS), jnp.float32),    # pbuf (pend pair)
            pltpu.VMEM((1, pix), jnp.float32),          # scar (suffix carry)
            pltpu.SMEM((6,), jnp.int32),                # st (pend state)
            pltpu.SemaphoreType.DMA((tbp,)),            # hsem
            pltpu.SemaphoreType.DMA((2,)),              # sem_in
            pltpu.SemaphoreType.DMA((2,)),              # sem_wr
            pltpu.SemaphoreType.DMA((2,)),              # sem_pf
        ],
    )
    kernel = functools.partial(_bwd_kernel, gx=s.gx, tile_x=s.tile_x,
                               tile_y=s.tile_y, pix=pix,
                               max_chunks=s.max_chunks,
                               row_stride=s.row_stride,
                               tiles_per_program=tbp,
                               use_row_map=s.use_row_map)
    zeros = jnp.zeros_like(feats)
    dfeats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feats.shape, jnp.float32),
        # inputs are (tile_start, tile_end, row_phase, feats, out_fwd,
        # ustore, dout, zeros); alias zeros into the output so untouched
        # chunks read 0
        input_output_aliases={7: 0},
        interpret=s.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_end, row_phase, feats, out_fwd, ustore, dout, zeros)
    return dfeats, None, None, None


_raster_tiles.defvjp(_raster_tiles_fwd, _raster_tiles_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bin_with_payload(packets, proj_sg, dims, rowinfo):
    """Binning with the packet columns carried through the sort; VJP routes
    d(sorted packets) back to packets via the sort-based segment sum. The
    geometry inputs are stop-gradient'd (binning is integer-valued, exactly
    like the CUDA sort stage). ``rowinfo`` = (row_phase [1], row_map,
    row_cumown, col0_map, col1_map) — dummies unless dims' has_row_map /
    has_col_map."""
    out, _ = _bin_with_payload_fwd(packets, proj_sg, dims, rowinfo)
    return out


def _bin_with_payload_fwd(packets, proj_sg, dims, rowinfo):
    (width, height, tile_x, tile_y, dup_capacity, row_stride, bf16,
     expand, interp, exact_cull, _fold, has_row_map, fwd_only,
     has_col_map) = dims
    row_phase, row_map, row_cumown, col0_map, col1_map = rowinfo
    if not has_row_map:
        row_map = row_cumown = None
    if not has_col_map:
        col0_map = col1_map = None
    # bf16: stream rgb+invdepth as bf16 pairs — 10 -> 8 payload columns
    # through the HBM-heavy row-movement stages. Geometry (means, conic,
    # opacity) stays f32 — it feeds the positional gradient chain. Backward
    # treats the quantization as identity (straight-through); see
    # tests/test_pallas.py::test_pallas_bf16_* for the parity envelope.
    # Packing happens INSIDE binning at the branch-safe point: the pallas
    # expansion kernel is float arithmetic and would flush denormal bit
    # patterns (binning.pack_bf16_pair docstring), so that branch packs
    # post-expansion, pre-sort.
    bins, sorted_cols = bin_gaussians_payload(
        proj_sg, packets, width, height, tile_x, tile_y, dup_capacity,
        row_phase=row_phase[0], row_stride=row_stride,
        expand=expand, expand_interpret=interp, exact_cull=exact_cull,
        sort_gid=not fwd_only, bf16_pairs=bf16,
        row_map=row_map, row_cumown=row_cumown,
        col0_map=col0_map, col1_map=col1_map)
    if bf16:
        from .binning import unpack_bf16_pair
        r, g = unpack_bf16_pair(sorted_cols[6])
        b, invd = unpack_bf16_pair(sorted_cols[7])
        sorted_cols = sorted_cols[:6] + (r, g, b, invd)
    n = packets.shape[0]
    # binning already sentinels capacity-padding gids; exact-culled entries
    # keep their real gid and contribute exact zeros to their run (their
    # cotangents are never written — no tile range covers the sentinel
    # tile region)
    gid_sent = bins.entry_gid
    return (bins, sorted_cols), (gid_sent, bins.gauss_counts, n, proj_sg,
                                 bins.overflow, rowinfo)


def _zero_tangent(x):
    import numpy as _np
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return _np.zeros(x.shape, jax.dtypes.float0)   # int/bool leaves


def _bin_with_payload_bwd(dims, residuals, cot):
    gid_sent, counts_orig, n, proj_sg, overflow, _rowinfo = residuals
    _, d_cols = cot                      # TileBins cotangents are float0
    interp, fold = dims[8], dims[10]
    if dims[12]:
        raise ValueError(
            "rasterize_pallas(fwd_only=True) dropped the entry gids from "
            "the tile sort — gradients through this render are undefined. "
            "Use fwd_only=False (the default) for differentiable renders.")
    if fold:
        # sort by gid (grouping runs contiguously, ascending original id),
        # then the streaming one-hot fold kernel replaces the
        # stack+cumsum+run-end-gather tail of segment_sum_runend — the
        # N-row random gathers from the [D, F] cumsum table are the fold's
        # most expensive piece on v5e (~25 ms at D=4.2M)
        from .fold_pallas import ROWS as FROWS, fold_rows
        f = len(d_cols)
        ops = jax.lax.sort((gid_sent,) + tuple(d_cols), dimension=0,
                           is_stable=False, num_keys=1)
        dcap = d_cols[0].shape[0]
        data = jnp.concatenate(
            [jnp.stack(ops[1:], axis=0),
             jnp.zeros((FROWS - f, dcap), jnp.float32)], axis=0)
        offs = jnp.cumsum(counts_orig) - counts_orig
        d_packets = fold_rows(data, offs, counts_orig, n,
                              interpret=interp)[:f].T      # [N, F]
    else:
        d_packets = segment_sum_runend(d_cols, gid_sent, counts_orig, n)
    # under capacity overflow the entry stream is truncated, so the run-end
    # windows derived from the (untruncated) gauss_counts misalign past the
    # cut and would cross-contaminate gradients BETWEEN gaussians; a
    # truncated step must produce conservative (zero) raster gradients
    # instead — the trainer observes the overflow flag at the next sync and
    # re-jits with bigger buffers (train/loop.py::_handle_overflow)
    d_packets = jnp.where(overflow, jnp.zeros_like(d_packets), d_packets)
    d_proj = jax.tree.map(_zero_tangent, proj_sg)
    # rowinfo is integer-valued (phase/map/cumown) — no tangents
    d_rowinfo = jax.tree.map(_zero_tangent, residuals[5])
    return d_packets, d_proj, d_rowinfo


_bin_with_payload.defvjp(_bin_with_payload_fwd, _bin_with_payload_bwd)


def rasterize_pallas(proj: Projected, width: int, height: int,
                     bg: jnp.ndarray, *, tile_x: int = 16, tile_y: int = 16,
                     max_per_tile: int = 4096, dup_capacity: int = 1 << 20,
                     interpret: bool = False,
                     row_phase=None, row_stride: int = 1,
                     bf16_features: bool = False,
                     pallas_expand: bool = False,
                     exact_cull: bool = False,
                     pallas_fold: bool = False,
                     fwd_only: bool = False,
                     row_map=None, row_cumown=None,
                     col0_map=None, col1_map=None):
    """Render via the Pallas tile kernel; differentiable w.r.t. ``proj``
    through the packet features.

    ``fwd_only``: drop the entry gids from the tile sort (they feed only
    the backward gradient fold) — ~3 ms/operand cheaper binning for
    no-grad callers (viewer, eval renders). Taking gradients through a
    fwd_only render raises at trace time.

    ``row_phase`` (traced) / ``row_stride`` (static) render only the global
    tile rows phase + j*stride into a height-``height`` local image —
    the interleaved multi-chip band assignment (packets keep global
    coordinates). ``row_map`` [gy_local] (traced, ascending global rows)
    with ``row_cumown`` [gy_global+1] (exclusive owned-row prefix) instead
    renders an ARBITRARY row set — the cost-balanced band assignment.

    ``col0_map``/``col1_map`` [gy_local] (traced, with row_map): local row
    j owns only global tile columns [col0_map[j], col1_map[j]) — sub-row
    band splitting (parallel/render_mc.py split_rows).

    Returns (image [3,H,W], invdepth [1,H,W], finalT [H,W],
    num_duplicates, max_tile_len, overflow, num_valid)."""
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    num_tiles = gx * gy
    pix = tile_x * tile_y
    # +1: an unaligned start can push the range into one extra chunk;
    # round to a multiple of 8 — the transmittance-checkpoint block has
    # max_chunks as its sublane dimension and a misaligned size makes
    # Mosaic emit masked stores (max_chunks=9 measured ~60 ms slower than
    # 16 at the 1080p bench)
    max_chunks = -(-(max(max_per_tile // CS, 1) + 1) // 8) * 8
    assert dup_capacity % CS == 0, "dup_capacity must be a multiple of 128"
    if row_phase is None:
        row_phase = jnp.zeros((1,), jnp.int32)
    else:
        row_phase = jnp.reshape(row_phase, (1,)).astype(jnp.int32)
    has_row_map = row_map is not None
    if has_row_map:
        row_map = row_map.astype(jnp.int32)
        row_cumown = row_cumown.astype(jnp.int32)
        assert row_map.shape[0] == gy, (row_map.shape, gy)
        rowp_kernel = row_map                       # [gy] map for the kernel
    else:
        row_map = jnp.zeros((1,), jnp.int32)        # dummies (traced args)
        row_cumown = jnp.zeros((1,), jnp.int32)
        rowp_kernel = row_phase
    has_col_map = col0_map is not None
    if has_col_map:
        assert has_row_map, "col0_map/col1_map require row_map"
        col0_map = col0_map.astype(jnp.int32)
        col1_map = col1_map.astype(jnp.int32)
    else:
        col0_map = jnp.zeros((1,), jnp.int32)       # dummies (traced args)
        col1_map = jnp.zeros((1,), jnp.int32)

    packets = pack_projected(proj)                       # [N, 10]
    if pallas_expand:
        from .expand_pallas import BLOCK
        # graceful fallback: the block one-hot kernel needs BLOCK-aligned
        # capacity; arbitrary user --dup_capacity values keep working
        pallas_expand = dup_capacity % BLOCK == 0
    bins, cols = _bin_with_payload(
        packets, jax.tree.map(jax.lax.stop_gradient, proj),
        (width, height, tile_x, tile_y, dup_capacity, row_stride,
         bool(bf16_features),
         "pallas" if pallas_expand else "repeat", interpret,
         bool(exact_cull), bool(pallas_fold), has_row_map,
         bool(fwd_only), has_col_map),
        (row_phase, row_map, row_cumown, col0_map, col1_map))  # 10 x [D]
    # stack along axis 0: each sorted column becomes one contiguous feature
    # row — no [D, 10] <-> [10, D] relayout anywhere on the hot path
    feats = jnp.concatenate(
        [jnp.stack(cols, axis=0),
         jnp.zeros((NFEAT - 10, cols[0].shape[0]), jnp.float32)],
        axis=0)                                          # [NFEAT, D]

    statics = _Statics(num_tiles=num_tiles, gx=gx, tile_x=tile_x,
                       tile_y=tile_y, max_chunks=max_chunks,
                       interpret=interpret, tiles_per_program=4,
                       row_stride=row_stride, use_row_map=has_row_map)
    out = _raster_tiles(feats, bins.tile_start, bins.tile_end, rowp_kernel,
                        statics)

    color = out[:, 0:3, :]                               # [T, 3, PIX]
    invd = out[:, 3, :]                                  # [T, PIX]
    tmin = out[:, 5, :]                                  # [T, PIX]
    img = color + tmin[:, None, :] * bg[None, :, None]

    def untile(x):                                       # [T, C, PIX] -> [C, H, W]
        c = x.shape[1]
        x = x.reshape(gy, gx, c, tile_y, tile_x)
        x = x.transpose(2, 0, 3, 1, 4).reshape(c, gy * tile_y, gx * tile_x)
        return x[:, :height, :width]

    image = untile(img)
    invdepth = untile(invd[:, None, :])
    finalT = untile(tmin[:, None, :])[0]
    max_len = jnp.max(bins.tile_end - bins.tile_start)
    overflow = bins.overflow | (max_len > max_per_tile)
    return (image, invdepth, finalT, bins.num_duplicates, max_len, overflow,
            bins.num_valid)
