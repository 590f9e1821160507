"""Pallas TPU rasterizer: per-tile alpha compositing, forward + custom VJP.

TPU-native replacement for the CUDA render/backward kernels
(ref: SURVEY.md §2.3-N1; semantics identical to gs_tpu.ops.composite and the
jnp binned backend, which serve as its correctness oracles).

Design (one grid program per 16x16 tile):
  * entries are chunk-aligned per tile (ops/binning.bin_gaussians_aligned) so
    each 128-entry feature block is a single contiguous, aligned HBM->VMEM DMA
  * alpha is computed as a [128 entries, 256 pixels] VPU block; the running
    transmittance uses the log1p/cumsum formulation with the cumulative sum
    done as a triangular-ones matmul on the MXU
  * per-pixel color/invdepth accumulate via a [entries, pixels] x [entries, 4]
    contraction on the MXU
  * tiles terminate early once every pixel's transmittance falls below 1e-4
    (the CUDA kernel's per-pixel `done` flag, done per-tile here)
  * backward re-walks each tile: sweep 1 recomputes per-chunk transmittance
    carries into VMEM scratch, sweep 2 walks chunks back-to-front carrying the
    suffix sum S_g = sum_{h>g} w_h (c_h . dL/dC + invd_h . dL/dI) and emits
    per-entry gradients for all 10 packet features; XLA's gather-VJP
    (segment sum over entry -> gaussian ids) completes the chain.

Feature-row layout ([DA, 16] f32, rows beyond 10 are padding):
  0 x, 1 y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity, 6 r, 7 g, 8 b,
  9 invdepth, 10 valid flag.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.project import Projected
from .binning import bin_gaussians_aligned, tile_grid
from .composite import ALPHA_MAX, ALPHA_MIN, T_EPS
from .rasterize_jnp import pack_projected

CS = 128          # entries per chunk (= lane width)
NFEAT = 16


def _tri_matrices(cs: int):
    """(L_incl [cs,cs], SU [cs,cs]) built in-kernel via iota compares."""
    row = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    l_incl = (col <= row).astype(jnp.float32)   # cum[j] = sum_{i<=j}
    s_upper = (col > row).astype(jnp.float32)   # suffix[j] = sum_{i>j}
    return l_incl, s_upper


def _chunk_alpha(f, px, py):
    """f: [CS, NFEAT] chunk features; px/py: [1, PIX].

    Returns (alpha [CS, PIX] after all forward masks, plus intermediates
    needed by the backward chain)."""
    x = f[:, 0:1]
    y = f[:, 1:2]
    ca = f[:, 2:3]
    cb = f[:, 3:4]
    cc = f[:, 4:5]
    op = f[:, 5:6]
    valid = f[:, 10:11]
    dx = x - px
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    opg = op * g
    alpha_c = jnp.minimum(ALPHA_MAX, opg)
    keep = (power <= 0.0) & (alpha_c >= ALPHA_MIN) & (valid > 0.5)
    alpha = jnp.where(keep, alpha_c, 0.0)
    # gate for d(op*g): skip-masked or clamped entries pass no gradient
    gate = (keep & (opg < ALPHA_MAX)).astype(jnp.float32)
    return alpha, g, opg, dx, dy, gate


def _fwd_kernel(tile_start_ref, tile_nchunks_ref, feats_hbm, out_ref,
                fbuf, sem, *, gx, tile_x, tile_y, pix):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    nchunks = tile_nchunks_ref[t]
    l_incl, _ = _tri_matrices(CS)

    pid = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1).astype(jnp.float32)
    tcol = (t % gx).astype(jnp.float32)
    trow = (t // gx).astype(jnp.float32)
    px = tcol * tile_x + pid % tile_x
    py = trow * tile_y + jnp.floor(pid / tile_x)

    out_ref[0] = jnp.zeros((8, pix), jnp.float32)
    out_ref[0, 4:5] = jnp.ones((1, pix), jnp.float32)   # running T
    out_ref[0, 5:6] = jnp.ones((1, pix), jnp.float32)   # frozen T (Tmin)

    def body(carry):
        k, _ = carry
        dma = pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(start + k * CS, CS), CS)], fbuf, sem)
        dma.start()
        dma.wait()
        f = fbuf[:].T                                    # [CS, NFEAT]
        alpha, _, _, _, _, _ = _chunk_alpha(f, px, py)

        lg = jnp.log1p(-alpha)                           # [CS, PIX]
        cum = jnp.dot(l_incl, lg, preferred_element_type=jnp.float32)
        u_prev = out_ref[0, 4:5]                         # [1, PIX]
        u_incl = u_prev * jnp.exp(cum)
        u_excl = u_prev * jnp.exp(cum - lg)
        live = (u_incl >= T_EPS).astype(jnp.float32)
        w = alpha * u_excl * live                        # [CS, PIX]

        contrib = jax.lax.dot_general(
            f[:, 6:10], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [4, PIX]
        out_ref[0, 0:4] += contrib
        u_new = u_incl[CS - 1:CS, :]
        tmin = jnp.min(jnp.where(live > 0, u_incl, jnp.inf), axis=0,
                       keepdims=True)
        out_ref[0, 5:6] = jnp.minimum(out_ref[0, 5:6], tmin)
        out_ref[0, 4:5] = u_new
        return k + 1, jnp.max(u_new)

    def cond(carry):
        k, umax = carry
        return (k < nchunks) & (umax >= T_EPS)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))


def _bwd_kernel(tile_start_ref, tile_nchunks_ref, feats_hbm, out_fwd_ref,
                dout_ref, dfeats_hbm, fbuf, dbuf, ustore, sem_in, sem_out,
                *, gx, tile_x, tile_y, pix, max_chunks):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    nchunks = tile_nchunks_ref[t]
    l_incl, s_upper = _tri_matrices(CS)

    pid = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1).astype(jnp.float32)
    tcol = (t % gx).astype(jnp.float32)
    trow = (t // gx).astype(jnp.float32)
    px = tcol * tile_x + pid % tile_x
    py = trow * tile_y + jnp.floor(pid / tile_x)

    dldc = dout_ref[0, 0:3]                               # [3, PIX]
    dldi = dout_ref[0, 3:4]                               # [1, PIX]
    dldt = dout_ref[0, 5:6]                               # [1, PIX]
    tmin = out_fwd_ref[0, 5:6]                            # [1, PIX] value

    # ---- sweep 1: store per-chunk entering transmittance ------------------
    def body1(carry):
        k, u_prev = carry
        ustore[pl.ds(k, 1), :] = u_prev
        dma = pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(pl.multiple_of(start + k * CS, CS), CS)], fbuf, sem_in)
        dma.start()
        dma.wait()
        alpha, _, _, _, _, _ = _chunk_alpha(fbuf[:].T, px, py)
        lg = jnp.log1p(-alpha)
        cum = jnp.dot(l_incl, lg, preferred_element_type=jnp.float32)
        u_incl = u_prev * jnp.exp(cum)
        return k + 1, u_incl[CS - 1:CS, :]

    def cond1(carry):
        k, u_prev = carry
        return (k < nchunks) & (jnp.max(u_prev) >= T_EPS)

    kproc, _ = jax.lax.while_loop(
        cond1, body1, (jnp.int32(0), jnp.ones((1, pix), jnp.float32)))

    # ---- sweep 2: back-to-front with suffix carry S ------------------------
    def body2(j, s_carry):
        k = nchunks - 1 - j

        def compute(s_carry):
            dma = pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(pl.multiple_of(start + k * CS, CS), CS)], fbuf, sem_in)
            dma.start()
            dma.wait()
            f = fbuf[:].T                                # [CS, NFEAT]
            alpha, g, opg, dx, dy, gate = _chunk_alpha(f, px, py)
            lg = jnp.log1p(-alpha)
            cum = jnp.dot(l_incl, lg, preferred_element_type=jnp.float32)
            u_prev = ustore[pl.ds(k, 1), :]
            u_incl = u_prev * jnp.exp(cum)
            u_excl = u_prev * jnp.exp(cum - lg)
            live = (u_incl >= T_EPS).astype(jnp.float32)
            w = alpha * u_excl * live                     # [CS, PIX]

            # per-(entry,pixel) upstream scalar: c_e . dL/dC_p + invd_e dL/dI_p
            cdot = jax.lax.dot_general(
                f[:, 6:9], dldc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [CS, PIX]
            cdot = cdot + f[:, 9:10] * dldi
            wc = w * cdot
            suffix = jnp.dot(s_upper, wc,
                             preferred_element_type=jnp.float32)
            s_total = suffix + s_carry                    # [CS, PIX]

            inv1ma = 1.0 / (1.0 - alpha)
            dalpha = (cdot * u_excl * live
                      - s_total * inv1ma
                      - dldt * tmin * inv1ma * live)

            dopg = dalpha * gate
            d_op = jnp.sum(dopg * g, axis=1, keepdims=True)       # [CS,1]
            dpower = dopg * opg
            d_ca = jnp.sum(dpower * (-0.5 * dx * dx), axis=1, keepdims=True)
            d_cb = jnp.sum(dpower * (-dx * dy), axis=1, keepdims=True)
            d_cc = jnp.sum(dpower * (-0.5 * dy * dy), axis=1, keepdims=True)
            ca = f[:, 2:3]
            cb = f[:, 3:4]
            cc = f[:, 4:5]
            d_x = jnp.sum(dpower * (-(ca * dx + cb * dy)), axis=1,
                          keepdims=True)
            d_y = jnp.sum(dpower * (-(cc * dy + cb * dx)), axis=1,
                          keepdims=True)
            d_rgb = jax.lax.dot_general(
                w, dldc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # [CS, 3]
            d_invd = jax.lax.dot_general(
                w, dldi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # [CS, 1]

            zeros5 = jnp.zeros((CS, NFEAT - 11), jnp.float32)
            zeros1 = jnp.zeros((CS, 1), jnp.float32)
            dgrad = jnp.concatenate(
                [d_x, d_y, d_ca, d_cb, d_cc, d_op, d_rgb, d_invd,
                 zeros1, zeros5], axis=1)                # [CS, NFEAT]
            dbuf[:] = dgrad.T
            return jnp.sum(wc, axis=0, keepdims=True) + s_carry

        def zero(s_carry):
            dbuf[:] = jnp.zeros((NFEAT, CS), jnp.float32)
            return s_carry

        s_carry = jax.lax.cond(k < kproc, compute, zero, s_carry)
        dma_out = pltpu.make_async_copy(
            dbuf, dfeats_hbm.at[:, pl.ds(pl.multiple_of(start + k * CS, CS), CS)], sem_out)
        dma_out.start()
        dma_out.wait()
        return s_carry

    jax.lax.fori_loop(0, nchunks, body2, jnp.zeros((1, pix), jnp.float32))


class _Statics(NamedTuple):
    num_tiles: int
    gx: int
    tile_x: int
    tile_y: int
    max_chunks: int
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _raster_tiles(feats, tile_start, tile_nchunks, statics: _Statics):
    out, _ = _raster_tiles_fwd(feats, tile_start, tile_nchunks, statics)
    return out


def _raster_tiles_fwd(feats, tile_start, tile_nchunks, statics: _Statics):
    s = statics
    pix = s.tile_x * s.tile_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s.num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((1, 8, pix), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NFEAT, CS), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_fwd_kernel, gx=s.gx, tile_x=s.tile_x,
                               tile_y=s.tile_y, pix=pix)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s.num_tiles, 8, pix), jnp.float32),
        interpret=s.interpret,
    )(tile_start, tile_nchunks, feats)
    return out, (feats, tile_start, tile_nchunks, out)


def _raster_tiles_bwd(statics: _Statics, residuals, dout):
    s = statics
    feats, tile_start, tile_nchunks, out_fwd = residuals
    pix = s.tile_x * s.tile_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s.num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 8, pix), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, pix), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((NFEAT, CS), jnp.float32),
            pltpu.VMEM((NFEAT, CS), jnp.float32),
            pltpu.VMEM((s.max_chunks, pix), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_bwd_kernel, gx=s.gx, tile_x=s.tile_x,
                               tile_y=s.tile_y, pix=pix,
                               max_chunks=s.max_chunks)
    dfeats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feats.shape, jnp.float32),
        interpret=s.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_nchunks, feats, out_fwd, dout)
    # slack chunks past the last tile are never written by any program; the
    # valid flag (feature row 10) masks that garbage (which may be NaN) out
    dfeats = jnp.where(feats[10:11, :] > 0.5, dfeats, 0.0)
    return dfeats, None, None


_raster_tiles.defvjp(_raster_tiles_fwd, _raster_tiles_bwd)


def rasterize_pallas(proj: Projected, width: int, height: int,
                     bg: jnp.ndarray, *, tile_x: int = 16, tile_y: int = 16,
                     max_per_tile: int = 4096, dup_capacity: int = 1 << 20,
                     interpret: bool = False):
    """Render via the Pallas tile kernel; differentiable w.r.t. ``proj``
    through the packet features.

    Returns (image [3,H,W], invdepth [1,H,W], finalT [H,W],
    num_duplicates, max_tile_len, overflow)."""
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    num_tiles = gx * gy
    pix = tile_x * tile_y
    max_chunks = max(max_per_tile // CS, 1)

    abins = bin_gaussians_aligned(proj, width, height, tile_x, tile_y,
                                  dup_capacity, CS, max_chunks)
    packets = pack_projected(proj)                       # [N, 10]
    gathered = packets[abins.entry_gid]                  # [DA, 10]
    valid_col = abins.entry_valid.astype(jnp.float32)[:, None]
    pad = jnp.zeros((gathered.shape[0], NFEAT - 11), jnp.float32)
    feats = jnp.concatenate([gathered, valid_col, pad], axis=1).T  # [NFEAT, DA]

    statics = _Statics(num_tiles=num_tiles, gx=gx, tile_x=tile_x,
                       tile_y=tile_y, max_chunks=max_chunks,
                       interpret=interpret)
    out = _raster_tiles(feats, abins.tile_start, abins.tile_nchunks, statics)

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
    return (image, invdepth, finalT, abins.num_duplicates,
            abins.max_tile_len, abins.overflow)
