"""Pallas TPU row-expansion kernel: the binning stage's duplicate expansion.

Replaces ``jnp.repeat(comb, counts, axis=0, total_repeat_length=capacity)``
(ref CUDA analogue: duplicateWithKeys, SURVEY.md §2.3-N1), which XLA lowers
to a serialized monotone row gather measured ~27 ms at 4.2M rows on v5e —
~30x off HBM speed-of-light for the ~500 MB it moves.

Formulation (one grid program per BLOCK=512 output entries):
  * the source table rides as [16, N_pad] f32 — field rows, gaussians on
    lanes; row 0 = exclusive offsets, row 1 = counts, rows 2+ = payload.
    All integer fields ride as exact f32 values (< 2^24, asserted by the
    caller) — same transport as ops/binning.py.
  * a 512-entry output block can only draw from a bounded window of source
    gaussians: the caller sorts zero-count gaussians to the end, so every
    gaussian in the active prefix occupies >= 1 entry and a B-entry block
    spans <= B distinct gaussians. With the window start aligned down to
    128 lanes, GWIN = BLOCK + 128 columns always cover the block.
  * per block: one DMA of the [16, GWIN] slice at the prefetched window
    start (double-buffered across grid steps), then the selection matrix
    W[i, g] = (off[g] <= e_i) & (e_i < off[g] + cnt[g]) is built with e_i
    as a sublane iota against the offset/count LANE rows — no transposes —
    and the expansion is ONE MXU contraction out[16, B] = slice . W^T
    (dot_general over the lane dims; the MXU transposes the RHS on load).
    Precision HIGHEST (bf16x6) keeps integer fields < 2^24 exact.
  * entries past the true total match no gaussian's [off, off+cnt) window,
    so W is all-zero there and padding rows come out zero; the caller
    clamps sw >= 1 before the tile-id math and masks validity exactly as
    it does for the repeat path.

Cost model at 4.2M entries: compares ~ D*GWIN*4 VPU ops ~ 10.7G, matmul
16*GWIN*B*2 per block at bf16x6 ~ 2.6 ms MXU, DMA ~ 1.25x the output
bytes. Expected ~5-6 ms vs 27 ms for the XLA repeat.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16      # field rows (8-aligned for Mosaic HBM slicing)
import os as _os
BLOCK = int(_os.environ.get("GS_EXPAND_BLOCK", "256"))
# output entries per grid program. The one-hot mask is [BLOCK, GWIN] and
# GWIN grows with BLOCK, so the per-entry one-hot compare cost scales
# ~(BLOCK+128)/BLOCK x: 256 measured 9.4 ms in-context vs 11.5 at 512,
# 128 regresses on grid overhead (perf_r5n, r5) — the VPU compares, not
# the MXU passes, dominate.
GWIN = BLOCK + 128   # source window: <= BLOCK distinct gaussians + 128
                     # lanes of align-down slack


def _slice_dma(comb_hbm, sbuf, sem, start, slot):
    return pltpu.make_async_copy(
        comb_hbm.at[:, pl.ds(pl.multiple_of(start, 128), GWIN)],
        sbuf.at[slot], sem.at[slot])


def _expand_kernel(g0_ref, comb_hbm, out_ref, sbuf, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = b % 2
    nxt = (b + 1) % 2

    @pl.when(b == 0)
    def _():
        _slice_dma(comb_hbm, sbuf, sem, g0_ref[0], 0).start()

    @pl.when(b + 1 < nb)
    def _():
        _slice_dma(comb_hbm, sbuf, sem, g0_ref[b + 1], nxt).start()

    _slice_dma(comb_hbm, sbuf, sem, g0_ref[b], slot).wait()

    s = sbuf[slot]                                     # [ROWS, GWIN]
    off = s[0:1, :]                                    # [1, GWIN]
    cnt = s[1:2, :]
    # e_i on SUBLANES, offsets on LANES: both in natural orientation.
    # iota must be INTEGER-typed for Mosaic (tpu.iota rejects f32 results —
    # the r3 interpret-only blind spot); convert after the add
    e = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
         + b * BLOCK).astype(jnp.float32)              # [BLOCK, 1]
    w = ((off <= e) & (e < off + cnt)).astype(jnp.float32)   # [BLOCK, GWIN]
    # out[r, i] = sum_g s[r, g] * w[i, g] — contraction over the lane dims;
    # HIGHEST keeps one-hot-selected integers < 2^24 exact (bf16x6 carries
    # 24 mantissa bits)
    out_ref[...] = jax.lax.dot_general(
        s, w, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)           # [ROWS, BLOCK]


def expand_rows(comb: jnp.ndarray, offsets: jnp.ndarray, capacity: int,
                *, interpret: bool = False) -> jnp.ndarray:
    """Expand per-gaussian field rows to per-entry rows.

    comb:    [ROWS, N] f32 — row 0 exclusive offsets, row 1 counts (both
             exact-int f32), rows 2+ arbitrary payload. Gaussians with
             count 0 MUST be contiguous at the end (the caller sorts them
             there); offsets are nondecreasing.
    offsets: [N] int32 — the same exclusive offsets (for the window search).
    capacity: static output length, a multiple of BLOCK.

    Returns [ROWS, capacity] f32 where output entry e carries the fields of
    the gaussian whose [offset, offset+count) window contains e, and zeros
    past the total.
    """
    rows, n = comb.shape
    assert rows == ROWS, f"comb must have {ROWS} rows, got {rows}"
    assert capacity % BLOCK == 0, "capacity must be a multiple of BLOCK"
    nb = capacity // BLOCK

    # pad the gaussian axis so any 128-aligned window fits; padding rows
    # carry off=2^25 (exactly representable), cnt=0 -> never selected
    n_pad = -(-(n + GWIN) // 128) * 128
    pad = n_pad - n
    pad_rows = jnp.zeros((ROWS, pad), jnp.float32).at[0, :].set(
        jnp.float32(1 << 25))
    comb_p = jnp.concatenate([comb.astype(jnp.float32), pad_rows], axis=1)

    # window start per block: owner gaussian of the block's first entry,
    # aligned down to 128 lanes (nb ~ thousands of queries — cheap; it is
    # MILLIONS of searchsorted queries that serialize on TPU)
    firsts = jnp.arange(nb, dtype=jnp.int32) * BLOCK
    owner = jnp.searchsorted(offsets, firsts, side='right').astype(
        jnp.int32) - 1
    g0 = jnp.clip(owner, 0, n_pad - GWIN)
    g0 = (g0 // 128) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((ROWS, BLOCK), lambda b, *_: (0, b),
                               memory_space=pltpu.MemorySpace.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, GWIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, capacity), jnp.float32),
        interpret=interpret,
    )(g0, comb_p)
