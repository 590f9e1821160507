"""Pallas TPU segment-fold kernel: the gradient fold's per-gaussian reduction.

The raster backward produces per-ENTRY cotangent rows; the fold reduces them
to per-GAUSSIAN rows (ref CUDA analogue: the atomicAdd accumulation inside
renderCUDA's backward, SURVEY.md §2.3-N1). The jnp formulation
(ops/segment.py::segment_sum_runend) sorts by gid then does
stack -> cumsum -> run-end gathers; the gathers pull ~N random rows out of a
[D, F] HBM-resident table and measured ~25 ms at D=4.2M on v5e (random row
reads from a table far bigger than VMEM are latency-bound). This kernel
replaces everything AFTER the sort with streaming + one MXU contraction:

  * input: gid-SORTED cotangent rows [16, D] (rows 10+ zero padding) — runs
    of each gaussian's entries are contiguous, ascending by ORIGINAL id
    (exactly what segment_sum_runend's sort produces), plus the exclusive
    run-start offsets (= exclusive cumsum of the per-gaussian counts).
  * one grid program per OB=128 output gaussians. The program's entries
    live in [offsets[g0], offsets[g0 + OB]) — it streams that window in
    CW=512-entry chunks (double-buffered DMA) and accumulates
    out[16, OB] += chunk[16, CW] . W[CW, OB] on the MXU, where
    W[e, g] = (off[g] <= E_e < off[g] + cnt[g]) is built in-register from
    a sublane iota against the block's offset/count lane rows.
  * entries outside the block's own runs (align-down slack at the window
    start, over-read at the window end, capacity-padding sentinel tail)
    match no gaussian in the block and contribute exact zeros — reads only
    need to stay inside the padded array.
  * precision HIGHEST (bf16x6) keeps the f32 cotangent sums at effectively
    f32 accuracy (same transport as ops/expand_pallas.py).

Cost model at D=4.2M: stream ~290 MB sequentially + ~2 G VPU compares +
~70 G bf16 MACs -> a few ms, vs ~35 ms for stack+cumsum+gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16     # field rows (8-aligned for Mosaic HBM slicing)
OB = 128      # gaussians per grid program (output block lanes)
CW = 512      # entries per inner chunk


def _chunk_dma(data_hbm, dbuf, sem, w0, k, slot):
    return pltpu.make_async_copy(
        data_hbm.at[:, pl.ds(pl.multiple_of(w0 + k * CW, 128), CW)],
        dbuf.at[slot], sem.at[slot])


def _fold_kernel(w0_ref, nch_ref, data_hbm, oc_ref, out_ref, dbuf, sem):
    b = pl.program_id(0)
    w0 = w0_ref[b]
    nch = nch_ref[b]
    off = oc_ref[0:1, :]                                  # [1, OB]
    cnt = oc_ref[1:2, :]
    out_ref[...] = jnp.zeros((ROWS, OB), jnp.float32)

    @pl.when(nch > 0)
    def _():
        _chunk_dma(data_hbm, dbuf, sem, w0, 0, 0).start()

    def body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nch)
        def _():
            _chunk_dma(data_hbm, dbuf, sem, w0, k + 1, 1 - slot).start()

        _chunk_dma(data_hbm, dbuf, sem, w0, k, slot).wait()
        d = dbuf[slot]                                    # [ROWS, CW]
        e = (jax.lax.broadcasted_iota(jnp.int32, (CW, 1), 0)
             + w0 + k * CW).astype(jnp.float32)           # [CW, 1]
        w = ((off <= e) & (e < off + cnt)).astype(jnp.float32)  # [CW, OB]
        out_ref[...] += jax.lax.dot_general(
            d, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)          # [ROWS, OB]
        return carry

    jax.lax.fori_loop(0, nch, body, jnp.int32(0))


def fold_rows(data: jnp.ndarray, offsets: jnp.ndarray, counts: jnp.ndarray,
              num_segments: int, *, interpret: bool = False) -> jnp.ndarray:
    """Per-segment sums of gid-sorted entry rows.

    data:     [ROWS, D] f32 — cotangent rows, entries sorted by original
              gaussian id (runs contiguous, ascending); sentinel entries
              (gid >= num_segments) must sit at the end.
    offsets:  [num_segments] int32 — exclusive run starts
              (cumsum(counts) - counts).
    counts:   [num_segments] int32 — entries per gaussian.
    Returns [ROWS, num_segments] f32 per-gaussian sums.
    """
    rows, d = data.shape
    assert rows == ROWS, f"data must have {ROWS} rows, got {rows}"
    assert d % 128 == 0, "entry axis must be 128-aligned"
    n = num_segments
    nb = -(-n // OB)
    n_pad = nb * OB

    # offset/count lane table; padding gaussians carry off=2^25, cnt=0 ->
    # never selected (same sentinel scheme as expand_pallas)
    oc = jnp.zeros((8, n_pad), jnp.float32)
    oc = oc.at[0, :].set(jnp.float32(1 << 25))
    oc = oc.at[0, :n].set(offsets.astype(jnp.float32))
    oc = oc.at[1, :n].set(counts.astype(jnp.float32))

    # window per block: [offsets[g0], offsets[g0+OB]) aligned down to 128;
    # over-reads past the window match no block gaussian and add zero, so
    # only ARRAY bounds matter — pad the entry axis by one chunk
    offz = jnp.concatenate(
        [offsets.astype(jnp.int32),
         jnp.full((1,), jnp.int32(0), jnp.int32)])
    total = (offsets[-1] + counts[-1]).astype(jnp.int32) if n > 0 else 0
    offz = offz.at[-1].set(total)
    firsts = jnp.minimum(jnp.arange(nb, dtype=jnp.int32) * OB, n)
    lasts = jnp.minimum(firsts + OB, n)
    wstart = offz[firsts]
    wend = offz[lasts]
    w0 = (wstart // 128) * 128
    nch = jnp.maximum(-(-(wend - w0) // CW), 0).astype(jnp.int32)

    d_pad = jnp.pad(data, ((0, 0), (0, CW)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((8, OB), lambda b, *_: (0, b),
                         memory_space=pltpu.MemorySpace.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, OB), lambda b, *_: (0, b),
                               memory_space=pltpu.MemorySpace.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _fold_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.float32),
        interpret=interpret,
    )(w0, nch, d_pad, oc)
    return out[:, :n]
