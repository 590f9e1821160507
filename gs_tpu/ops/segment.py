"""Gather with a sort-based segment-sum VJP.

``packets[gid]`` differentiated by XLA produces a scatter-add, which
serializes on TPU (measured 336 ms for 4.2M x 10 rows -> 500k on v5e). The
transpose of a gather is a segment sum; this implements it with the ops that
ARE fast on TPU — a multi-operand sort, cumulative sums, and one
unique-index scatter of boundary rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def segment_sum_sorted(values: jnp.ndarray, gid: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """sum values[e] into out[gid[e]] via sort + cumsum + boundary scatter.

    values: [D, F] f32, gid: [D] int32 in [0, num_segments).
    """
    d, f = values.shape
    ops = jax.lax.sort((gid,) + tuple(values[:, i] for i in range(f)),
                       dimension=0, is_stable=False, num_keys=1)
    sgid = ops[0]
    data = jnp.stack(ops[1:], axis=1)                    # [D, F]
    cum = jnp.cumsum(data, axis=0)                       # [D, F]
    # run boundaries: last entry of each gid run
    nxt = jnp.concatenate([sgid[1:], jnp.full((1,), -1, sgid.dtype)])
    is_last = sgid != nxt                                # [D]
    # scatter the cumulative value at each run's end into its segment slot;
    # indices are unique by construction
    # sentinel = num_segments is OUT of bounds for the num_segments-row
    # buffer, so mode='drop' discards it and the remaining indices are
    # genuinely unique (a (num_segments+1)-row buffer would receive many
    # duplicate sentinel rows, violating the unique_indices promise)
    safe_gid = jnp.where(is_last, sgid, num_segments)
    ends = jnp.zeros((num_segments, f), values.dtype)
    ends = ends.at[safe_gid].set(cum, mode='drop', unique_indices=True)
    # per-segment sum = cum[end of run] - cum[end of previous nonempty run];
    # forward-fill empty segments with the previous run's cumulative value
    filled = jnp.zeros((num_segments,), bool).at[
        jnp.where(is_last, sgid, num_segments)].set(
        True, mode='drop', unique_indices=True)

    def fill_scan(carry, x):
        row, has = x
        row = jnp.where(has, row, carry)
        return row, row

    _, ends_filled = jax.lax.scan(fill_scan, jnp.zeros((f,), values.dtype),
                                  (ends, filled))
    prev = jnp.concatenate([jnp.zeros((1, f), values.dtype),
                            ends_filled[:-1]], axis=0)
    return ends_filled - prev


def segment_sum_compact(values: jnp.ndarray, gid: jnp.ndarray,
                        num_segments: int) -> jnp.ndarray:
    """Scatter-light segment sum: sort + cumsum + a COMPACTION sort so the
    final scatter touches only ``num_segments`` rows instead of all D
    (a D-row scatter-set measured 303 ms at D=4.2M on v5e; sorts are ~4 ms).
    """
    d, f = values.shape
    ops = jax.lax.sort((gid,) + tuple(values[:, i] for i in range(f)),
                       dimension=0, is_stable=False, num_keys=1)
    sgid = ops[0]
    data = jnp.stack(ops[1:], axis=1)                    # [D, F]
    cum = jnp.cumsum(data, axis=0)
    nxt = jnp.concatenate([sgid[1:], jnp.full((1,), -1, sgid.dtype)])
    is_last = sgid != nxt
    # compact the per-segment cumulative rows to the front, ordered by gid
    key2 = jnp.where(is_last, sgid, num_segments)
    ops2 = jax.lax.sort((key2,) + tuple(cum[:, i] for i in range(f)),
                        dimension=0, is_stable=False, num_keys=1)
    kk = ops2[0][:num_segments]                          # present gids asc
    c = jnp.stack(ops2[1:], axis=1)[:num_segments]       # their cumsums
    prev = jnp.concatenate([jnp.zeros((1, f), values.dtype), c[:-1]], axis=0)
    seg = c - prev                                       # per-present-gid sum
    out = jnp.zeros((num_segments, f), values.dtype)
    # kk ascends by construction (compaction sort) — let XLA skip the
    # serialization it needs for arbitrary scatter indices. Sentinel
    # indices (== num_segments, for absent gids) fall out of bounds and
    # are dropped, keeping the in-bounds indices genuinely unique.
    out = out.at[kk].set(seg, mode='drop', unique_indices=True,
                         indices_are_sorted=True)
    return out


def _segment_sum_scan_free(values, gid, num_segments):
    """Variant replacing the sequential scan with a cummax-based fill
    (faster on TPU; requires non-negative cumulative-index trick)."""
    d, f = values.shape
    ops = jax.lax.sort((gid,) + tuple(values[:, i] for i in range(f)),
                       dimension=0, is_stable=False, num_keys=1)
    sgid = ops[0]
    data = jnp.stack(ops[1:], axis=1)
    cum = jnp.cumsum(data, axis=0)
    nxt = jnp.concatenate([sgid[1:], jnp.full((1,), -1, sgid.dtype)])
    is_last = sgid != nxt
    # sentinel = num_segments is OUT of bounds for the num_segments-row
    # buffer, so mode='drop' discards it and the remaining indices are
    # genuinely unique (a (num_segments+1)-row buffer would receive many
    # duplicate sentinel rows, violating the unique_indices promise)
    safe_gid = jnp.where(is_last, sgid, num_segments)
    ends = jnp.zeros((num_segments, f), values.dtype)
    ends = ends.at[safe_gid].set(cum, mode='drop', unique_indices=True)
    # which segment slot holds the latest run at-or-before g: propagate the
    # index of the last nonempty segment with a cummax, then gather
    idx = jnp.arange(num_segments, dtype=jnp.int32)
    has = jnp.zeros((num_segments,), bool).at[safe_gid].set(
        True, mode='drop', unique_indices=True)
    last_idx = jax.lax.cummax(jnp.where(has, idx, -1))
    prev_idx = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                last_idx[:-1]])
    zero = jnp.zeros((1, f), values.dtype)
    ends_z = jnp.concatenate([zero, ends], axis=0)       # shift for -1
    cur = ends_z[jnp.where(has, idx, prev_idx) + 1]
    prv = ends_z[prev_idx + 1]
    return jnp.where(has[:, None], cur - prv, 0.0)


def segment_sum_runend(value_cols, gid: jnp.ndarray, counts: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """Segment sum when per-segment COUNTS are already known (the binning
    stage knows exactly how many entries each gaussian produced).

    Avoids both the boundary detection and the compaction sort of
    :func:`segment_sum_compact`: one sort groups the entries by gid, then the
    per-segment sum is ``cum[run_end] - cum[prev_run_end]`` where the run end
    positions come directly from ``cumsum(counts)``. Everything stays in
    structure-of-arrays form — stacking D-row [D, F] intermediates measured
    ~10x the cost of the per-column 1D ops on v5e.

    value_cols: tuple/list of F arrays [D] (or an [D, F] array)
    gid: [D] int32; entries not belonging to any segment MUST carry a
         sentinel >= num_segments (they sort to the end, past all runs)
    counts: [num_segments] int32 — exact number of entries per segment
    Returns [num_segments, F].
    """
    if hasattr(value_cols, 'ndim') and value_cols.ndim == 2:
        value_cols = tuple(value_cols[:, i] for i in range(value_cols.shape[1]))
    f = len(value_cols)
    ops = jax.lax.sort((gid,) + tuple(value_cols), dimension=0,
                       is_stable=False, num_keys=1)
    # ONE stacked cumsum + TWO row gathers — 2F separate per-column [S]
    # gathers measured ~4 ms each on v5e (~80 ms at F=10; the cost hides
    # from sliced-output microprobes, which DCE gathers to one element)
    data = jnp.stack(ops[1:], axis=1)                       # [D, F]
    cum = jnp.cumsum(data, axis=0)
    cz = jnp.concatenate([jnp.zeros((1, f), data.dtype), cum])  # [D+1, F]
    cc = jnp.cumsum(counts)                                 # [S]
    hi = cz.at[cc].get(indices_are_sorted=True, mode='clip')
    # lo[i] = cz[cc[i-1]] = hi[i-1] (exclusive prefix of the same gather) —
    # deriving it saves the second [S]-row gather (~12 ms at D=4.2M on v5e)
    lo = jnp.concatenate([jnp.zeros((1, f), data.dtype), hi[:-1]], axis=0)
    return hi - lo


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table: jnp.ndarray, gid: jnp.ndarray, num_rows: int):
    """table[gid] with a sort-based segment-sum VJP instead of scatter-add."""
    return table[gid]


def _gather_fwd(table, gid, num_rows):
    return table[gid], gid


def _gather_bwd(num_rows, gid, g):
    dtable = segment_sum_compact(g, gid, num_rows)
    return dtable, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
