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
    safe_gid = jnp.where(is_last, sgid, num_segments)
    ends = jnp.zeros((num_segments + 1, f), values.dtype)
    ends = ends.at[safe_gid].set(cum, mode='drop', unique_indices=True)
    ends = ends[:num_segments]
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
    out = jnp.zeros((num_segments + 1, f), values.dtype)
    # kk ascends by construction (compaction sort) — let XLA skip the
    # serialization it needs for arbitrary scatter indices
    out = out.at[kk].set(seg, mode='drop', unique_indices=True,
                         indices_are_sorted=True)
    return out[:num_segments]


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
    safe_gid = jnp.where(is_last, sgid, num_segments)
    ends = jnp.zeros((num_segments + 1, f), values.dtype)
    ends = ends.at[safe_gid].set(cum, mode='drop', unique_indices=True)
    ends = ends[:num_segments]
    # which segment slot holds the latest run at-or-before g: propagate the
    # index of the last nonempty segment with a cummax, then gather
    idx = jnp.arange(num_segments, dtype=jnp.int32)
    has = jnp.zeros((num_segments + 1,), bool).at[safe_gid].set(
        True, mode='drop', unique_indices=True)[:num_segments]
    last_idx = jax.lax.cummax(jnp.where(has, idx, -1))
    prev_idx = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                last_idx[:-1]])
    zero = jnp.zeros((1, f), values.dtype)
    ends_z = jnp.concatenate([zero, ends], axis=0)       # shift for -1
    cur = ends_z[jnp.where(has, idx, prev_idx) + 1]
    prv = ends_z[prev_idx + 1]
    return jnp.where(has[:, None], cur - prv, 0.0)


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
