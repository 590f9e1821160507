"""Pallas expansion kernel (ops/expand_pallas.py) vs the jnp.repeat path.

Runs the kernel in interpret mode on CPU; correctness on real TPU rides the
same code path (modulo Mosaic layout constraints, validated on-chip before
the flag defaults on).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_tpu.core.project import preprocess
from gs_tpu.ops.binning import bin_gaussians_payload
from gs_tpu.ops.expand_pallas import BLOCK, ROWS, expand_rows
from gs_tpu.ops.rasterize_jnp import pack_projected

from utils import default_camera, random_params


def _ref_expand(comb, counts, capacity):
    """numpy oracle: row-repeat by counts, zero-padded to capacity."""
    reps = np.repeat(np.arange(comb.shape[1]), counts)[:capacity]
    out = np.zeros((comb.shape[0], capacity), np.float32)
    out[:, :reps.shape[0]] = np.asarray(comb)[:, reps]
    return out


def _counts_case(rng, n, zero_frac=0.3, hi=40):
    counts = rng.integers(1, hi, size=n).astype(np.int32)
    nz = int(n * zero_frac)
    if nz:
        counts[n - nz:] = 0          # zero-count gaussians contiguous at end
    return counts


@pytest.mark.parametrize("n,capacity", [(37, 1024), (300, 4096), (64, 512)])
def test_expand_rows_matches_repeat(n, capacity):
    rng = np.random.default_rng(5 + n)
    counts = _counts_case(rng, n)
    total = int(counts.sum())
    if total > capacity:             # keep the no-truncation case exact
        counts = (counts * (capacity // 2) // max(total, 1)).astype(np.int32)
        counts = np.maximum(counts, np.where(np.arange(n) < n // 2, 1, 0))
        counts[np.flatnonzero(counts == 0)] = 0
    offsets = np.cumsum(counts) - counts
    payload = rng.normal(0, 3, (ROWS - 2, n)).astype(np.float32)
    comb = np.concatenate([offsets[None].astype(np.float32),
                           counts[None].astype(np.float32), payload], axis=0)
    out = expand_rows(jnp.asarray(comb), jnp.asarray(offsets, jnp.int32),
                      capacity, interpret=True)
    ref = _ref_expand(comb, counts, capacity)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_expand_rows_truncation():
    """Overflow: counts sum past capacity — entries cut exactly at capacity."""
    rng = np.random.default_rng(11)
    n, capacity = 200, 512
    counts = rng.integers(1, 12, size=n).astype(np.int32)
    assert counts.sum() > capacity
    offsets = np.cumsum(counts) - counts
    payload = rng.normal(0, 1, (ROWS - 2, n)).astype(np.float32)
    comb = np.concatenate([offsets[None].astype(np.float32),
                           counts[None].astype(np.float32), payload], axis=0)
    out = expand_rows(jnp.asarray(comb), jnp.asarray(offsets, jnp.int32),
                      capacity, interpret=True)
    ref = _ref_expand(comb, counts, capacity)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_expand_rows_single_giant_run():
    """One gaussian owning multiple whole blocks (count >> BLOCK)."""
    n, capacity = 8, 4 * BLOCK
    counts = np.array([3, 3 * BLOCK, 5, 0, 0, 0, 0, 0], np.int32)
    offsets = np.cumsum(counts) - counts
    rng = np.random.default_rng(1)
    payload = rng.normal(0, 1, (ROWS - 2, n)).astype(np.float32)
    comb = np.concatenate([offsets[None].astype(np.float32),
                           counts[None].astype(np.float32), payload], axis=0)
    out = expand_rows(jnp.asarray(comb), jnp.asarray(offsets, jnp.int32),
                      capacity, interpret=True)
    ref = _ref_expand(comb, counts, capacity)
    np.testing.assert_array_equal(np.asarray(out), ref)


def _bin_both(params, cam, capacity, row_phase=0, row_stride=1):
    proj = preprocess(params, cam, active_sh_degree=1)
    payload = pack_projected(proj)
    kw = dict(width=cam.width, height=cam.height, tile_x=16, tile_y=16,
              capacity=capacity, row_phase=row_phase, row_stride=row_stride)
    br, cr = bin_gaussians_payload(proj, payload, **kw)
    bp, cp = bin_gaussians_payload(proj, payload, expand="pallas",
                                   expand_interpret=True, **kw)
    return (br, cr), (bp, cp)


@pytest.mark.parametrize("row_stride,row_phase", [(1, 0), (2, 1)])
def test_binning_pallas_expand_matches_repeat(row_stride, row_phase):
    rng = np.random.default_rng(7)
    params = random_params(rng, 300)
    cam = default_camera(96, 64 * row_stride)
    # render bands of the taller frame when strided (local height 64)
    if row_stride > 1:
        cam = default_camera(96, 64)
    (br, cr), (bp, cp) = _bin_both(params, cam, capacity=2048,
                                   row_phase=row_phase, row_stride=row_stride)
    np.testing.assert_array_equal(br.tile_start, bp.tile_start)
    np.testing.assert_array_equal(br.tile_end, bp.tile_end)
    np.testing.assert_array_equal(br.entry_valid, bp.entry_valid)
    np.testing.assert_array_equal(br.gauss_counts, bp.gauss_counts)
    assert int(br.num_duplicates) == int(bp.num_duplicates)
    assert bool(br.overflow) == bool(bp.overflow)
    valid = np.asarray(br.entry_valid)
    np.testing.assert_array_equal(np.asarray(br.entry_gid)[valid],
                                  np.asarray(bp.entry_gid)[valid])
    for a, b in zip(cr, cp):
        np.testing.assert_array_equal(np.asarray(a)[valid],
                                      np.asarray(b)[valid])


@pytest.mark.slow
def test_render_pallas_expand_end_to_end():
    """Full pallas render + grads with the expansion kernel (interpret)."""
    from gs_tpu.render import render
    rng = np.random.default_rng(3)
    params = random_params(rng, 200)
    cam = default_camera(96, 64)
    bg = jnp.zeros(3)

    def loss(p, expand):
        out = render(cam, p, bg, active_sh_degree=2,
                     backend="pallas_interpret", dup_capacity=2048,
                     max_per_tile=512, pallas_expand=expand)
        return jnp.sum(out.image ** 2) + jnp.sum(out.invdepth ** 2), out

    (l0, o0), g0 = jax.value_and_grad(loss, has_aux=True)(params, False)
    (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(params, True)
    np.testing.assert_array_equal(np.asarray(o0.image), np.asarray(o1.image))
    np.testing.assert_array_equal(np.asarray(o0.invdepth),
                                  np.asarray(o1.invdepth))
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
