"""Sort-based segment sum vs scatter-add ground truth."""
import numpy as np
import jax
import jax.numpy as jnp

from gs_tpu.ops.segment import (gather_rows, segment_sum_compact,
                                segment_sum_sorted, _segment_sum_scan_free)


def test_segment_sum_variants(rng):
    d, f, n = 5000, 7, 300
    vals = jnp.asarray(rng.normal(size=(d, f)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, n, d), jnp.int32)
    expected = np.zeros((n, f), np.float32)
    np.add.at(expected, np.asarray(gid), np.asarray(vals))
    for fn in (segment_sum_sorted, _segment_sum_scan_free,
               segment_sum_compact):
        got = np.asarray(fn(vals, gid, n))
        np.testing.assert_allclose(got, expected, atol=1e-3,
                                   err_msg=fn.__name__)


def test_segment_sum_empty_and_dense(rng):
    # segments with no entries must be exactly zero; all-same-gid too
    vals = jnp.ones((64, 2), jnp.float32)
    gid = jnp.full((64,), 5, jnp.int32)
    for fn in (_segment_sum_scan_free, segment_sum_compact):
        out = np.asarray(fn(vals, gid, 10))
        assert out[5, 0] == 64.0
        assert np.all(out[[0, 1, 2, 3, 4, 6, 7, 8, 9]] == 0)


def test_gather_rows_vjp(rng):
    table = jnp.asarray(rng.normal(size=(50, 4)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, 50, 400), jnp.int32)
    w = jnp.asarray(rng.normal(size=(400, 4)), jnp.float32)

    def f_custom(t):
        return jnp.sum(gather_rows(t, gid, 50) * w)

    def f_xla(t):
        return jnp.sum(t[gid] * w)

    g1 = jax.grad(f_custom)(table)
    g2 = jax.grad(f_xla)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
