"""Round-4d: on-chip validation + slope timing of the fold kernel, plus
raster-kernel bwd variants.

1. fold_rows vs segment_sum_runend at the bench shape (values on HARDWARE —
   interpret mode missed the Mosaic iota typing in r3), then slope-time
   both formulations.
2. end-to-end render fwd+bwd at the bench shape with pallas_fold on/off.

Same anti-lying rules as perf_r4.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 1 << 19
D = 3328000          # the bench tier
F = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    from gs_tpu.ops.fold_pallas import ROWS, fold_rows
    from gs_tpu.ops.segment import segment_sum_runend

    rng = np.random.default_rng(0)
    counts_np = rng.poisson(D / N * 0.72, N).astype(np.int32)
    total = int(counts_np.sum())
    assert total <= D
    gid_np = np.concatenate([
        np.repeat(np.arange(N, dtype=np.int32), counts_np),
        np.full(D - total, N, np.int32)])
    perm = rng.permutation(D)
    gid = jnp.asarray(gid_np[perm])
    counts = jnp.asarray(counts_np)
    cols_np = rng.standard_normal((F, D)).astype(np.float32) * 0.01
    cols_np[:, total:] = 0.0
    cols_np = cols_np[:, perm]
    colstack = jnp.asarray(cols_np)                       # [F, D]

    def slope(f, args, label, k1=1, k2=3, reps=3):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        float(jf(jnp.float32(0), *args))
        print(f"  [{label}] compile: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(k):
            x = jnp.float32(0)
            for _ in range(k):
                x = jf(x, *args)
            return float(x)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
            d = (t2 - t1) / (k2 - k1)
            best = d if best is None else min(best, d)
        print(f"  [{label}] {best*1e3:.1f} ms", flush=True)
        return best

    # ---- value parity on hardware ----
    def via_runend(g, cs, cnt):
        return segment_sum_runend(tuple(cs[i] for i in range(F)), g, cnt, N)

    def via_kernel(g, cs, cnt):
        ops = jax.lax.sort((g,) + tuple(cs[i] for i in range(F)),
                           dimension=0, is_stable=False, num_keys=1)
        data = jnp.concatenate([jnp.stack(ops[1:], axis=0),
                                jnp.zeros((ROWS - F, D), jnp.float32)],
                               axis=0)
        offs = jnp.cumsum(cnt) - cnt
        return fold_rows(data, offs, cnt, N)[:F].T

    a = jax.jit(via_runend)(gid, colstack, counts)
    b = jax.jit(via_kernel)(gid, colstack, counts)
    err = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(a)))
    print(f"fold parity on-chip: maxabs={err:.3e} scale={scale:.3e}",
          flush=True)

    # ---- slope timing ----
    def p_runend(s, g, cs, cnt):
        out = via_runend(g + (s * 1e-30).astype(jnp.int32), cs, cnt)
        return s + 1 + jnp.sum(out) * 1e-30

    def p_kernel(s, g, cs, cnt):
        out = via_kernel(g + (s * 1e-30).astype(jnp.int32), cs, cnt)
        return s + 1 + jnp.sum(out) * 1e-30

    def p_kernel_only(s, data, offs, cnt):
        out = fold_rows(data + s * 1e-30, offs, cnt, N)
        return s + 1 + jnp.sum(out) * 1e-30

    ops = jax.lax.sort((gid,) + tuple(colstack[i] for i in range(F)),
                       dimension=0, is_stable=False, num_keys=1)
    data_sorted = jnp.concatenate(
        [jnp.stack(ops[1:], axis=0), jnp.zeros((ROWS - F, D), jnp.float32)],
        axis=0)
    offs = jnp.cumsum(counts) - counts
    slope(p_runend, (gid, colstack, counts), "fold: segment_sum_runend FULL")
    slope(p_kernel, (gid, colstack, counts), "fold: sort + pallas kernel")
    slope(p_kernel_only, (data_sorted, offs, counts),
          "fold: pallas kernel ONLY (pre-sorted)")


if __name__ == "__main__":
    main()
