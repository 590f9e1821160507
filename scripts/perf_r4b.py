"""Round-4 micro-decomposition: inside binning fwd (73 ms), fold bwd
(69 ms), and the kernel stages (fwd+untile 37 ms, bwd 64 ms) at the bench
shape (N=2^19 params, D=2^22 entries, mpt=1024).

Same anti-lying rules as perf_r4.py. Pieces are probed as standalone jits
over REAL pre-staged arrays (jit args, not closures) with sum outputs, so
each number is an upper bound on the piece's cost inside the fused step
(fusion can only remove boundaries).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 1 << 19
D = 1 << 22
F = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    rng = np.random.default_rng(0)
    # realistic gid stream: ~8 entries per gaussian, runs contiguous after
    # a gid sort; tile-sorted order approximated by shuffling
    counts_np = rng.poisson(D / N * 0.72, N).astype(np.int32)
    total = int(counts_np.sum())
    gid_np = np.repeat(np.arange(N, dtype=np.int32), counts_np)
    pad = D - total
    gid_np = np.concatenate([gid_np, np.full(pad, N, np.int32)])
    shuf = rng.permutation(D)
    gid_shuf = jnp.asarray(gid_np[shuf])
    counts = jnp.asarray(counts_np)
    cols = tuple(jnp.asarray(rng.standard_normal(D), jnp.float32)
                 for _ in range(F))
    colstack = jnp.stack(cols, axis=0)                     # [F, D]

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

    which = set(sys.argv[1:] or ["fold", "binfwd", "kern"])

    # ------------- fold backward pieces (segment_sum_runend) --------------
    if "fold" in which:
        def p_sort11(s, g, cs):
            ops = jax.lax.sort((g + (s * 1e-30).astype(jnp.int32),)
                               + tuple(cs[i] for i in range(F)),
                               dimension=0, is_stable=False, num_keys=1)
            return s + 1 + sum(jnp.sum(o) for o in ops[1:]) * 1e-30

        def p_sort_stack(s, g, cs):
            ops = jax.lax.sort((g + (s * 1e-30).astype(jnp.int32),)
                               + tuple(cs[i] for i in range(F)),
                               dimension=0, is_stable=False, num_keys=1)
            data = jnp.stack(ops[1:], axis=1)              # [D, F]
            return s + 1 + jnp.sum(data) * 1e-30

        def p_sort_stack_cum(s, g, cs):
            ops = jax.lax.sort((g + (s * 1e-30).astype(jnp.int32),)
                               + tuple(cs[i] for i in range(F)),
                               dimension=0, is_stable=False, num_keys=1)
            data = jnp.stack(ops[1:], axis=1)
            cum = jnp.cumsum(data, axis=0)
            return s + 1 + jnp.sum(cum[-1]) * 1e-30

        def p_runend_full(s, g, cs, cnt):
            from gs_tpu.ops.segment import segment_sum_runend
            out = segment_sum_runend(
                tuple(cs[i] + s * 1e-30 for i in range(F)), g, cnt, N)
            return s + 1 + jnp.sum(out) * 1e-30

        # no-sort variant: runs already contiguous (what an inverse-perm
        # reorder would give) — cumsum + run-end gathers only
        gid_runs = jnp.asarray(gid_np)

        def p_runend_nosort(s, g, cs, cnt):
            cum = jnp.cumsum(jnp.stack(
                [c + s * 1e-30 for c in cs], axis=1), axis=0)
            cz = jnp.concatenate([jnp.zeros((1, F)), cum])
            cc = jnp.cumsum(cnt)
            p0 = jnp.concatenate([jnp.zeros((1,), cc.dtype), cc[:-1]])
            hi = cz.at[cc].get(indices_are_sorted=True, mode='clip')
            lo = cz.at[p0].get(indices_are_sorted=True, mode='clip')
            return s + 1 + jnp.sum(hi - lo) * 1e-30

        # packed row-gather reorder at D (the inverse-perm alternative)
        inv = jnp.asarray(rng.permutation(D).astype(np.int32))

        def p_gather_reorder(s, mat, idx):
            out = jnp.take(mat + s * 1e-30, idx, axis=1)   # [F, D] cols
            return s + 1 + jnp.sum(out) * 1e-30

        slope(p_sort11, (gid_shuf, colstack), "fold: 11-op sort")
        slope(p_sort_stack, (gid_shuf, colstack), "fold: sort+stack[D,F]")
        slope(p_sort_stack_cum, (gid_shuf, colstack), "fold: sort+stack+cum")
        slope(p_runend_full, (gid_shuf, colstack, counts),
              "fold: segment_sum_runend FULL")
        slope(p_runend_nosort, (gid_runs, colstack, counts),
              "fold: no-sort cumsum+ends")
        slope(p_gather_reorder, (colstack, inv),
              "fold: [F,D] col-gather reorder")

    # ------------------- binning forward pieces ---------------------------
    if "binfwd" in which:
        xs = jnp.asarray(rng.standard_normal((N, 15)), jnp.float32)
        cnt_small = jnp.asarray(
            np.minimum(counts_np, 32).astype(np.int32))

        def p_repeat(s, tab, cnt):
            rowsr = jnp.repeat(tab + s * 1e-30, cnt, axis=0,
                               total_repeat_length=D)
            return s + 1 + jnp.sum(rowsr) * 1e-30

        key_np = rng.integers(0, 8160, D).astype(np.int32)
        tkey = jnp.asarray(key_np)

        def p_sort12(s, k, cs):
            ops = jax.lax.sort((k + (s * 1e-30).astype(jnp.int32),
                                k) + tuple(cs[i] for i in range(F)),
                               dimension=0, is_stable=True, num_keys=1)
            return s + 1 + sum(jnp.sum(o) for o in ops[2:]) * 1e-30

        def p_argsortN(s, d):
            o = jnp.argsort(d + s * 1e-30)
            return s + 1 + jnp.sum(o).astype(jnp.float32) * 1e-30

        depth = jnp.asarray(rng.standard_normal(N), jnp.float32)

        def p_takeN(s, tab, o):
            g = jnp.take(tab + s * 1e-30, o, axis=0)
            return s + 1 + jnp.sum(g) * 1e-30

        order = jnp.asarray(rng.permutation(N).astype(np.int32))
        slope(p_repeat, (xs, cnt_small), "bin: jnp.repeat [N,15]->[D,15]")
        slope(p_sort12, (tkey, colstack), "bin: 12-op stable tile sort")
        slope(p_argsortN, (depth,), "bin: argsort N")
        slope(p_takeN, (xs, order), "bin: packed take N x15")

    # --------------------- kernel fwd/bwd isolation -----------------------
    if "kern" in which:
        from gs_tpu.ops.rasterize_pallas import (NFEAT, _Statics,
                                                 _raster_tiles)
        W, H, TX, TY = 1920, 1080, 16, 16
        gx, gy = W // TX, -(-H // TY)
        T = gx * gy
        mpt = 1024
        max_chunks = -(-(max(mpt // 128, 1) + 1) // 8) * 8
        feats = jnp.asarray(rng.standard_normal((NFEAT, D)) * 0.01,
                            jnp.float32)
        # plausible tile ranges: ~500 entries per tile
        starts = (jnp.arange(T, dtype=jnp.int32) * (D // T))
        ends = starts + 500
        rowp = jnp.zeros((1,), jnp.int32)
        statics = _Statics(num_tiles=T, gx=gx, tile_x=TX, tile_y=TY,
                           max_chunks=max_chunks, interpret=False,
                           tiles_per_program=4, row_stride=1)

        def p_kfwd(s, f, st, en):
            out = _raster_tiles(f + s * 1e-30, st, en, rowp, statics)
            return s + 1 + jnp.sum(out) * 1e-30

        def p_kfb(s, f, st, en):
            def l(ff):
                out = _raster_tiles(ff, st, en, rowp, statics)
                return jnp.sum(out * out)
            v, g = jax.value_and_grad(l)(f + s * 1e-30)
            return s + 1 + (v + jnp.sum(g)) * 1e-30

        def p_untile(s, x):
            c = x.shape[1]
            y = (x + s * 1e-30).reshape(gy, gx, c, TY, TX)
            y = y.transpose(2, 0, 3, 1, 4).reshape(c, gy * TY, gx * TX)
            return s + 1 + jnp.sum(y[:, :H, :W]) * 1e-30

        tiles_out = jnp.asarray(rng.standard_normal((T, 8, 256)),
                                jnp.float32)
        slope(p_kfwd, (feats, starts, ends), "kern: pallas fwd only")
        slope(p_kfb, (feats, starts, ends), "kern: pallas fwd+bwd")
        slope(p_untile, (tiles_out,), "kern: untile [T,8,256]")


if __name__ == "__main__":
    main()
