"""Round-4c probes: test the TABLE-SIZE hypothesis for row gathers and the
slim-sort alternatives for binning/fold.

Hypothesis from r4b: `cz.at[cc].get` (N=512k sorted queries from a [D+1,10]
f32 table, 168 MB) measured 25 ms while `jnp.take` (512k random queries from
an [N,15] table, 31 MB) measured 1.9 ms — suggesting random row-gather cost
is dominated by TABLE footprint (VMEM-stageable vs HBM random rows), not
query count. If true:
  * binning can sort (key, gid) 2-op and re-gather all 10 payload columns
    from the SMALL [N,16] packet table at D queries (replacing the 12-op
    sort, 35.7 ms), and
  * the expansion only needs 5 int columns (repeat 32.3 -> ~12 ms).

Same anti-lying rules as perf_r4.py (args not closures, sum outputs, slope
timing, min over reps).
"""
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

    which = set(sys.argv[1:] or ["gather", "sort", "misc"])

    # --------- gather cost vs table size (all at D queries) ---------------
    if "gather" in which:
        idxN = jnp.asarray(rng.integers(0, N, D).astype(np.int32))
        idxD = jnp.asarray(rng.integers(0, D, D).astype(np.int32))
        tabN = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
        tabD = jnp.asarray(rng.standard_normal((D, 16)), jnp.float32)
        # sorted queries at N rows from the big table (the fold's tail)
        ccs = jnp.asarray(np.sort(rng.integers(0, D, N)).astype(np.int32))

        def p_gNtab(s, t, i):
            g = jnp.take(t + s * 1e-30, i, axis=0)         # [D, 16]
            return s + 1 + jnp.sum(g) * 1e-30

        def p_gDtab(s, t, i):
            g = jnp.take(t + s * 1e-30, i, axis=0)
            return s + 1 + jnp.sum(g) * 1e-30

        def p_gDtab_sortedN(s, t, i):
            g = (t + s * 1e-30).at[i].get(indices_are_sorted=True,
                                          mode='clip')      # [N, 16]
            return s + 1 + jnp.sum(g) * 1e-30

        slope(p_gNtab, (tabN, idxN), "gather: [N,16] tab, D rand queries")
        slope(p_gDtab, (tabD, idxD), "gather: [D,16] tab, D rand queries")
        slope(p_gDtab_sortedN, (tabD, ccs),
              "gather: [D,16] tab, N SORTED queries")

    # ----------------- slim sorts ----------------------------------------
    if "sort" in which:
        key_np = rng.integers(0, 8160, D).astype(np.int32)
        tkey = jnp.asarray(key_np)
        gid = jnp.asarray(rng.integers(0, N, D).astype(np.int32))
        one = jnp.asarray(rng.standard_normal(D), jnp.float32)
        colstack = jnp.stack(
            [jnp.asarray(rng.standard_normal(D), jnp.float32)
             for _ in range(F)], axis=0)

        def p_sort2(s, k, g):
            ops = jax.lax.sort((k + (s * 1e-30).astype(jnp.int32), g),
                               dimension=0, is_stable=True, num_keys=1)
            return s + 1 + (jnp.sum(ops[1]).astype(jnp.float32)) * 1e-30

        def p_sort3(s, k, g, v):
            ops = jax.lax.sort((k + (s * 1e-30).astype(jnp.int32), g, v),
                               dimension=0, is_stable=True, num_keys=1)
            return (s + 1 + (jnp.sum(ops[1]).astype(jnp.float32)
                             + jnp.sum(ops[2])) * 1e-30)

        def p_sort11u(s, g, cs):
            ops = jax.lax.sort((g + (s * 1e-30).astype(jnp.int32),)
                               + tuple(cs[i] for i in range(F)),
                               dimension=0, is_stable=False, num_keys=1)
            return s + 1 + sum(jnp.sum(o) for o in ops[1:]) * 1e-30

        # full slim-binning chain: 2-op sort + packed gather from [N,16]
        tabN = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)

        def p_slimbin(s, k, g, t):
            ops = jax.lax.sort((k + (s * 1e-30).astype(jnp.int32), g),
                               dimension=0, is_stable=True, num_keys=1)
            feats = jnp.take(t, ops[1], axis=0)            # [D, 16]
            return s + 1 + jnp.sum(feats) * 1e-30

        def p_slimbin_T(s, k, g, t):
            ops = jax.lax.sort((k + (s * 1e-30).astype(jnp.int32), g),
                               dimension=0, is_stable=True, num_keys=1)
            feats = jnp.take(t, ops[1], axis=0).T          # [16, D]
            return s + 1 + jnp.sum(feats) * 1e-30

        slope(p_sort2, (tkey, gid), "sort: 2-op stable at D")
        slope(p_sort3, (tkey, gid, one), "sort: 3-op stable at D")
        slope(p_sort11u, (gid, colstack), "sort: 11-op UNstable at D")
        slope(p_slimbin, (tkey, gid, tabN), "slimbin: sort2 + take[N,16]")
        slope(p_slimbin_T, (tkey, gid, tabN),
              "slimbin: sort2 + take[N,16] + T")

    # ----------------- misc: slim repeat, transpose ----------------------
    if "misc" in which:
        counts_np = rng.poisson(D / N * 0.72, N).astype(np.int32)
        cnt_small = jnp.asarray(np.minimum(counts_np, 32).astype(np.int32))
        xs5 = jnp.asarray(rng.standard_normal((N, 5)), jnp.float32)
        big = jnp.asarray(rng.standard_normal((D, 16)), jnp.float32)

        def p_repeat5(s, tab, cnt):
            rowsr = jnp.repeat(tab + s * 1e-30, cnt, axis=0,
                               total_repeat_length=D)      # [D, 5]
            return s + 1 + jnp.sum(rowsr) * 1e-30

        def p_transpose(s, x):
            y = (x + s * 1e-30).T                          # [16, D]
            return s + 1 + jnp.sum(y) * 1e-30

        slope(p_repeat5, (xs5, cnt_small), "bin: jnp.repeat [N,5]->[D,5]")
        slope(p_transpose, (big,), "misc: [D,16] -> [16,D] transpose")


if __name__ == "__main__":
    main()
