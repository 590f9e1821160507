"""Round-5j: does lax.sort cost scale per OPERAND or per BYTE?

The r4 calibration says "sorts cost ~3 ms/OPERAND at D=4M ... payload
width, not keys, is the lever" — if the cost is per-operand (variadic
descriptor overhead in the sort loop) rather than per-byte, packing f32
payload column PAIRS into complex64 halves the operand count at equal
bytes: the 12-op binning sort becomes 7 ops and the 11-op fold sort 6.
jax.lax.complex/real/imag are pure packing (values, not bitcasts — no
denormal hazard), and sort only permutes values.

ROUND-5 CORRECTION: the first version of this probe summed only ONE
sorted output, letting XLA DCE the other operands out of the sort — it
measured a 3-op sort (6.3/3.8 ms) and briefly "refuted" the r4
calibration. All outputs are now consumed; the honest numbers agree with
the in-context bisection (perf_r5m: 12-op sort 28.7 ms).

Probes at the bench tier (D=3.072M):
  f32x12  — (key, gid) + 10 f32 payload (the production binning sort)
  c64x7   — (key, gid) + 5 c64 payload columns
  f32x11  — fold-shaped: (gid,) + 10 f32, is_stable=False
  c64x6   — (gid,) + 5 c64
  pack+unpack overhead is INCLUDED (complex built from the f32 inputs
  inside the timed fn, real/imag extracted and summed).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = 3072000


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 8160, D).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, 500000, D).astype(np.int32))
    cols = jnp.asarray(rng.uniform(0, 1, (10, D)).astype(np.float32))

    def slope(f, args, label, k1=1, k2=6, reps=3):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        float(jf(jnp.int32(0), *args))
        print(f"  [{label}] compile: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(k):
            x = jnp.int32(0)
            for _ in range(k):
                x = jf(x, *args)
            return float(x)
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); run(k1); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(k2); t2s.append(time.perf_counter() - t0)
        d = (min(t2s) - min(t1s)) / (k2 - k1)
        spread = sorted(round((b - a) / (k2 - k1), 4)
                        for a, b in zip(t1s, t2s))
        print(f"  [{label}] {d*1e3:.1f} ms  spread={spread}", flush=True)
        return d

    def f32x12(s, key, gid, cols):
        ops = jax.lax.sort((key + s * 0,) + (gid,) + tuple(cols),
                           dimension=0, is_stable=True, num_keys=1)
        tot = (sum(jnp.sum(o) for o in ops[2:])
               + jnp.sum(ops[0] + ops[1]).astype(jnp.float32))
        return s + 1 + (tot * 1e-30).astype(jnp.int32)

    def c64x7(s, key, gid, cols):
        packed = tuple(jax.lax.complex(cols[2 * i], cols[2 * i + 1])
                       for i in range(5))
        ops = jax.lax.sort((key + s * 0, gid) + packed,
                           dimension=0, is_stable=True, num_keys=1)
        tot = sum(jnp.sum(jnp.real(o)) + jnp.sum(jnp.imag(o))
                  for o in ops[2:])
        return s + 1 + (tot * 1e-30).astype(jnp.int32)

    def f32x11(s, gid, cols):
        ops = jax.lax.sort((gid + s * 0,) + tuple(cols),
                           dimension=0, is_stable=False, num_keys=1)
        tot = (sum(jnp.sum(o) for o in ops[1:])
               + jnp.sum(ops[0]).astype(jnp.float32))
        return s + 1 + (tot * 1e-30).astype(jnp.int32)

    def c64x6(s, gid, cols):
        packed = tuple(jax.lax.complex(cols[2 * i], cols[2 * i + 1])
                       for i in range(5))
        ops = jax.lax.sort((gid + s * 0,) + packed,
                           dimension=0, is_stable=False, num_keys=1)
        tot = sum(jnp.sum(jnp.real(o)) + jnp.sum(jnp.imag(o))
                  for o in ops[1:])
        return s + 1 + (tot * 1e-30).astype(jnp.int32)

    # correctness: c64 pack rides the sort losslessly
    ops_f = jax.lax.sort((key, gid) + tuple(cols), dimension=0,
                         is_stable=True, num_keys=1)
    packed = tuple(jax.lax.complex(cols[2 * i], cols[2 * i + 1])
                   for i in range(5))
    ops_c = jax.lax.sort((key, gid) + packed, dimension=0,
                         is_stable=True, num_keys=1)
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(jnp.real(ops_c[2 + i])),
                                      np.asarray(ops_f[2 + 2 * i]))
        np.testing.assert_array_equal(np.asarray(jnp.imag(ops_c[2 + i])),
                                      np.asarray(ops_f[2 + 2 * i + 1]))
    print("c64 pack parity: exact", flush=True)

    slope(f32x12, (key, gid, cols), "binning sort f32x12 (prod)")
    slope(c64x7, (key, gid, cols), "binning sort c64x7")
    slope(f32x11, (gid, cols), "fold sort f32x11 (prod)")
    slope(c64x6, (gid, cols), "fold sort c64x6")


if __name__ == "__main__":
    main()
