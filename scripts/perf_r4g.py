"""Round-4g: bisect the 255-vs-146 ms train-step discrepancy.

perf_r4f reconstructed the step (loss grad 145.6 + update 0.6) ~100 ms below
the bench's scan-block number. Candidates, each probed:
  1. the REAL single step (make_train_step, one jit, no scan)
  2. the real 4-step scan block (the bench's measurement), /4
  3. the scan without the per-step valid-mask state select
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    import bench as B
    from gs_tpu.config import (ModelConfig, OptimizationConfig,
                               PipelineConfig, RasterConfig)
    from gs_tpu.core.camera import make_camera, focal2fov, stack_cameras
    from gs_tpu.models.gaussian_model import init_state
    from gs_tpu.models.packed_state import pack_state
    from gs_tpu.train.step import make_train_step, make_train_steps_scan

    params, alive = B.build_scene("uniform")
    dup_capacity, max_per_tile = B.CAPS["uniform"]
    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    cams = stack_cameras([cam])
    images = jnp.zeros((1, 3, HEIGHT, WIDTH), jnp.float32)
    raster = RasterConfig(backend="pallas", dup_capacity=dup_capacity,
                          max_per_tile=max_per_tile, chunk=64)
    step = make_train_step(OptimizationConfig(iterations=30_000),
                           ModelConfig(), PipelineConfig(), raster, cams,
                           spatial_lr_scale=1.0, max_sh_degree=3, packed=True)
    core = step.__wrapped__
    state0 = pack_state(init_state(params, alive, num_images=1))
    key = jax.random.key(0)

    def slope_state(f, label, k1=1, k2=3, reps=3, div=1):
        t0 = time.perf_counter()
        s, m = f(state0, 0)
        jax.block_until_ready(s.packed)
        print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(k):
            s = state0
            for i in range(k):
                s, m = f(s, i)
            return float(m)

        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
            d = (t2 - t1) / (k2 - k1) / div
            best = d if best is None else min(best, d)
        print(f"  [{label}] {best*1e3:.1f} ms", flush=True)
        return best

    jstep = jax.jit(lambda s, it, k: core(s, jnp.int32(0),
                                          images[0], None, None, None,
                                          jnp.float32(0.0), it, k))

    def f_single(s, i):
        s2, m = jstep(s, jnp.int32(100 + i), key)
        return s2, m.loss

    scan = make_train_steps_scan(step, use_alpha=False, use_depth=False)
    K = 4
    idxs = jnp.zeros((K,), jnp.int32)
    keys = jax.random.split(jax.random.key(0), K)
    valid = jnp.ones((K,), bool)

    def f_block(s, i):
        s2, m = scan(s, images, None, None, None, None,
                     jnp.float32(100 + i * K), idxs, keys, valid)
        return s2, m.loss

    # scan WITHOUT the valid select: rebuild inline
    @jax.jit
    def scan_nosel(state, start_iteration, ks):
        def body(s, inp):
            off, k = inp
            s2, m = core(s, jnp.int32(0), images[0], None, None, None,
                         jnp.float32(0.0), start_iteration + off, k)
            return s2, m
        offs = jnp.arange(1, K + 1, dtype=jnp.int32)
        st, ms = jax.lax.scan(body, state, (offs, ks))
        return st, jax.tree.map(lambda x: x[-1], ms)

    def f_block_nosel(s, i):
        s2, m = scan_nosel(s, jnp.float32(100 + i * K), keys)
        return s2, m.loss

    slope_state(f_single, "real step, single jit")
    slope_state(f_block, "real 4-step scan block (bench path)", div=K)
    slope_state(f_block_nosel, "4-step scan, no valid-select", div=K)


if __name__ == "__main__":
    main()
