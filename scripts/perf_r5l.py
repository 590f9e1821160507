"""Round-5l: the param-cotangent tail — tree layout vs the packed layout.

perf_r5k: render fwd+bwd with xyz-only grads = 94.9 ms, but the bench
headline (full param-TREE grads + tiny update, L1) = ~164 ms at ANY scan
length — the ~70 ms delta is the parameter-cotangent materialization +
update in the [C,K,3] tree layout (r2's finding). Production has trained
on the channel-major packed [R, C] block since r3 and should not pay it.

Probes (all single-dispatch, chained, endpoint-min):
  tree   — the exact bench-headline composition (L1, full tree grads,
           1e-12 update)
  packed — same composition over the packed [R, C] block through
           preprocess_packed + render_projected (the production layout)
  xyz    — xyz-only grads (the r5k lower bound, for reference)
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    import bench
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.core.packed import layout as packed_layout, mask_sh_rows
    from gs_tpu.core.project import preprocess_packed
    from gs_tpu.models.gaussian_model import init_state
    from gs_tpu.models.packed_state import pack_state
    from gs_tpu.render import render, render_projected

    W, H = 1920, 1080
    params, alive = bench.build_scene("uniform")
    state = pack_state(init_state(params, alive, num_images=1))
    blk = state.packed
    lay = packed_layout(3)
    fovx = math.radians(70.0)
    fovy = focal2fov(W / (2 * math.tan(fovx / 2)), H)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, W, H)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, H, W), jnp.float32)
    dup_capacity, max_per_tile = bench.CAPS["uniform"]
    rk = dict(backend="pallas", dup_capacity=dup_capacity,
              max_per_tile=max_per_tile, chunk=64,
              exact_cull=True, pallas_expand=True, pallas_fold=True)

    def slope(f, x0, label, k1=1, k2=6, reps=3):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        print(f"  [{label}] compile: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(k):
            x = x0
            for _ in range(k):
                x = jf(x)
            return float(jax.tree.leaves(x)[0].ravel()[0])
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); run(k1); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(k2); t2s.append(time.perf_counter() - t0)
        d = (min(t2s) - min(t1s)) / (k2 - k1)
        spread = sorted(round((b - a) / (k2 - k1), 4)
                        for a, b in zip(t1s, t2s))
        print(f"  [{label}] {d*1e3:.1f} ms  spread={spread}", flush=True)
        return d

    def tree_step(p):
        def loss(pp):
            out = render(cam, pp, bg, active_sh_degree=3, alive=alive, **rk)
            return jnp.mean(jnp.abs(out.image - gt))
        g = jax.grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

    def packed_step(b):
        def loss(bb):
            masked = mask_sh_rows(bb, lay, 3)
            proj = preprocess_packed(masked, cam, sh_degree=3,
                                     active_sh_degree=3, alive=alive)
            out = render_projected(proj, W, H, bg, **rk)
            return jnp.mean(jnp.abs(out.image - gt))
        g = jax.grad(loss)(b)
        return b - 1e-12 * g

    def xyz_step(x):
        def loss(xx):
            out = render(cam, params._replace(xyz=xx), bg,
                         active_sh_degree=3, alive=alive, **rk)
            return jnp.mean(jnp.abs(out.image - gt))
        g = jax.grad(loss)(x)
        return x - 1e-12 * g

    slope(xyz_step, params.xyz, "xyz-only grads")
    slope(packed_step, blk, "PACKED layout full grads+update")
    slope(tree_step, params, "tree layout full grads+update (headline)")


if __name__ == "__main__":
    main()
