"""TPU probe: pytree-grad step vs packed-grad step vs full packed train step.

Round-2 attributed ~70 ms of the 228 ms bench step to parameter-gradient
materialization + Adam layout writes on the reference-shaped pytree leaves
([C,15,3] sh_rest etc. put 1-3-wide axes into the 128-lane dim). The packed
[R, C] channel-major layout (core/packed.py) should delete that tail.

Slope-timing protocol per CLAUDE.md (block_until_ready lies on axon).
Run WITHOUT the cpu override, on the real chip:  python scripts/probe_packed_tpu.py
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 500_000
DUP_CAP = 1 << 22
MPT = 1024


def main():
    import jax
    import jax.numpy as jnp
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.core.packed import layout, mask_sh_rows
    from gs_tpu.core.project import preprocess_packed
    from gs_tpu.models.gaussian_model import create_from_pcd, init_state
    from gs_tpu.models.packed_state import (adam_update_packed, group_lr_rows,
                                            pack_state)
    from gs_tpu.render import render, render_projected
    from gs_tpu.config import OptimizationConfig

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-3.5, 3.5, (N_GAUSS, 1)),
        rng.uniform(-2.0, 2.0, (N_GAUSS, 1)),
        rng.uniform(2.5, 9.0, (N_GAUSS, 1)),
    ], axis=1)
    cols = rng.uniform(0, 1, (N_GAUSS, 3))
    params, alive = create_from_pcd(pts, cols, sh_degree=3, capacity=1 << 19)
    params = params._replace(log_scale=params.log_scale + math.log(0.3))

    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    kwargs = dict(backend="pallas", dup_capacity=DUP_CAP,
                  max_per_tile=MPT, chunk=64)

    def slope(f, x0, fetch, label, k1=2, k2=6):
        t0 = time.perf_counter()
        fetch(f(x0))
        print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(k):
            x = x0
            for _ in range(k):
                x = f(x)
            return fetch(x)
        best = None
        for _ in range(3):
            t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
            d = (t2 - t1) / (k2 - k1)
            best = d if best is None else min(best, d)
        print(f"  [{label}] {best*1e3:.1f} ms/step", flush=True)
        return best

    # ---- A: bench-style pytree step (round-2 headline ~228 ms) -----------
    def loss_tree(p):
        out = render(cam, p, bg, active_sh_degree=3, alive=alive, **kwargs)
        return jnp.mean(jnp.abs(out.image - gt))

    @jax.jit
    def step_tree(p):
        g = jax.grad(loss_tree)(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

    # ---- B: packed-grad step (same trivial update) ------------------------
    lay = layout(3)
    packed0 = None

    def loss_packed(pk):
        proj = preprocess_packed(pk, cam, sh_degree=3, active_sh_degree=3,
                                 alive=alive)
        out = render_projected(proj, WIDTH, HEIGHT, bg, **kwargs)
        return jnp.mean(jnp.abs(out.image - gt))

    @jax.jit
    def step_packed(pk):
        g = jax.grad(loss_packed)(pk)
        return pk - 1e-12 * g

    # ---- C: full packed train step with Adam ------------------------------
    opt = OptimizationConfig()

    @jax.jit
    def step_full(ps):
        g = jax.grad(loss_packed)(ps.packed)
        lr = group_lr_rows(lay, opt, ps.step + 1, 1.0)
        return adam_update_packed(ps, g, lr)

    from gs_tpu.core.packed import pack_params
    packed0 = pack_params(params)
    state0 = pack_state(init_state(params, alive, num_images=1))

    which = sys.argv[1:] or ["tree", "packed", "full"]
    res = {}
    if "tree" in which:
        res["tree"] = slope(step_tree, params, lambda p: float(p.xyz[0, 0]),
                            "A pytree grad+sgd")
    if "packed" in which:
        res["packed"] = slope(step_packed, packed0,
                              lambda p: float(p[0, 0]), "B packed grad+sgd")
    if "full" in which:
        res["full"] = slope(step_full, state0,
                            lambda s: float(s.packed[0, 0]),
                            "C packed grad+Adam")
    print({k: round(v * 1e3, 1) for k, v in res.items()})


if __name__ == "__main__":
    main()
