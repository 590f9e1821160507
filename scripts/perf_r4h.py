"""Round-4h: honest train-step decomposition — EVERY input a jit arg.

Every r4 probe that closed over camera/gt/iteration measured 30-60 ms
optimistic (HLO-constant folding). Here a replica of the production step
core is rebuilt with pieces removable, and camera rows, gt, iteration and
the packed block are ALL traced arguments. Variants:

  v_full   — replica of the full step (render+L1+SSIM grad, adam, stats)
  v_nossim — without SSIM
  v_noexp  — without the exposure-row grad output (argnums (0,1) not (0,1,2))
  v_noupd  — loss grad only (no adam/stats)
  scan4    — v_full inside a 4-step lax.scan (the production dispatch)
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
    from gs_tpu.config import OptimizationConfig
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.core.packed import layout as packed_layout, mask_sh_rows
    from gs_tpu.core.project import preprocess_packed
    from gs_tpu.models.gaussian_model import (add_densification_stats,
                                              init_state)
    from gs_tpu.models.packed_state import (adam_update_packed,
                                            group_lr_rows, pack_state)
    from gs_tpu.ops.losses import l1_loss
    from gs_tpu.ops.ssim import ssim
    from gs_tpu.render import render_projected

    params, alive = B.build_scene("uniform")
    dup_capacity, max_per_tile = B.CAPS["uniform"]
    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    ps = pack_state(init_state(params, alive, num_images=1))
    lay = packed_layout(3)
    opt = OptimizationConfig()
    rng = np.random.default_rng(1)
    gt0 = jnp.asarray(rng.uniform(0, 1, (3, HEIGHT, WIDTH)), jnp.float32)
    bg = jnp.zeros(3)

    def slope_state(make_f, label, k1=1, k2=3, reps=3, div=1):
        f = make_f()
        t0 = time.perf_counter()
        s, out = f(ps, gt0, jnp.float32(100.0))
        jax.block_until_ready(s.packed)
        print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(k):
            s, g = ps, gt0
            for i in range(k):
                s, out = f(s, g, jnp.float32(100 + i))
                g = g + out * 1e-30          # chain gt on the output
            return float(out)

        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); run(k1); t1s.append(time.perf_counter()-t0)
            t0 = time.perf_counter(); run(k2); t2s.append(time.perf_counter()-t0)
        d = (min(t2s) - min(t1s)) / (k2 - k1) / div
        print(f"  [{label}] {d*1e3:.1f} ms", flush=True)
        return d

    def make_step(use_ssim=True, exp_grad=True, update=True):
        def loss_fn(block, tap, exp_row, gt, it):
            masked = mask_sh_rows(block, lay, 3)
            proj = preprocess_packed(masked, cam, sh_degree=3,
                                     active_sh_degree=3, alive=ps.alive)
            proj = proj._replace(mean2d=proj.mean2d + tap)
            out = render_projected(
                proj, WIDTH, HEIGHT, bg, backend="pallas",
                dup_capacity=dup_capacity, max_per_tile=max_per_tile,
                exact_cull=True, pallas_expand=True, pallas_fold=True)
            ll1 = l1_loss(out.image, gt)
            loss = 0.8 * ll1 + (0.2 * (1.0 - ssim(out.image, gt))
                                if use_ssim else 0.0)
            return loss, (out.visibility, out.radii)

        argn = (0, 1, 2) if exp_grad else (0, 1)
        gfn = jax.grad(loss_fn, argnums=argn, has_aux=True)

        @jax.jit
        def step(s, gt, it):
            tap = jnp.zeros((s.capacity, 2), jnp.float32)
            exp_row = s.exposure[0]
            grads, (vis, radii) = gfn(s.packed, tap, exp_row, gt, it)
            pg, tapg = grads[0], grads[1]
            if update:
                gate = vis & (it < 15000.0)
                s = add_densification_stats(s, tapg, gate, WIDTH, HEIGHT,
                                            radii)
                lr = group_lr_rows(lay, opt, it, 1.0)
                s = adam_update_packed(s, pg, lr)
            return s, jnp.sum(pg) * 1e-20 + jnp.sum(tapg) * 1e-20

        return step

    def make_scan4():
        inner = make_step()

        @jax.jit
        def blk(s, gt, it):
            def body(ss, i):
                ss, o = inner.__wrapped__(ss, gt, it + i)
                return ss, o
            s, os_ = jax.lax.scan(body, s,
                                  jnp.arange(4, dtype=jnp.float32))
            return s, os_[-1]
        return lambda: blk

    slope_state(lambda: make_step(), "v_full: replica step, traced")
    slope_state(lambda: make_step(use_ssim=False), "v_nossim")
    slope_state(lambda: make_step(exp_grad=False), "v_noexp")
    slope_state(lambda: make_step(update=False), "v_noupd (loss grad only)")
    slope_state(make_scan4(), "scan4 (per step)", div=4)


if __name__ == "__main__":
    main()
