"""Round-4f: attribute the train-step-minus-render gap (255 - 138 ms at the
bench shape).

Pieces probed standalone (args-not-closures, sum outputs, slope timing):
  1. packed render + L1 + SSIM loss grad (no update) — the step's loss_fn
  2. the same WITHOUT ssim (isolates ssim-in-context)
  3. adam_update_packed + add_densification_stats on a real state
  4. the full production step (reference number)
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 500000


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as B
    from gs_tpu.config import OptimizationConfig, RasterConfig
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.core.packed import layout as packed_layout, mask_sh_rows
    from gs_tpu.core.project import preprocess_packed
    from gs_tpu.models.gaussian_model import (init_state,
                                              add_densification_stats)
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
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    ps = pack_state(init_state(params, alive, num_images=1))
    lay = packed_layout(3)
    opt = OptimizationConfig()
    raster = RasterConfig(dup_capacity=dup_capacity,
                          max_per_tile=max_per_tile)

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

    def packed_loss(block, tap, use_ssim):
        masked = mask_sh_rows(block, lay, 3)
        proj = preprocess_packed(masked, cam, sh_degree=3,
                                 active_sh_degree=3, alive=alive)
        proj = proj._replace(mean2d=proj.mean2d + tap)
        out = render_projected(
            proj, WIDTH, HEIGHT, bg, backend="pallas",
            dup_capacity=dup_capacity, max_per_tile=max_per_tile,
            exact_cull=True, pallas_expand=True, pallas_fold=True)
        ll1 = l1_loss(out.image, gt)
        if use_ssim:
            sv = ssim(out.image, gt)
            return 0.8 * ll1 + 0.2 * (1.0 - sv)
        return ll1

    blk = ps.packed

    # value_and_grad over (block, tap)
    def make_lossgrad(use_ssim):
        def f(s, b):
            tap = jnp.zeros((b.shape[1], 2), jnp.float32)
            def l(bb, tp):
                return packed_loss(bb, tp, use_ssim)
            v, (gb, gtap) = jax.value_and_grad(l, argnums=(0, 1))(
                b + s * 1e-30, tap)
            return s + 1 + (v + jnp.sum(gb) + jnp.sum(gtap)) * 1e-30
        return f

    gfix = jnp.asarray(np.random.default_rng(1).standard_normal(
        ps.packed.shape) * 1e-6, jnp.float32)
    tapfix = jnp.asarray(np.random.default_rng(2).standard_normal(
        (ps.packed.shape[1], 2)) * 1e-6, jnp.float32)
    visfix = jnp.ones((ps.packed.shape[1],), bool)
    radfix = jnp.ones((ps.packed.shape[1],), jnp.int32)

    def p_update(s, st, g, tp):
        lr = group_lr_rows(lay, opt, 100, 1.0)
        st2 = adam_update_packed(st, g + s * 1e-30, lr, visfix)
        st2 = add_densification_stats(st2, tp, visfix, WIDTH, HEIGHT, radfix)
        return s + 1 + (jnp.sum(st2.packed[0]) + jnp.sum(st2.m[0])
                        + jnp.sum(st2.grad_accum)) * 1e-30

    slope(make_lossgrad(True), (blk,), "packed loss grad (l1+ssim)")
    slope(make_lossgrad(False), (blk,), "packed loss grad (l1 only)")
    try:
        slope(p_update, (ps, gfix, tapfix), "adam_packed + densify stats")
    except Exception as e:
        print("  [adam_packed + densify stats] FAILED:", repr(e), flush=True)


if __name__ == "__main__":
    main()
