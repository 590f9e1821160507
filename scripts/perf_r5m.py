"""Round-5m: cumulative bisection INSIDE binning (44.8 ms in-context).

Isolated parts sum to ~23 ms (prep 2.5, pallas expand ~5, 12-op sort 6.3,
geom take ~4, elementwise ~3, aux sorts ~2) — ~22 ms unattributed. This
replicates ops/binning.bin_gaussians_payload's pallas branch stage by
stage (cumulative, all sums consumed) on the bench scene:

  b0 pre-expansion  — rects/counts/depth argsort/packed geom take/cumsum
  b1 +expansion     — comb16 stack + expand_rows + column extraction
  b2 +entry math    — tile ids, exact-cull chain, tile_key/gid sentinels
  b3 +tile sort     — the 12-operand stable sort
  b4 +ranges        — searchsorted + counts_orig unsort (== full binning)
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
    from gs_tpu.core.project import preprocess, tile_rect
    from gs_tpu.ops.binning import tile_grid
    from gs_tpu.ops.rasterize_jnp import pack_projected

    W, H, TX, TY = 1920, 1080, 16, 16
    params, alive = bench.build_scene("uniform")
    fovx = math.radians(70.0)
    fovy = focal2fov(W / (2 * math.tan(fovx / 2)), H)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, W, H)
    capacity, _ = bench.CAPS["uniform"]
    gx, gy = tile_grid(W, H, TX, TY)
    num_tiles = gx * gy

    def stage(upto):
        def f(s, xyz):
            p = params._replace(xyz=xyz + s * 1e-30)
            proj = preprocess(p, cam, active_sh_degree=3, alive=alive)
            payload = pack_projected(proj)
            rcull = proj.radius_cull
            radius_x = rcull[:, 0].astype(jnp.int32)
            radius_y = rcull[:, 1].astype(jnp.int32)
            visible0 = proj.visible & (radius_x > 0) & (radius_y > 0)
            rx0, ry0, rx1, ry1 = tile_rect(proj.mean2d, radius_x, gx, gy,
                                           TX, TY, radius_y=radius_y)
            counts0 = jnp.where(visible0, (rx1 - rx0) * (ry1 - ry0), 0)
            depth_key = jnp.where(counts0 > 0, proj.depth, jnp.inf)
            order = jnp.argsort(depth_key)
            n = proj.depth.shape[0]
            geom = jnp.concatenate([
                counts0.astype(jnp.float32)[:, None],
                rx0.astype(jnp.float32)[:, None],
                ry0.astype(jnp.float32)[:, None],
                jnp.maximum(rx1 - rx0, 1).astype(jnp.float32)[:, None],
                payload], axis=1)
            geom_s = jnp.take(geom, order, axis=0)
            counts = geom_s[:, 0].astype(jnp.int32)
            total = jnp.sum(counts)
            offsets = jnp.cumsum(counts) - counts
            if upto == 0:
                return s + 1 + (jnp.sum(geom_s) + jnp.sum(offsets)
                                .astype(jnp.float32)) * 1e-30
            from gs_tpu.ops.expand_pallas import ROWS, expand_rows
            f_ = 10
            comb16 = jnp.stack(
                [offsets.astype(jnp.float32), geom_s[:, 0], geom_s[:, 1],
                 geom_s[:, 2], geom_s[:, 3], order.astype(jnp.float32)]
                + [geom_s[:, 4 + i] for i in range(f_)], axis=0)
            out16 = expand_rows(comb16, offsets, capacity)
            off_e = out16[0].astype(jnp.int32)
            rx0_e = out16[2].astype(jnp.int32)
            ry0_e = out16[3].astype(jnp.int32)
            sw_e = jnp.maximum(out16[4].astype(jnp.int32), 1)
            gid_e = out16[5].astype(jnp.int32)
            exp_cols = tuple(out16[6 + i] for i in range(f_))
            if upto == 1:
                return s + 1 + (sum(jnp.sum(c) for c in exp_cols)
                                + jnp.sum(off_e + rx0_e + ry0_e + sw_e
                                          + gid_e).astype(jnp.float32)
                                ) * 1e-30
            eidx = jnp.arange(capacity, dtype=jnp.int32)
            local = eidx - off_e
            t_col = rx0_e + local % sw_e
            t_row = ry0_e + local // sw_e
            tile_id = t_row * gx + t_col
            valid = eidx < total
            ex, ey = exp_cols[0], exp_cols[1]
            ca = exp_cols[2] + 1e-20
            cb = exp_cols[3]
            cc = exp_cols[4] + 1e-20
            two_l = 2.0 * jnp.log(jnp.maximum(255.0 * exp_cols[5], 1.0))
            grow = t_row
            dx0 = (t_col * TX - 1).astype(jnp.float32) - ex
            dx1 = (t_col * TX + TX).astype(jnp.float32) - ex
            dy0 = (grow * TY - 1).astype(jnp.float32) - ey
            dy1 = (grow * TY + TY).astype(jnp.float32) - ey

            def _q(dx, dy):
                return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

            cx0 = jnp.clip(-cb * dy0 / ca, dx0, dx1)
            cx1 = jnp.clip(-cb * dy1 / ca, dx0, dx1)
            cy0 = jnp.clip(-cb * dx0 / cc, dy0, dy1)
            cy1 = jnp.clip(-cb * dx1 / cc, dy0, dy1)
            qmin = jnp.minimum(jnp.minimum(_q(cx0, dy0), _q(cx1, dy1)),
                               jnp.minimum(_q(dx0, cy0), _q(dx1, cy1)))
            inside = (dx0 <= 0) & (dx1 >= 0) & (dy0 <= 0) & (dy1 >= 0)
            qmin = jnp.where(inside, 0.0, qmin)
            culled = qmin > two_l * (1.0 + 1e-4) + 1e-3
            valid = valid & ~culled
            tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
            gid_s = jnp.where(eidx < total, gid_e, n)
            if upto == 2:
                return s + 1 + (sum(jnp.sum(c) for c in exp_cols)
                                + jnp.sum(tile_key + gid_s)
                                .astype(jnp.float32)) * 1e-30
            ops = jax.lax.sort((tile_key, gid_s) + exp_cols,
                               dimension=0, is_stable=True, num_keys=1)
            sorted_key, sorted_gid = ops[0], ops[1]
            sorted_cols = tuple(ops[2:])
            if upto == 3:
                return s + 1 + (sum(jnp.sum(c) for c in sorted_cols)
                                + jnp.sum(sorted_key + sorted_gid)
                                .astype(jnp.float32)) * 1e-30
            tiles = jnp.arange(num_tiles, dtype=jnp.int32)
            start = jnp.searchsorted(sorted_key, tiles,
                                     side='left').astype(jnp.int32)
            end = jnp.searchsorted(sorted_key, tiles + 1,
                                   side='left').astype(jnp.int32)
            counts_orig = jax.lax.sort(
                (order.astype(jnp.int32), counts.astype(jnp.int32)),
                dimension=0, num_keys=1)[1]
            return s + 1 + (sum(jnp.sum(c) for c in sorted_cols)
                            + (jnp.sum(start + end)
                               + jnp.sum(counts_orig)
                               + jnp.sum(sorted_key + sorted_gid))
                            .astype(jnp.float32)) * 1e-30
        return f

    def slope(f, label, k1=1, k2=6, reps=3):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        float(jf(jnp.float32(0), params.xyz))
        print(f"  [{label}] compile: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(k):
            x = jnp.float32(0)
            for _ in range(k):
                x = jf(x, params.xyz)
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

    sel = os.environ.get("GS_R5M_STAGES")
    stages = ((0, "b0 pre-expansion"), (1, "b1 +pallas expand"),
              (2, "b2 +entry math/cull"), (3, "b3 +tile sort"),
              (4, "b4 +ranges (full)"))
    if sel:
        want = {int(x) for x in sel.split(",")}
        stages = tuple(st for st in stages if st[0] in want)
    ts = []
    for u, lab in stages:
        ts.append(slope(stage(u), lab))
    d = [1e3 * (b - a) for a, b in zip(ts, ts[1:])]
    print("deltas:", [round(x, 1) for x in d], flush=True)


if __name__ == "__main__":
    main()
