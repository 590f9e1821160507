"""Round-5k: honest cumulative stage peel of the PRODUCTION pipeline.

perf_r5j measured the isolated sorts at 6.3 ms (12-op) / 3.8 ms (11-op) —
the r4 stage table's "28 + 26 ms sorts" was mis-attributed. Summing all
isolated pieces (prep 2.5, expand ~5, sort 6.3, kernel fwd 32.7, kernel
bwd 57.7, fold sort 3.8, fold ~2, untile ~2) gives ~115 ms of the 163.6 ms
headline: ~45-50 ms of glue is UNATTRIBUTED. This probe peels the real
pipeline cumulatively (pallas_expand + exact_cull ON, the product config)
so each difference is an in-context stage cost:

  p0 prep+pack        p1 +binning (expand+cull+sort+ranges)
  p2 +feats assembly  p3 +kernel fwd (primal, no-grad path)
  p4 full render fwd  p5 render fwd+bwd (quadratic loss through the
                         custom VJP — the headline composition)

All inputs are jit args; outputs are full sums (CLAUDE.md rule 3).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from gs_tpu.core.project import preprocess
    from gs_tpu.ops.binning import bin_gaussians_payload
    from gs_tpu.ops.rasterize_jnp import pack_projected
    from gs_tpu.render import render

    W, H = 1920, 1080
    params, alive = bench.build_scene("uniform")
    fovx = math.radians(70.0)
    fovy = focal2fov(W / (2 * math.tan(fovx / 2)), H)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, W, H)
    bg = jnp.zeros(3)
    dup_capacity, max_per_tile = bench.CAPS["uniform"]
    kwargs = dict(active_sh_degree=3, backend="pallas", alive=alive,
                  dup_capacity=dup_capacity, max_per_tile=max_per_tile,
                  chunk=64, exact_cull=True, pallas_expand=True,
                  pallas_fold=True)

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

    def with_xyz(xyz, s):
        return params._replace(xyz=xyz + s * 1e-30)

    def p0(s, xyz):
        proj = preprocess(with_xyz(xyz, s), cam, active_sh_degree=3,
                          alive=alive)
        return s + 1 + jnp.sum(pack_projected(proj)) * 1e-30

    def binned(s, xyz):
        proj = preprocess(with_xyz(xyz, s), cam, active_sh_degree=3,
                          alive=alive)
        pk = pack_projected(proj)
        bins, cols = bin_gaussians_payload(
            proj, pk, W, H, 16, 16, dup_capacity,
            expand="pallas", exact_cull=True, sort_gid=True)
        return bins, cols

    def p1(s, xyz):
        bins, cols = binned(s, xyz)
        return s + 1 + (sum(jnp.sum(c) for c in cols)
                        + jnp.sum(bins.tile_start).astype(jnp.float32)
                        + jnp.sum(bins.entry_gid).astype(jnp.float32)
                        ) * 1e-30

    def p2(s, xyz):
        from gs_tpu.ops.rasterize_pallas import NFEAT
        bins, cols = binned(s, xyz)
        feats = jnp.concatenate(
            [jnp.stack(cols, axis=0),
             jnp.zeros((NFEAT - 10, cols[0].shape[0]), jnp.float32)],
            axis=0)
        return s + 1 + (jnp.sum(feats)
                        + jnp.sum(bins.tile_start).astype(jnp.float32)
                        + jnp.sum(bins.entry_gid).astype(jnp.float32)
                        ) * 1e-30

    def p4(s, xyz):
        out = render(cam, with_xyz(xyz, s), bg, **kwargs)
        return s + 1 + (jnp.sum(out.image) + jnp.sum(out.invdepth)) * 1e-30

    def p5(s, xyz):
        def loss(p):
            out = render(cam, p, bg, **kwargs)
            return jnp.sum(out.image ** 2) + jnp.sum(out.invdepth ** 2)
        v, g = jax.value_and_grad(
            lambda x: loss(with_xyz(x, 0.0)))(xyz + s * 1e-30)
        return s + 1 + (v + sum(jnp.sum(t) for t in jax.tree.leaves(g))
                        ) * 1e-30

    t0_ = slope(p0, "p0 prep+pack")
    t1_ = slope(p1, "p1 +binning(expand+cull+sort+ranges)")
    t2_ = slope(p2, "p2 +feats assembly")
    t4_ = slope(p4, "p4 full render fwd (primal)")
    t5_ = slope(p5, "p5 render fwd+bwd (quadratic)")
    print(f"stage deltas: binning {1e3*(t1_-t0_):.1f} | feats "
          f"{1e3*(t2_-t1_):.1f} | kernel+untile {1e3*(t4_-t2_):.1f} | "
          f"bwd-side {1e3*(t5_-t4_):.1f}", flush=True)


if __name__ == "__main__":
    main()
