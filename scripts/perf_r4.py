"""Round-4 step decomposition probes (run on the real TPU).

Round-3's probes (A tree / B packed / C packed+Adam all ~246 ms) killed the
"~70 ms parameter-layout tail" hypothesis; ~110 ms of the step remains
unattributed and the 4-step lax.scan block costs ~50 ms/step over plain
chained dispatches. These probes pin both down:

  scan     : per-step time of scan-of-4 vs scan-of-1 vs plain jit
  stages   : composed fwd / fwd+bwd slopes of prefix pipelines —
             preprocess, +binning, +kernel, each with and without grad —
             so every >=10 ms slice of the full step gets a named owner.

All probes follow CLAUDE.md's rules: slope timing with chained inputs, sums
(not slices) as outputs, quadratic losses for VJPs, operands as jit args.
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
    from gs_tpu.core.project import preprocess
    from gs_tpu.models.gaussian_model import create_from_pcd
    from gs_tpu.ops.binning import bin_gaussians_payload
    from gs_tpu.ops.rasterize_jnp import pack_projected
    from gs_tpu.ops.rasterize_pallas import _bin_with_payload
    from gs_tpu.render import render

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
    kwargs = dict(active_sh_degree=3, backend="pallas", alive=alive,
                  dup_capacity=DUP_CAP, max_per_tile=MPT, chunk=64)

    def slope(f, x0, fetch, label, k1=1, k2=3, reps=3):
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
        for _ in range(reps):
            t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
            d = (t2 - t1) / (k2 - k1)
            best = d if best is None else min(best, d)
        print(f"  [{label}] {best*1e3:.1f} ms", flush=True)
        return best

    which = set(sys.argv[1:] or ["scan", "stages"])
    fscal = lambda p: float(p.xyz[0, 0])

    # ---------------- scan-vs-plain --------------------------------------
    if "scan" in which:
        def loss(p):
            out = render(cam, p, bg, **kwargs)
            return jnp.mean(jnp.abs(out.image - gt))

        @jax.jit
        def step_plain(p):
            g = jax.grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

        def make_scan(k):
            @jax.jit
            def step_scan(p):
                def body(pp, _):
                    g = jax.grad(loss)(pp)
                    return jax.tree.map(lambda a, b: a - 1e-12 * b, pp, g), 0
                p2, _ = jax.lax.scan(body, p, None, length=k)
                return p2
            return step_scan

        d1 = slope(step_plain, params, fscal, "plain jit step")
        d4 = slope(make_scan(4), params, fscal, "scan-4 block") / 4
        ds1 = slope(make_scan(1), params, fscal, "scan-1 block")
        print(f"scan: plain={d1*1e3:.1f} scan4/step={d4*1e3:.1f} "
              f"scan1={ds1*1e3:.1f}", flush=True)

    # ---------------- composed stage prefixes -----------------------------
    if "stages" in which:
        row_phase = jnp.zeros((1,), jnp.int32)
        dims = (WIDTH, HEIGHT, 16, 16, DUP_CAP, 1, False, "repeat", False,
                False)

        def prep_pack(p):
            proj = preprocess(p, cam, active_sh_degree=3, alive=alive)
            return pack_projected(proj), proj

        # S1: preprocess fwd
        @jax.jit
        def s1(p):
            pk, _ = prep_pack(p)
            return p._replace(xyz=p.xyz + jnp.sum(pk) * 1e-30)

        # S1g: preprocess fwd+bwd (quadratic in packets)
        @jax.jit
        def s1g(p):
            def l(pp):
                pk, _ = prep_pack(pp)
                return jnp.sum(pk * pk)
            g = jax.grad(l)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)

        # S2: preprocess + binning fwd (payload sort, no kernel)
        @jax.jit
        def s2(p):
            pk, proj = prep_pack(p)
            bins, cols_ = bin_gaussians_payload(
                proj, pk, WIDTH, HEIGHT, 16, 16, DUP_CAP)
            acc = sum(jnp.sum(c) for c in cols_) + jnp.sum(
                bins.tile_start).astype(jnp.float32)
            return p._replace(xyz=p.xyz + acc * 1e-30)

        # S2g: preprocess + binning + segment-sum fold backward
        @jax.jit
        def s2g(p):
            def l(pp):
                pk, proj = prep_pack(pp)
                proj_sg = jax.tree.map(jax.lax.stop_gradient, proj)
                (bins, cols_) = _bin_with_payload(pk, proj_sg, dims,
                                                  row_phase)
                return sum(jnp.sum(c * c) for c in cols_)
            g = jax.grad(l)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)

        # S3 / S3g: full render fwd / fwd+bwd
        @jax.jit
        def s3(p):
            out = render(cam, p, bg, **kwargs)
            return p._replace(xyz=p.xyz + jnp.sum(out.image) * 1e-30)

        @jax.jit
        def s3g(p):
            def l(pp):
                out = render(cam, pp, bg, **kwargs)
                return jnp.mean(jnp.abs(out.image - gt))
            g = jax.grad(l)(p)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

        r = {}
        r["S1 prep fwd"] = slope(s1, params, fscal, "S1 prep fwd")
        r["S1g prep fwd+bwd"] = slope(s1g, params, fscal, "S1g prep fwd+bwd")
        r["S2 +binning fwd"] = slope(s2, params, fscal, "S2 +binning fwd")
        r["S2g +binning+fold"] = slope(s2g, params, fscal,
                                       "S2g +binning+fold")
        r["S3 full fwd"] = slope(s3, params, fscal, "S3 full fwd")
        r["S3g full fwd+bwd"] = slope(s3g, params, fscal, "S3g full fwd+bwd")
        print({k: round(v * 1e3, 1) for k, v in r.items()}, flush=True)
        print("derived: kernel_fwd+untile={:.1f} bwd_beyond_fold={:.1f}"
              .format((r["S3 full fwd"] - r["S2 +binning fwd"]) * 1e3,
                      (r["S3g full fwd+bwd"] - r["S2g +binning+fold"]
                       - (r["S3 full fwd"] - r["S2 +binning fwd"])) * 1e3),
              flush=True)


if __name__ == "__main__":
    main()
