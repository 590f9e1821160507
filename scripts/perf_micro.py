"""On-chip microbenchmarks for the rasterization pipeline stages.

Usage: python scripts/perf_micro.py stage1 stage2 ...   (or 'all')

Timing follows CLAUDE.md's slope protocol: each jitted probe takes and
returns a carried scalar so successive calls chain (no cache-serving through
the axon tunnel); report (t_k2 - t_k1) / (k2 - k1).
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 1 << 19            # gaussian capacity (bench scale)
D = 1 << 22            # duplicate capacity
NT = 8160              # tiles at 1080p / 16x16


def slope(name, fn, k1=1, k2=5, jit=True):
    import jax
    f = jax.jit(fn) if jit else fn
    s = f(np.float32(0.0))
    float(s)  # compile + first run
    def run(k):
        x = np.float32(0.0)
        for _ in range(k):
            x = f(x)
        return float(x)
    t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (k2 - k1)
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def make_inputs():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    # counts distribution roughly like the bench scene: ~7 tiles/gaussian
    counts = rng.poisson(6.9, N).astype(np.int32)
    total = int(counts.sum())
    if total > D:
        counts = (counts * (D / total * 0.98)).astype(np.int32)
        total = int(counts.sum())
    gid_stream = np.repeat(np.arange(N, dtype=np.int32), counts)
    rng.shuffle(gid_stream)
    gid = np.full(D, N, np.int32)
    gid[:total] = gid_stream
    key = rng.integers(0, NT, D).astype(np.int32)
    vals = rng.standard_normal((D, 10)).astype(np.float32)
    packets = rng.standard_normal((N, 16)).astype(np.float32)
    return (jnp.asarray(counts), jnp.asarray(gid), jnp.asarray(key),
            jnp.asarray(vals), jnp.asarray(packets), total)


def main():
    import jax
    import jax.numpy as jnp
    which = set(sys.argv[1:]) or {"all"}
    def on(x):
        return "all" in which or x in which

    counts, gid, key, vals, packets, total = make_inputs()
    vcols = tuple(vals[:, i] for i in range(10))
    print(json.dumps({"device": str(jax.devices()[0]), "total_dups": total}),
          flush=True)

    if on("sort2"):
        def f(s):
            k2 = key + (s * 1e-30).astype(jnp.int32)
            o = jax.lax.sort((k2, gid), dimension=0, is_stable=False,
                             num_keys=1)
            return s + 1 + o[1][0].astype(jnp.float32) * 1e-30
        slope("sort2_unstable_int", f)

    if on("sort2s"):
        def f(s):
            k2 = key + (s * 1e-30).astype(jnp.int32)
            o = jax.lax.sort((k2, gid), dimension=0, is_stable=True,
                             num_keys=1)
            return s + 1 + o[1][0].astype(jnp.float32) * 1e-30
        slope("sort2_stable_int", f)

    if on("sort12"):
        def f(s):
            v0 = vcols[0] + s * 1e-30
            o = jax.lax.sort((key, gid, v0) + vcols[1:], dimension=0,
                             is_stable=True, num_keys=1)
            return s + 1 + o[2][0] * 1e-30
        slope("sort12_stable", f)

    if on("sort12u"):
        def f(s):
            v0 = vcols[0] + s * 1e-30
            o = jax.lax.sort((key, gid, v0) + vcols[1:], dimension=0,
                             is_stable=False, num_keys=1)
            return s + 1 + o[2][0] * 1e-30
        slope("sort12_unstable", f)

    if on("gather"):
        def f(s):
            t = packets + s * 1e-30
            g = jnp.take(t, jnp.minimum(gid, N - 1), axis=0)   # [D,16]
            return s + 1 + g[0, 0] * 1e-30
        slope("gather_rows16_DfromN", f)

    if on("repeat5"):
        table = jnp.tile(jnp.arange(5, dtype=jnp.int32)[None], (N, 1))
        def f(s):
            t = table + (s * 1e-30).astype(jnp.int32)
            r = jnp.repeat(t, counts, axis=0, total_repeat_length=D)
            return s + 1 + r[0, 0].astype(jnp.float32) * 1e-30
        slope("repeat_rows5_i32", f)

    if on("repeat15"):
        table15 = jnp.concatenate(
            [jnp.tile(jnp.arange(5, dtype=jnp.float32)[None], (N, 1)),
             packets[:, :10]], axis=1)
        def f(s):
            t = table15 + s * 1e-30
            r = jnp.repeat(t, counts, axis=0, total_repeat_length=D)
            return s + 1 + r[0, 0] * 1e-30
        slope("repeat_rows15_f32", f)

    if on("segcompact"):
        from gs_tpu.ops.segment import segment_sum_compact
        def f(s):
            v = vals + s * 1e-30
            o = segment_sum_compact(v, jnp.minimum(gid, N - 1), N)
            return s + 1 + o[0, 0] * 1e-30
        slope("segsum_compact", f)

    if on("segrunend"):
        from gs_tpu.ops.segment import segment_sum_runend
        def f(s):
            v0 = vcols[0] + s * 1e-30
            o = segment_sum_runend((v0,) + vcols[1:], gid, counts, N)
            return s + 1 + o[0, 0] * 1e-30
        slope("segsum_runend", f)

    if on("cumsum2d"):
        def f(s):
            v = vals + s * 1e-30
            return s + 1 + jnp.cumsum(v, axis=0)[-1, 0] * 1e-30
        slope("cumsum_D10_axis0", f)

    if on("cumsum1d"):
        def f(s):
            acc = s * 0.0
            for i in range(10):
                acc = acc + jnp.cumsum(vcols[i] + s * 1e-30)[-1]
            return s + 1 + acc * 1e-30
        slope("cumsum_10x_1d", f)

    if on("stack"):
        def f(s):
            v0 = vcols[0] + s * 1e-30
            st = jnp.stack((v0,) + vcols[1:], axis=1)
            return s + 1 + st[0, 0] * 1e-30
        slope("stack_10cols_to_D10", f)

    if on("searchsorted"):
        skey = jnp.sort(key)
        tiles = jnp.arange(NT, dtype=jnp.int32)
        def f(s):
            k2 = skey + (s * 1e-30).astype(jnp.int32)
            a = jnp.searchsorted(k2, tiles, side='left')
            b = jnp.searchsorted(k2, tiles + 1, side='left')
            return s + 1 + (a[0] + b[0]).astype(jnp.float32) * 1e-30
        slope("searchsorted_2xNT", f)

    # ---- full pipeline stages on the real bench scene ----------------------
    if (on("pipeline") or on("binning") or on("prep") or on("fwd")
            or on("step") or on("kfwd") or on("kbwd")):
        sys.path.insert(0, "/root/repo")
        import bench as B
        from gs_tpu.core.camera import make_camera, focal2fov
        from gs_tpu.core.project import preprocess
        from gs_tpu.render import render
        from gs_tpu.ops.rasterize_jnp import pack_projected
        from gs_tpu.ops.binning import bin_gaussians_payload

        params, alive = B.build_scene()
        fovx = math.radians(70.0)
        fovy = focal2fov(1920 / (2 * math.tan(fovx / 2)), 1080)
        cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, 1920, 1080)
        bg = jnp.zeros(3)
        gt = jnp.zeros((3, 1080, 1920), jnp.float32)
        kwargs = dict(active_sh_degree=3, backend="pallas", alive=alive,
                      dup_capacity=1 << 22, max_per_tile=8192, chunk=64)

        if on("prep") or on("pipeline"):
            def f(s):
                p = params._replace(xyz=params.xyz + s * 1e-30)
                proj = preprocess(p, cam, active_sh_degree=3, alive=alive)
                pk = pack_projected(proj)
                return s + 1 + pk[0, 0] * 1e-30
            slope("preprocess_pack", f)

        if on("binning") or on("pipeline"):
            proj0 = jax.jit(lambda p: preprocess(
                p, cam, active_sh_degree=3, alive=alive))(params)
            pk0 = jax.jit(pack_projected)(proj0)
            def f(s):
                pk = pk0 + s * 1e-30
                bins, cols = bin_gaussians_payload(
                    proj0, pk, 1920, 1080, 16, 16, 1 << 22)
                return s + 1 + (cols[0][0]
                                + bins.tile_start[0].astype(jnp.float32)) * 1e-30
            slope("binning_payload", f)

        if on("kfwd") or on("kbwd"):
            from gs_tpu.ops.rasterize_pallas import (_raster_tiles, _Statics,
                                                     pack_projected as _pp,
                                                     CS, NFEAT)
            proj0 = jax.jit(lambda p: preprocess(
                p, cam, active_sh_degree=3, alive=alive))(params)
            pk0 = jax.jit(pack_projected)(proj0)
            bins, colz = jax.jit(lambda pk: bin_gaussians_payload(
                proj0, pk, 1920, 1080, 16, 16, 1 << 22))(pk0)
            feats0 = jnp.concatenate(
                [jnp.stack(colz, axis=0),
                 jnp.zeros((6, colz[0].shape[0]), jnp.float32)], axis=0)
            ts, te = bins.tile_start, bins.tile_end
            phase0 = jnp.zeros((1,), jnp.int32)
            st = _Statics(num_tiles=8160, gx=120, tile_x=16, tile_y=16,
                          max_chunks=65, interpret=False, tiles_per_program=4)
            # pass the big arrays as ARGUMENTS — closed-over device arrays
            # bake into the HLO as constants and blow the remote-compile
            # request limit (HTTP 413) at 270 MB
            if on("kfwd"):
                jf = jax.jit(lambda s, ft, a, b: s + 1 + _raster_tiles(
                    ft + s * 1e-30, a, b, phase0, st)[0, 0, 0] * 1e-30)
                slope("kernel_fwd_only",
                      lambda s, _j=jf: _j(s, feats0, ts, te), jit=False)
            if on("kbwd"):
                def _loss(ft, a, b):
                    return jnp.sum(_raster_tiles(ft, a, b, phase0, st)[:, 0:4])
                jg = jax.jit(lambda s, ft, a, b: s + 1 + jax.grad(_loss)(
                    ft + s * 1e-30, a, b)[0, 0] * 1e-30)
                slope("kernel_fwd_plus_bwd",
                      lambda s, _j=jg: _j(s, feats0, ts, te), jit=False)

        if on("fwd") or on("pipeline"):
            def f(s):
                p = params._replace(xyz=params.xyz + s * 1e-30)
                out = render(cam, p, bg, **kwargs)
                return s + 1 + out.image[0, 0, 0] * 1e-30
            slope("render_fwd", f)

        if on("step") or on("pipeline"):
            def loss_fn(p):
                out = render(cam, p, bg, **kwargs)
                return jnp.mean(jnp.abs(out.image - gt))
            def f(s):
                p = params._replace(xyz=params.xyz + s * 1e-30)
                g = jax.grad(loss_fn)(p)
                return s + 1 + g.xyz[0, 0] * 1e-30
            slope("render_fwd_bwd", f)


if __name__ == "__main__":
    main()
