"""On-chip microbenchmarks for the rasterization pipeline stages.

Usage: python scripts/perf_micro.py stage1 stage2 ...   (or 'all')

Methodology (hard-won, see memory/gs-tpu-round2-perf.md):
- slope timing with a chained scalar (axon tunnel: block_until_ready lies,
  identical calls can be cache-served);
- EVERY array input is passed as a jit ARGUMENT — closed-over device arrays
  become HLO constants, which (a) blow the remote-compile request limit at
  ~100MB+ (HTTP 413) and (b) let XLA CONSTANT-FOLD whole pipeline stages
  (a sort with constant keys compiles to a constant-index gather), silently
  under-measuring.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 1 << 19            # gaussian capacity (bench scale)
D = 1 << int(os.environ.get("GS_CAP_LOG2", "22"))   # duplicate capacity
NT = 8160              # tiles at 1080p / 16x16
MPT = int(os.environ.get("GS_MPT", "1024"))         # max_per_tile (bench: 1024)


def _enable_cache():
    import jax
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def slope(name, fn, *args, k1=1, k2=5, jit=True):
    import jax
    f = jax.jit(fn) if jit else fn
    float(f(np.float32(0.0), *args))   # compile + first run
    def run(k):
        x = np.float32(0.0)
        for _ in range(k):
            x = f(x, *args)
        return float(x)
    t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (k2 - k1)
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def make_inputs():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
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
    _enable_cache()
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
        def f(s, key, gid):
            k2 = key + (s * 1e-30).astype(jnp.int32)
            o = jax.lax.sort((k2, gid), dimension=0, is_stable=True,
                             num_keys=1)
            return s + 1 + o[1][0].astype(jnp.float32) * 1e-30
        slope("sort2_stable_int", f, key, gid)

    if on("sort12"):
        def f(s, key, gid, *vc):
            k2 = key + (s * 1e-30).astype(jnp.int32)
            o = jax.lax.sort((k2, gid) + vc, dimension=0,
                             is_stable=True, num_keys=1)
            return s + 1 + o[2][0] * 1e-30
        slope("sort12_stable", f, key, gid, *vcols)

    if on("gather"):
        def f(s, t, gid):
            g = jnp.take(t + s * 1e-30, jnp.minimum(gid, N - 1), axis=0)
            return s + 1 + g[0, 0] * 1e-30
        slope("gather_rows16_DfromN", f, packets, gid)

    if on("repeat15"):
        table15 = jnp.concatenate(
            [jnp.tile(jnp.arange(5, dtype=jnp.float32)[None], (N, 1)),
             packets[:, :10]], axis=1)
        def f(s, t, c):
            r = jnp.repeat(t + s * 1e-30, c, axis=0, total_repeat_length=D)
            return s + 1 + r[0, 0] * 1e-30
        slope("repeat_rows15_f32", f, table15, counts)

    if on("repeat2"):
        # jnp.repeat alternative: sorted-scatter marks + cumsum + sorted
        # monotone gather (jnp.repeat's internal scatter-add carries no
        # sortedness hints)
        table15 = jnp.concatenate(
            [jnp.tile(jnp.arange(5, dtype=jnp.float32)[None], (N, 1)),
             packets[:, :10]], axis=1)
        def f(s, t, c):
            t = t + s * 1e-30
            offsets = jnp.cumsum(c) - c
            marks = jnp.zeros((D,), jnp.int32).at[offsets].add(
                1, mode='drop', indices_are_sorted=True)
            gidx = jnp.cumsum(marks) - 1
            r = t.at[jnp.maximum(gidx, 0)].get(indices_are_sorted=True,
                                               mode='clip')
            return s + 1 + r[0, 0] * 1e-30
        slope("repeat2_sortedscatter", f, table15, counts)

    if on("repeat3"):
        # scatter-free: searchsorted(ends, eidx) source indices
        table15 = jnp.concatenate(
            [jnp.tile(jnp.arange(5, dtype=jnp.float32)[None], (N, 1)),
             packets[:, :10]], axis=1)
        def f(s, t, c):
            t = t + s * 1e-30
            ends = jnp.cumsum(c)
            gidx = jnp.searchsorted(ends, jnp.arange(D, dtype=jnp.int32),
                                    side='right')
            r = t.at[jnp.minimum(gidx, N - 1)].get(indices_are_sorted=True,
                                                   mode='clip')
            return s + 1 + r[0, 0] * 1e-30
        slope("repeat3_searchsorted", f, table15, counts)

    if on("segrunend"):
        from gs_tpu.ops.segment import segment_sum_runend
        def f(s, c, g, *vc):
            o = segment_sum_runend((vc[0] + s * 1e-30,) + vc[1:], g, c, N)
            return s + 1 + o[0, 0] * 1e-30
        slope("segsum_runend", f, counts, gid, *vcols)

    if on("stack0"):
        def f(s, *vc):
            st = jnp.stack((vc[0] + s * 1e-30,) + vc[1:], axis=0)  # [10, D]
            return s + 1 + st[0, 0] * 1e-30
        slope("stack_10cols_axis0", f, *vcols)

    if on("slicerows"):
        big = jnp.asarray(np.random.default_rng(3).standard_normal(
            (16, D)).astype(np.float32))
        def f(s, b):
            b = b + s * 1e-30
            acc = s * 0.0
            for i in range(10):
                acc = acc + b[i][0]
            return s + 1 + acc * 1e-30
        slope("slice_10rows_of_16D", f, big)

    if on("searchsorted"):
        skey = jnp.sort(key)
        tiles = jnp.arange(NT, dtype=jnp.int32)
        def f(s, sk, t):
            sk = sk + (s * 1e-30).astype(jnp.int32)
            a = jnp.searchsorted(sk, t, side='left')
            b = jnp.searchsorted(sk, t + 1, side='left')
            return s + 1 + (a[0] + b[0]).astype(jnp.float32) * 1e-30
        slope("searchsorted_2xNT", f, skey, tiles)

    # ---- full pipeline stages on the real bench scene ----------------------
    pipeline_stages = {"pipeline", "binning", "prep", "prepbwd", "fwd",
                       "step", "kfwd", "kbwd", "featsfwd", "featsbwd",
                       "untile", "manualbwd", "binbwd", "segreal2", "seg2f", "prepvjp2",
                       "stepbf16", "stepupd", "gradall", "updonly"}
    if which & pipeline_stages or "all" in which:
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
                      dup_capacity=D, max_per_tile=MPT, chunk=64)

        def prep_of(p):
            return preprocess(p, cam, active_sh_degree=3, alive=alive)

        if on("prep") or on("pipeline"):
            def f(s, p):
                p = p._replace(xyz=p.xyz + s * 1e-30)
                return s + 1 + jnp.sum(pack_projected(prep_of(p))) * 1e-30
            slope("preprocess_pack", f, params)

        if on("prepbwd") or on("pipeline"):
            def f(s, p):
                g = jax.grad(lambda q: jnp.sum(pack_projected(
                    prep_of(q)) ** 2) * 1e-12)(p._replace(xyz=p.xyz + s * 1e-30))
                return s + 1 + (jnp.sum(g.xyz) + jnp.sum(g.log_scale)
                                + jnp.sum(g.quat)) * 1e-30
            slope("preprocess_pack_fwd_bwd", f, params)

        if on("binning") or on("pipeline"):
            def f(s, p):
                p = p._replace(xyz=p.xyz + s * 1e-30)
                proj = prep_of(p)
                pk = pack_projected(proj)
                bins, cols = bin_gaussians_payload(
                    proj, pk, 1920, 1080, 16, 16, D)
                return s + 1 + (jnp.sum(cols[0])
                                + jnp.sum(bins.tile_start).astype(jnp.float32)
                                + jnp.sum(bins.gauss_counts).astype(jnp.float32)
                                ) * 1e-30
            slope("prep_pack_binning", f, params)

        if on("featsfwd") or on("featsbwd") or on("pipeline"):
            from gs_tpu.ops.rasterize_pallas import _bin_with_payload
            def feats_of(p):
                proj = prep_of(p)
                pk = pack_projected(proj)
                bins, colz = _bin_with_payload(
                    pk, jax.tree.map(jax.lax.stop_gradient, proj),
                    (1920, 1080, 16, 16, D, 1, False),
                    jnp.zeros((1,), jnp.int32))
                return jnp.stack(colz, axis=0)
            if on("featsfwd") or on("pipeline"):
                def f(s, p):
                    ft = feats_of(p._replace(xyz=p.xyz + s * 1e-30))
                    return s + 1 + jnp.sum(ft) * 1e-30
                slope("feats_fwd", f, params)
            if on("featsbwd") or on("pipeline"):
                def f(s, p):
                    g = jax.grad(lambda q: jnp.sum(feats_of(q) ** 2) * 1e-12)(
                        p._replace(xyz=p.xyz + s * 1e-30))
                    return s + 1 + (jnp.sum(g.xyz) + jnp.sum(g.quat)) * 1e-30
                slope("feats_fwd_bwd", f, params)

        if on("binbwd"):
            # _bin_with_payload fwd+bwd w.r.t. the packets ONLY (prep/pack
            # excluded): isolates the binning VJP (slices + segsum + glue)
            from gs_tpu.ops.rasterize_pallas import _bin_with_payload
            proj0 = jax.jit(prep_of)(params)
            pk0 = jax.jit(pack_projected)(proj0)
            proj_sg = jax.tree.map(jax.lax.stop_gradient, proj0)
            def f(s, pk, pj):
                def loss(q):
                    _, colz = _bin_with_payload(
                        q, pj, (1920, 1080, 16, 16, D, 1, False),
                        jnp.zeros((1,), jnp.int32))
                    return jnp.sum(jnp.stack(colz, axis=0) ** 2) * 1e-12
                g = jax.grad(loss)(pk + s * 1e-30)
                return s + 1 + g[0, 0] * 1e-30
            slope("bin_payload_fwd_bwd", f, pk0, proj_sg)

        if on("segreal2"):
            from gs_tpu.ops.segment import segment_sum_runend
            proj0 = jax.jit(prep_of)(params)
            pk0 = jax.jit(pack_projected)(proj0)
            bins, _ = jax.jit(lambda pk: bin_gaussians_payload(
                proj0, pk, 1920, 1080, 16, 16, D))(pk0)
            gid_r = jnp.where(bins.entry_valid, bins.entry_gid, N)
            counts_r = bins.gauss_counts
            def f(s, g_, c_, *vc):
                o = segment_sum_runend((vc[0] + s * 1e-30,) + vc[1:],
                                       g_, c_, N)
                return s + 1 + o[0, 0] * 1e-30
            slope("segsum_runend_realgid", f, gid_r, counts_r, *vcols)

        if on("manualbwd"):
            # the backward side reconstructed as a standalone function:
            # 2f cotangent -> slices -> segment-sum -> pack/prep VJP.
            # If this is fast while the composed jax.grad is slow, the cost
            # is a composition artifact, not any one stage.
            from gs_tpu.ops.segment import segment_sum_runend
            proj0 = jax.jit(prep_of)(params)
            pk0 = jax.jit(pack_projected)(proj0)
            bins, colz = jax.jit(lambda pk: bin_gaussians_payload(
                proj0, pk, 1920, 1080, 16, 16, D))(pk0)
            feats0 = jnp.stack(colz, axis=0)            # [10, D]
            gid_r = jnp.where(bins.entry_valid, bins.entry_gid, 1 << 19)
            counts_r = bins.gauss_counts
            def f(s, ft, g_, c_, p):
                d = 2.0 * (ft + s * 1e-30)
                d_pk = segment_sum_runend(
                    tuple(d[i] for i in range(10)), g_, c_, 1 << 19)
                _, vjp = jax.vjp(lambda q: pack_projected(prep_of(q)), p)
                (gp,) = vjp(d_pk * 1e-12)
                return s + 1 + (jnp.sum(gp.xyz) + jnp.sum(gp.quat)) * 1e-30
            slope("manual_bwd_side", f, feats0, gid_r, counts_r, params)

        if on("seg2f") or on("prepvjp2"):
            from gs_tpu.ops.segment import segment_sum_runend
            proj0 = jax.jit(prep_of)(params)
            pk0 = jax.jit(pack_projected)(proj0)
            bins, colz = jax.jit(lambda pk: bin_gaussians_payload(
                proj0, pk, 1920, 1080, 16, 16, D))(pk0)
            feats0 = jnp.stack(colz, axis=0)            # [10, D]
            gid_r = jnp.where(bins.entry_valid, bins.entry_gid, 1 << 19)
            counts_r = bins.gauss_counts
            if on("seg2f"):
                def f(s, ft, g_, c_):
                    d = 2.0 * (ft + s * 1e-30)
                    o = segment_sum_runend(
                        tuple(d[i] for i in range(10)), g_, c_, 1 << 19)
                    return s + 1 + o[0, 0] * 1e-30
                slope("slices_plus_segsum", f, feats0, gid_r, counts_r)
            if on("prepvjp2"):
                d_pk0 = jax.jit(lambda ft, g_, c_: segment_sum_runend(
                    tuple(ft[i] for i in range(10)), g_, c_, 1 << 19))(
                    feats0, gid_r, counts_r)
                def f(s, dpk, p):
                    _, vjp = jax.vjp(lambda q: pack_projected(prep_of(q)), p)
                    (gp,) = vjp(dpk + s * 1e-30)
                    return s + 1 + (jnp.sum(gp.xyz) + jnp.sum(gp.quat)) * 1e-30
                slope("prep_pack_vjp_dyncot", f, d_pk0, params)

        if on("kfwd") or on("kbwd"):
            from gs_tpu.ops.rasterize_pallas import _raster_tiles, _Statics
            proj0 = jax.jit(prep_of)(params)
            pk0 = jax.jit(pack_projected)(proj0)
            bins, colz = jax.jit(lambda pk: bin_gaussians_payload(
                proj0, pk, 1920, 1080, 16, 16, D))(pk0)
            feats0 = jnp.stack(colz, axis=0)
            feats0 = jnp.concatenate(
                [feats0, jnp.zeros((6, feats0.shape[1]), jnp.float32)], 0)
            ts, te = bins.tile_start, bins.tile_end
            phase0 = jnp.zeros((1,), jnp.int32)
            st = _Statics(num_tiles=8160, gx=120, tile_x=16, tile_y=16,
                          max_chunks=65, interpret=False, tiles_per_program=4)
            if on("kfwd"):
                jf = jax.jit(lambda s, ft, a, b: s + 1 + _raster_tiles(
                    ft + s * 1e-30, a, b, phase0, st)[0, 0, 0] * 1e-30)
                slope("kernel_fwd_only",
                      lambda s, *a: jf(s, *a), feats0, ts, te, jit=False)
            if on("kbwd"):
                def _loss(ft, a, b):
                    return jnp.sum(_raster_tiles(ft, a, b, phase0, st)[:, 0:4])
                jg = jax.jit(lambda s, ft, a, b: s + 1 + jax.grad(_loss)(
                    ft + s * 1e-30, a, b)[0, 0] * 1e-30)
                slope("kernel_fwd_plus_bwd",
                      lambda s, *a: jg(s, *a), feats0, ts, te, jit=False)

        if on("untile"):
            # output assembly in isolation: out [T,8,PIX] -> image/invd/T
            # exactly as rasterize_pallas does, forward and backward
            out0 = jnp.asarray(np.random.default_rng(7).standard_normal(
                (8160, 8, 256)).astype(np.float32))
            gy, gx_ = 68, 120
            def assemble(o):
                color = o[:, 0:3, :]
                invd = o[:, 3, :]
                tmin = o[:, 5, :]
                img = color + tmin[:, None, :] * bg[None, :, None]
                def untile(x):
                    c = x.shape[1]
                    x = x.reshape(gy, gx_, c, 16, 16)
                    x = x.transpose(2, 0, 3, 1, 4).reshape(c, gy * 16,
                                                           gx_ * 16)
                    return x[:, :1080, :]
                return (untile(img), untile(invd[:, None, :]),
                        untile(tmin[:, None, :]))
            def f(s, o):
                a, b, c = assemble(o + s * 1e-30)
                return s + 1 + (a[0, 0, 0] + b[0, 0, 0] + c[0, 0, 0]) * 1e-30
            slope("untile_fwd", f, out0)
            def f2(s, o):
                g = jax.grad(lambda q: sum(jnp.sum(x) for x in
                                           assemble(q)) * 1e-12)(
                    o + s * 1e-30)
                return s + 1 + g[0, 0, 0] * 1e-30
            slope("untile_fwd_bwd", f2, out0)

        if on("fwd") or on("pipeline"):
            def f(s, p):
                p = p._replace(xyz=p.xyz + s * 1e-30)
                out = render(cam, p, bg, **kwargs)
                return s + 1 + out.image[0, 0, 0] * 1e-30
            slope("render_fwd", f, params)

        if on("updonly"):
            # bare parameter update: layout probe for the [C,K,3] pytree
            def f(s, p):
                q = jax.tree.map(lambda a: a * (1.0 - s * 1e-30), p)
                tot = sum(x[0].sum() for x in q)
                return s + 1 + tot * 1e-30
            slope("param_update_only", f, params)

        if on("gradall"):
            # gradient of ALL parameters (summed, no update): isolates the
            # parameter-gradient tail the xyz/quat-only probe DCE'd away
            def loss_fn3(p):
                out = render(cam, p, bg, **kwargs)
                return jnp.mean(jnp.abs(out.image - gt))
            def f(s, p):
                g = jax.grad(loss_fn3)(p._replace(xyz=p.xyz + s * 1e-30))
                tot = sum(jnp.sum(x) for x in g)
                return s + 1 + tot * 1e-30
            slope("grad_all_params", f, params)

        if on("stepupd"):
            # bench-exact step: chained params + tree update (bisects the
            # micro-vs-bench harness discrepancy)
            def loss_fn2(p):
                out = render(cam, p, bg, **kwargs)
                return jnp.mean(jnp.abs(out.image - gt))
            @jax.jit
            def stepu(p):
                g = jax.grad(loss_fn2)(p)
                return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            import time as _t
            stepu(params).xyz.block_until_ready()
            def run(k):
                pp = params
                for _ in range(k):
                    pp = stepu(pp)
                return float(pp.xyz[0, 0])
            run(2)
            t0=_t.perf_counter(); run(2); t1=_t.perf_counter()-t0
            t0=_t.perf_counter(); run(8); t2=_t.perf_counter()-t0
            print(json.dumps({"stage":"step_update_chained",
                              "ms": round((t2-t1)/6*1e3,2)}), flush=True)

        if on("step") or on("stepbf16") or on("pipeline"):
            use_bf16 = on("stepbf16")
            def loss_fn(p):
                out = render(cam, p, bg, bf16_features=use_bf16, **kwargs)
                return jnp.mean(jnp.abs(out.image - gt))
            def f(s, p):
                g = jax.grad(loss_fn)(p._replace(xyz=p.xyz + s * 1e-30))
                return s + 1 + (jnp.sum(g.xyz) + jnp.sum(g.quat)) * 1e-30
            slope("render_fwd_bwd_bf16" if use_bf16 else "render_fwd_bwd",
                  f, params)


if __name__ == "__main__":
    main()
