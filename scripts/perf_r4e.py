"""Round-4e: raster-kernel formulation probes at the bench tier shape.

The forward chunk loop currently computes transmittance via
log1p -> triangular-matmul cumsum -> exp (two [CS,PIX] transcendentals +
one [CS,CS]x[CS,PIX] MXU op per chunk). Variants probed here:

  A. baseline (the real _raster_tiles fwd / fwd+bwd)
  B. fwd with shift-multiply CUMPROD: u = cumprod(1 - alpha) via 7
     sublane-shifted multiplies — no log1p, no exp, no matmul
  C. fwd with the matmul at explicit HIGHEST precision (what exactness
     costs; DEFAULT on TPU demotes f32 matmul inputs)
  D. tiles_per_program=8

Value parity of B vs A is checked on-chip before timing.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = 3328000
F = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    from gs_tpu.ops.rasterize_pallas import (
        CS, NFEAT, _Statics, _chunk_alpha, _chunk_dma, _entry_mask,
        _pixel_rows, _raster_tiles, _tri_matrices)
    from gs_tpu.ops.composite import T_EPS

    W, H, TX, TY = 1920, 1080, 16, 16
    gx, gy = W // TX, -(-H // TY)
    T = gx * gy
    mpt = 1024
    max_chunks = -(-(max(mpt // CS, 1) + 1) // 8) * 8
    PIX = TX * TY

    rng = np.random.default_rng(0)
    # realistic-ish packets: positive conics, small opacities
    feats_np = np.zeros((NFEAT, D), np.float32)
    feats_np[0] = rng.uniform(0, W, D)     # x
    feats_np[1] = rng.uniform(0, H, D)     # y
    feats_np[2] = rng.uniform(0.01, 0.2, D)   # conic_a
    feats_np[3] = rng.uniform(-0.02, 0.02, D)  # conic_b
    feats_np[4] = rng.uniform(0.01, 0.2, D)   # conic_c
    feats_np[5] = rng.uniform(0.05, 0.9, D)   # opacity
    feats_np[6:10] = rng.uniform(0, 1, (4, D))
    feats = jnp.asarray(feats_np)
    starts = (jnp.arange(T, dtype=jnp.int32) * ((D - 600) // T))
    ends = starts + 370                    # ~3.0M entries in ranges
    rowp = jnp.zeros((1,), jnp.int32)

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

    # ---------------- variant forward kernels ------------------------
    def make_fwd(mode, tbp):
        def kern(tile_start_ref, tile_end_ref, rowp_ref, feats_hbm, out_ref,
                 fbuf, sem):
            l_incl, _ = _tri_matrices(CS)
            for tb in range(tbp):
                t = pl.program_id(0) * tbp + tb
                start = tile_start_ref[t]
                end = tile_end_ref[t]
                base = pl.multiple_of((start // CS) * CS, CS)
                nchunks = jnp.minimum(pl.cdiv(end - base, CS), max_chunks)
                px, py = _pixel_rows(t, gx, TX, TY, PIX,
                                     rowp_ref[0] + (t // gx))
                out_ref[tb] = jnp.zeros((8, PIX), jnp.float32)
                out_ref[tb, 4:5] = jnp.ones((1, PIX), jnp.float32)
                out_ref[tb, 5:6] = jnp.ones((1, PIX), jnp.float32)

                @pl.when(nchunks > 0)
                def _(base=base):
                    _chunk_dma(feats_hbm, fbuf, sem, base, 0, 0).start()

                def body(k, carry, tb=tb, base=base, nchunks=nchunks,
                         start=start, end=end, px=px, py=py):
                    umax, kproc = carry
                    slot = jax.lax.rem(k, 2)

                    @pl.when(k + 1 < nchunks)
                    def _():
                        _chunk_dma(feats_hbm, fbuf, sem, base, k + 1,
                                   1 - slot).start()
                    _chunk_dma(feats_hbm, fbuf, sem, base, k, slot).wait()
                    active = umax >= T_EPS

                    @pl.when(active)
                    def _():
                        f = fbuf[slot].T
                        vmask = _entry_mask(base, k, start, end)
                        alpha, _, _, _, _, _ = _chunk_alpha(f, vmask, px, py)
                        u_prev = out_ref[tb, 4:5]
                        if mode == "cumprod":
                            q = 1.0 - alpha            # [CS, PIX]
                            for s in (1, 2, 4, 8, 16, 32, 64):
                                qs = jax.lax.pad(
                                    q[:CS - s], jnp.float32(1.0),
                                    ((s, 0, 0), (0, 0, 0)))
                                q = q * qs
                            u_incl = u_prev * q
                        else:
                            lg = jnp.log1p(-alpha)
                            prec = (jax.lax.Precision.HIGHEST
                                    if mode == "highest" else None)
                            cum = jnp.dot(l_incl, lg,
                                          preferred_element_type=jnp.float32,
                                          precision=prec)
                            u_incl = u_prev * jnp.exp(cum)
                        u_excl = u_incl / (1.0 - alpha)
                        live = (u_incl >= T_EPS).astype(jnp.float32)
                        w = alpha * u_excl * live
                        contrib = jax.lax.dot_general(
                            f[:, 6:10], w, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        out_ref[tb, 0:4] += contrib
                        tmin = jnp.min(jnp.where(live > 0, u_incl, jnp.inf),
                                       axis=0, keepdims=True)
                        out_ref[tb, 5:6] = jnp.minimum(out_ref[tb, 5:6], tmin)
                        out_ref[tb, 4:5] = u_incl[CS - 1:CS, :]
                    kproc = jnp.where(active, k + 1, kproc)
                    return jnp.max(out_ref[tb, 4:5]), kproc

                jax.lax.fori_loop(0, nchunks, body,
                                  (jnp.float32(1.0), jnp.int32(0)))
        return kern

    def run_fwd(mode, tbp, f, st, en):
        t_pad = -(-T // tbp) * tbp
        stp = jnp.pad(st, (0, t_pad - T))
        enp = jnp.pad(en, (0, t_pad - T))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t_pad // tbp,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=[pl.BlockSpec((tbp, 8, PIX), lambda t, *_: (t, 0, 0),
                                    memory_space=pltpu.MemorySpace.VMEM)],
            scratch_shapes=[pltpu.VMEM((2, NFEAT, CS), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )
        out = pl.pallas_call(
            make_fwd(mode, tbp), grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((t_pad, 8, PIX), jnp.float32)],
        )(stp, enp, rowp, f)[0]
        return out[:T]

    # parity: cumprod vs baseline values
    a = jax.jit(functools.partial(run_fwd, "base", 4))(feats, starts, ends)
    b = jax.jit(functools.partial(run_fwd, "cumprod", 4))(feats, starts, ends)
    c = jax.jit(functools.partial(run_fwd, "highest", 4))(feats, starts, ends)
    sc = float(jnp.max(jnp.abs(c[:, 0:6])))
    print(f"fwd parity: base-vs-highest {float(jnp.max(jnp.abs(a - c))):.3e}"
          f"  cumprod-vs-highest {float(jnp.max(jnp.abs(b - c))):.3e}"
          f"  scale {sc:.3e}", flush=True)

    def p(mode, tbp):
        def f(s, ff, st, en):
            out = run_fwd(mode, tbp, ff + s * 1e-30, st, en)
            return s + 1 + jnp.sum(out) * 1e-30
        return f

    slope(p("base", 4), (feats, starts, ends), "fwd base tbp4")
    slope(p("cumprod", 4), (feats, starts, ends), "fwd cumprod tbp4")
    slope(p("highest", 4), (feats, starts, ends), "fwd matmul-HIGHEST tbp4")
    slope(p("cumprod", 8), (feats, starts, ends), "fwd cumprod tbp8")

    # baseline real kernel fwd+bwd at this shape for reference
    statics = _Statics(num_tiles=T, gx=gx, tile_x=TX, tile_y=TY,
                       max_chunks=max_chunks, interpret=False,
                       tiles_per_program=4, row_stride=1)

    def p_kfb(s, f, st, en):
        def l(ff):
            out = _raster_tiles(ff, st, en, rowp, statics)
            return jnp.sum(out * out)
        v, g = jax.value_and_grad(l)(f + s * 1e-30)
        return s + 1 + (v + jnp.sum(g)) * 1e-30

    def p_kf(s, f, st, en):
        out = _raster_tiles(f + s * 1e-30, st, en, rowp, statics)
        return s + 1 + jnp.sum(out) * 1e-30

    slope(p_kf, (feats, starts, ends), "real kernel fwd (primal)")
    slope(p_kfb, (feats, starts, ends), "real kernel fwd+bwd")


if __name__ == "__main__":
    main()
