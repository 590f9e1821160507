"""Round-5a: kernel BACKWARD restructure probes at the bench tier shape.

The bwd is the largest slice (~64 ms of the 169 ms step, ROADMAP stage
table) and r4's skip_read experiment proved it COMPUTE-bound (the d-chunk
read DMA was already hidden). Variants here attack the per-chunk VPU work
and the loop overhead:

  V0 baseline — the real _bwd_kernel (isolated, residuals as jit args)
  V1 trim     — algebra/op-count reductions, identical math:
                * dldt*tmin hoisted out of the chunk loop ([1,PIX] once
                  per tile instead of two [CS,PIX] mults per chunk)
                * gate*opg pre-fused into one where() in the alpha chain
                * u_excl*live shared between w and the dalpha term
                * suffix-carry update from suffix[0]+wc[0] instead of a
                  full [CS,PIX] sublane reduction
  V2 trim+cumprod — transmittance via 7 shift-multiply doublings instead
                of log1p -> triangular matmul -> exp (two [CS,PIX]
                transcendentals deleted; measured NEUTRAL on the fwd in
                r4e, but the fwd is DMA/loop-bound where the bwd is
                compute-bound — retest here)
  V3 trim, tiles_per_program=8
  V5 floor    — all math replaced by a masked copy: the DMA + loop + RMW
                floor (what restructuring can never go below)

Parity of V1/V2/V3 dfeats vs V0 is checked on-chip before timing.
Timing: endpoint-min slope (min over reps of t_k1 and t_k2 separately,
then difference — CLAUDE.md rule 1), span >= 0.5 s.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = 3072000


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
        CS, NFEAT, _Statics, _chunk_dma, _entry_mask, _moment_matrix,
        _pixel_rows, _raster_tiles_bwd, _raster_tiles_fwd, _tri_matrices)
    from gs_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS

    W, H, TX, TY = 1920, 1080, 16, 16
    gx, gy = W // TX, -(-H // TY)
    T = gx * gy
    mpt = 1024
    max_chunks = -(-(max(mpt // CS, 1) + 1) // 8) * 8
    PIX = TX * TY

    rng = np.random.default_rng(0)
    feats_np = np.zeros((NFEAT, D), np.float32)
    feats_np[0] = rng.uniform(0, W, D)
    feats_np[1] = rng.uniform(0, H, D)
    feats_np[2] = rng.uniform(0.05, 0.2, D)
    feats_np[3] = rng.uniform(-0.02, 0.02, D)
    feats_np[4] = rng.uniform(0.05, 0.2, D)
    feats_np[5] = rng.uniform(0.05, 0.9, D)
    feats_np[6:10] = rng.uniform(0, 1, (4, D))
    feats = jnp.asarray(feats_np)
    starts = (jnp.arange(T, dtype=jnp.int32) * ((D - 600) // T))
    ends = starts + 370
    rowp = jnp.zeros((1,), jnp.int32)

    statics = _Statics(num_tiles=T, gx=gx, tile_x=TX, tile_y=TY,
                       max_chunks=max_chunks, interpret=False,
                       tiles_per_program=4, row_stride=1)

    def slope(f, args, label, k1=1, k2=6, reps=3):
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
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); run(k1); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(k2); t2s.append(time.perf_counter() - t0)
        d = (min(t2s) - min(t1s)) / (k2 - k1)
        spread = sorted(round((b - a) / (k2 - k1), 4)
                        for a, b in zip(t1s, t2s))
        print(f"  [{label}] {d*1e3:.1f} ms  spread={spread}", flush=True)
        return d

    # ---------------- variant backward kernels ------------------------
    def make_bwd(mode, tbp):
        trim = mode in ("trim", "cumprod", "floor")
        cumprod = mode == "cumprod"
        floor = mode == "floor"

        def kern(tile_start_ref, tile_end_ref, rowp_ref, feats_hbm,
                 out_fwd_ref, ustore_ref, dout_ref, zeros_hbm, dfeats_hbm,
                 fbuf, dbuf_rd, dbuf_wr, sem_in, sem_rd, sem_wr):
            del zeros_hbm
            l_incl, s_upper = _tri_matrices(CS)
            moments = _moment_matrix(TX, PIX)
            for tb in range(tbp):
                t = pl.program_id(0) * tbp + tb
                start = tile_start_ref[t]
                end = tile_end_ref[t]
                base = pl.multiple_of((start // CS) * CS, CS)
                px, py = _pixel_rows(t, gx, TX, TY, PIX,
                                     (t // gx) + rowp_ref[0])
                ox = (t % gx).astype(jnp.float32) * TX
                oy = ((t // gx) + rowp_ref[0]).astype(jnp.float32) * TY

                dldc = dout_ref[tb, 0:3]
                dldi = dout_ref[tb, 3:4]
                dldt = dout_ref[tb, 5:6]
                tmin = out_fwd_ref[tb, 5:6]
                dt_tmin = dldt * tmin                     # hoisted [1,PIX]
                kproc = out_fwd_ref[tb, 6, 0].astype(jnp.int32)

                def rd_dma(slot, k, base=base):
                    return pltpu.make_async_copy(
                        dfeats_hbm.at[:, pl.ds(
                            pl.multiple_of(base + k * CS, CS), CS)],
                        dbuf_rd.at[slot], sem_rd.at[slot])

                def wr_dma(slot, k, base=base):
                    return pltpu.make_async_copy(
                        dbuf_wr.at[slot],
                        dfeats_hbm.at[:, pl.ds(
                            pl.multiple_of(base + k * CS, CS), CS)],
                        sem_wr.at[slot])

                @pl.when(kproc > 0)
                def _(kproc=kproc, base=base):
                    _chunk_dma(feats_hbm, fbuf, sem_in, base, kproc - 1,
                               0).start()
                    rd_dma(0, kproc - 1).start()

                def body2(j, carry, kproc=kproc, base=base, start=start,
                          end=end, px=px, py=py, ox=ox, oy=oy, dldc=dldc,
                          dldi=dldi, dt_tmin=dt_tmin, tb=tb):
                    s_carry, wk0, wk1 = carry
                    k = kproc - 1 - j
                    slot = jax.lax.rem(j, 2)

                    @pl.when(j + 1 < kproc)
                    def _():
                        _chunk_dma(feats_hbm, fbuf, sem_in, base, k - 1,
                                   1 - slot).start()
                        rd_dma(1 - slot, k - 1).start()

                    _chunk_dma(feats_hbm, fbuf, sem_in, base, k, slot).wait()
                    rd_dma(slot, k).wait()
                    f = fbuf[slot].T
                    vmask = _entry_mask(base, k, start, end)
                    # alpha chain with gate*opg pre-fused
                    x = f[:, 0:1]
                    y = f[:, 1:2]
                    ca = f[:, 2:3]
                    cb = f[:, 3:4]
                    cc = f[:, 4:5]
                    op = f[:, 5:6]
                    dxp = x - px
                    dyp = y - py
                    power = (-0.5 * (ca * dxp * dxp + cc * dyp * dyp)
                             - cb * dxp * dyp)
                    g = jnp.exp(power)
                    opg = op * g
                    alpha_c = jnp.minimum(ALPHA_MAX, opg)
                    keep = (power <= 0.0) & (alpha_c >= ALPHA_MIN) & vmask
                    alpha = jnp.where(keep, alpha_c, 0.0)
                    opg_g = jnp.where(keep & (opg < ALPHA_MAX), opg, 0.0)

                    u_prev = ustore_ref[tb, pl.ds(k, 1), :]
                    if cumprod:
                        q = 1.0 - alpha
                        for sft in (1, 2, 4, 8, 16, 32, 64):
                            qs = jax.lax.pad(
                                q[:CS - sft], jnp.float32(1.0),
                                ((sft, 0, 0), (0, 0, 0)))
                            q = q * qs
                        u_incl = u_prev * q
                    else:
                        lg = jnp.log1p(-alpha)
                        cum = jnp.dot(l_incl, lg,
                                      preferred_element_type=jnp.float32)
                        u_incl = u_prev * jnp.exp(cum)
                    inv1ma = 1.0 / (1.0 - alpha)
                    live = (u_incl >= T_EPS).astype(jnp.float32)
                    ul = u_incl * inv1ma * live           # u_excl * live
                    w = alpha * ul

                    cdot = jax.lax.dot_general(
                        f[:, 6:9], dldc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    cdot = cdot + f[:, 9:10] * dldi
                    wc = w * cdot
                    suffix = jnp.dot(s_upper, wc,
                                     preferred_element_type=jnp.float32)
                    s_total = suffix + s_carry
                    dalpha = cdot * ul - (s_total + dt_tmin * live) * inv1ma
                    dpower = dalpha * opg_g
                    S = jax.lax.dot_general(
                        dpower, moments, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s0 = S[:, 0:1]
                    sx = S[:, 1:2]
                    sy = S[:, 2:3]
                    sxx = S[:, 3:4]
                    syy = S[:, 4:5]
                    sxy = S[:, 5:6]
                    xl = f[:, 0:1] - ox
                    yl = f[:, 1:2] - oy
                    d_op = jnp.where(op > 0.0,
                                     s0 / jnp.where(op > 0.0, op, 1.0), 0.0)
                    d_ca = -0.5 * (xl * xl * s0 - 2.0 * xl * sx + sxx)
                    d_cb = -(xl * yl * s0 - xl * sy - yl * sx + sxy)
                    d_cc = -0.5 * (yl * yl * s0 - 2.0 * yl * sy + syy)
                    mx = xl * s0 - sx
                    my = yl * s0 - sy
                    d_x = -(ca * mx + cb * my)
                    d_y = -(cc * my + cb * mx)
                    d_rgb = jax.lax.dot_general(
                        w, dldc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    d_invd = jax.lax.dot_general(
                        w, dldi, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    zeros6 = jnp.zeros((CS, NFEAT - 10), jnp.float32)
                    dgrad = jnp.concatenate(
                        [d_x, d_y, d_ca, d_cb, d_cc, d_op, d_rgb, d_invd,
                         zeros6], axis=1)
                    dgrad = jnp.where(vmask, dgrad, 0.0)
                    if floor:
                        dgrad = jnp.where(vmask, f, 0.0)

                    pending = jnp.where(slot == 0, wk0, wk1)

                    @pl.when(pending >= 0)
                    def _():
                        wr_dma(slot, pending).wait()
                    dbuf_wr[slot] = dbuf_rd[slot] + dgrad.T
                    wr_dma(slot, k).start()
                    wk0 = jnp.where(slot == 0, k, wk0)
                    wk1 = jnp.where(slot == 1, k, wk1)
                    # suffix[0] + wc[0] == full column sum of wc
                    return (suffix[0:1] + wc[0:1] + s_carry, wk0, wk1)

                _, wk0_f, wk1_f = jax.lax.fori_loop(
                    0, kproc, body2,
                    (jnp.zeros((1, PIX), jnp.float32),
                     jnp.int32(-1), jnp.int32(-1)))
                for slot, wkf in ((0, wk0_f), (1, wk1_f)):
                    @pl.when(wkf >= 0)
                    def _(slot=slot, wkf=wkf):
                        wr_dma(slot, wkf).wait()
        return kern

    def run_bwd(mode, tbp, feats_a, st, en, out_fwd, ustore, dout):
        t_pad = -(-T // tbp) * tbp
        pad = t_pad - T
        stp = jnp.pad(st, (0, pad))
        enp = jnp.pad(en, (0, pad))
        of = jnp.pad(out_fwd, ((0, pad), (0, 0), (0, 0)))
        us = jnp.pad(ustore, ((0, pad), (0, 0), (0, 0)))
        do = jnp.pad(dout, ((0, pad), (0, 0), (0, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t_pad // tbp,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((tbp, 8, PIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec((tbp, max_chunks, PIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec((tbp, 8, PIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, NFEAT, CS), jnp.float32),
                pltpu.VMEM((2, NFEAT, CS), jnp.float32),
                pltpu.VMEM((2, NFEAT, CS), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        zeros = jnp.zeros_like(feats_a)
        return pl.pallas_call(
            make_bwd(mode, tbp), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(feats_a.shape, jnp.float32),
            input_output_aliases={7: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(stp, enp, rowp, feats_a, of, us, do, zeros)

    # residuals from the real forward (grad path shape)
    out, res = _raster_tiles_fwd(feats, starts, ends, rowp, statics,
                                 save_ustore=True)
    _, _, _, _, out_fwd, ustore = res
    rng2 = np.random.default_rng(1)
    dout = jnp.asarray(rng2.uniform(-1, 1, (T, 8, PIX)).astype(np.float32))

    # V0 reference dfeats via the real bwd
    d0 = _raster_tiles_bwd(statics, res, dout)[0]
    d0 = jax.block_until_ready(d0)
    scale = float(jnp.max(jnp.abs(d0)))
    for mode, tbp in (("trim", 4), ("cumprod", 4), ("trim", 8)):
        dv = run_bwd(mode, tbp, feats, starts, ends, out_fwd, ustore, dout)
        err = float(jnp.max(jnp.abs(dv - d0)))
        print(f"parity {mode}/tbp{tbp}: max|d-d0|={err:.3e} scale={scale:.3e}",
              flush=True)

    # ---- timing: isolated bwd, residuals as jit args -----------------
    def p_bwd(mode, tbp):
        def f(s, ff, st, en, of, us, do):
            dv = run_bwd(mode, tbp, ff, st, en, of, us, do + s * 1e-30)
            return s + 1 + jnp.sum(dv) * 1e-30
        return f

    def p_bwd_real(s, ff, st, en, rp, of, us, do):
        dv = _raster_tiles_bwd(
            statics, (ff, st, en, rp, of, us), do + s * 1e-30)[0]
        return s + 1 + jnp.sum(dv) * 1e-30

    args = (feats, starts, ends, out_fwd, ustore, dout)
    slope(p_bwd_real, (feats, starts, ends, rowp, out_fwd, ustore, dout),
          "bwd V0 baseline (real)")
    slope(p_bwd("trim", 4), args, "bwd V1 trim tbp4")
    slope(p_bwd("cumprod", 4), args, "bwd V2 trim+cumprod tbp4")
    slope(p_bwd("trim", 8), args, "bwd V3 trim tbp8")
    slope(p_bwd("floor", 4), args, "bwd V5 floor (DMA+loop)")

    # context: the full fwd+bwd chain through the custom VJP
    from gs_tpu.ops.rasterize_pallas import _raster_tiles

    def p_kfb(s, f, st, en):
        def l(ff):
            o = _raster_tiles(ff, st, en, rowp, statics)
            return jnp.sum(o * o)
        v, g = jax.value_and_grad(l)(f + s * 1e-30)
        return s + 1 + (v + jnp.sum(g)) * 1e-30

    slope(p_kfb, (feats, starts, ends), "real kernel fwd+bwd chain")


if __name__ == "__main__":
    main()
