"""Round-5b: SLAB-DMA kernel variants.

perf_r5a found the bwd kernel is DMA/loop-ORCHESTRATION-bound, not
compute-bound: a no-math floor (identical DMA/RMW/loop structure) costs
41 ms of the 62.5 ms baseline, and op-trimming/cumprod/tbp8 are all
neutral. Per-chunk cost is ~5 semaphore ops + 3 DMA issues; the fix is
FEWER, BIGGER DMAs: slab granularity (SL=4 chunks = 512 entries = 32 KB
per DMA), with an inner static 4-subchunk compute loop.

  * compute stays [CS=128, PIX] per subchunk (CS=256 measured slower in
    r4 from partial-chunk waste; subchunks keep 128-granularity masking)
  * per-subchunk guards use pl.when; the suffix carry moves to a VMEM
    scratch row and the pending-write slab ids to SMEM so guarded
    subchunks can update them (fori carries can't cross pl.when)
  * unprocessed subchunks of a slab write back the read value (RMW slab
    copy) so shared-boundary accumulation stays exact
  * feats/dfeats gain a 512-entry tail pad: the top slab over-reads past
    the last chunk (finite zeros, masked to zero contribution)

Variants: fwd slab, bwd slab; parity vs the real kernels on-chip, then
endpoint-min slope timing.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = 3072000
SL = 4          # chunks per slab
PAD = SL * 128  # tail pad


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
        CS, NFEAT, _Statics, _moment_matrix, _pixel_rows,
        _raster_tiles_bwd, _raster_tiles_fwd, _tri_matrices, _entry_mask)
    from gs_tpu.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS

    W, H, TX, TY = 1920, 1080, 16, 16
    gx, gy = W // TX, -(-H // TY)
    T = gx * gy
    mpt = 1024
    max_chunks = -(-(max(mpt // CS, 1) + 1) // 8) * 8
    PIX = TX * TY
    SLE = SL * CS

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
    featsp = jnp.pad(feats, ((0, 0), (0, PAD)))
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

    def slab_dma(arr_hbm, buf, sem, base, s, slot):
        return pltpu.make_async_copy(
            arr_hbm.at[:, pl.ds(pl.multiple_of(base + s * SLE, CS), SLE)],
            buf.at[slot], sem.at[slot])

    # ------------------------- fwd slab kernel -------------------------
    def make_fwd(tbp):
        def kern(ts_ref, te_ref, rowp_ref, feats_hbm, out_ref, ustore_ref,
                 fbuf, sem):
            l_incl, _ = _tri_matrices(CS)
            for tb in range(tbp):
                t = pl.program_id(0) * tbp + tb
                start = ts_ref[t]
                end = te_ref[t]
                base = pl.multiple_of((start // CS) * CS, CS)
                nchunks = jnp.minimum(pl.cdiv(end - base, CS), max_chunks)
                nslabs = pl.cdiv(nchunks, SL)
                px, py = _pixel_rows(t, gx, TX, TY, PIX,
                                     rowp_ref[0] + (t // gx))
                out_ref[tb] = jnp.zeros((8, PIX), jnp.float32)
                out_ref[tb, 4:5] = jnp.ones((1, PIX), jnp.float32)
                out_ref[tb, 5:6] = jnp.ones((1, PIX), jnp.float32)

                @pl.when(nslabs > 0)
                def _(base=base):
                    slab_dma(feats_hbm, fbuf, sem, base, 0, 0).start()

                def body(s, carry, tb=tb, base=base, nchunks=nchunks,
                         nslabs=nslabs, start=start, end=end, px=px, py=py):
                    umax, kproc = carry
                    slot = jax.lax.rem(s, 2)

                    @pl.when(s + 1 < nslabs)
                    def _():
                        slab_dma(feats_hbm, fbuf, sem, base, s + 1,
                                 1 - slot).start()
                    slab_dma(feats_hbm, fbuf, sem, base, s, slot).wait()
                    for i in range(SL):
                        k = s * SL + i
                        active = (umax >= T_EPS) & (k < nchunks)

                        @pl.when(active)
                        def _(k=k, i=i):
                            f = fbuf[slot][:, i * CS:(i + 1) * CS].T
                            vmask = _entry_mask(base, k, start, end)
                            x = f[:, 0:1]
                            y = f[:, 1:2]
                            ca = f[:, 2:3]
                            cb = f[:, 3:4]
                            cc = f[:, 4:5]
                            op = f[:, 5:6]
                            dx = x - px
                            dy = y - py
                            power = (-0.5 * (ca * dx * dx + cc * dy * dy)
                                     - cb * dx * dy)
                            opg = op * jnp.exp(power)
                            alpha_c = jnp.minimum(ALPHA_MAX, opg)
                            keep = ((power <= 0.0) & (alpha_c >= ALPHA_MIN)
                                    & vmask)
                            alpha = jnp.where(keep, alpha_c, 0.0)
                            lg = jnp.log1p(-alpha)
                            cum = jnp.dot(l_incl, lg,
                                          preferred_element_type=jnp.float32)
                            u_prev = out_ref[tb, 4:5]
                            ustore_ref[tb, pl.ds(k, 1), :] = u_prev
                            u_incl = u_prev * jnp.exp(cum)
                            u_excl = u_incl / (1.0 - alpha)
                            live = (u_incl >= T_EPS).astype(jnp.float32)
                            w = alpha * u_excl * live
                            contrib = jax.lax.dot_general(
                                f[:, 6:10], w, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            out_ref[tb, 0:4] += contrib
                            tmin = jnp.min(
                                jnp.where(live > 0, u_incl, jnp.inf),
                                axis=0, keepdims=True)
                            out_ref[tb, 5:6] = jnp.minimum(
                                out_ref[tb, 5:6], tmin)
                            out_ref[tb, 4:5] = u_incl[CS - 1:CS, :]
                        kproc = jnp.where(active, k + 1, kproc)
                        umax = jnp.max(out_ref[tb, 4:5])
                    return umax, kproc

                _, kproc = jax.lax.fori_loop(
                    0, nslabs, body, (jnp.float32(1.0), jnp.int32(0)))
                out_ref[tb, 6:7] = jnp.full((1, PIX),
                                            kproc.astype(jnp.float32))
        return kern

    def run_fwd(tbp, f, st, en):
        t_pad = -(-T // tbp) * tbp
        stp = jnp.pad(st, (0, t_pad - T))
        enp = jnp.pad(en, (0, t_pad - T))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t_pad // tbp,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=[
                pl.BlockSpec((tbp, 8, PIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.VMEM),
                pl.BlockSpec((tbp, max_chunks, PIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, NFEAT, SLE), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )
        out, ustore = pl.pallas_call(
            make_fwd(tbp), grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((t_pad, 8, PIX), jnp.float32),
                       jax.ShapeDtypeStruct((t_pad, max_chunks, PIX),
                                            jnp.float32)],
        )(stp, enp, rowp, f)
        return out[:T], ustore[:T]

    # ------------------------- bwd slab kernel -------------------------
    def make_bwd(tbp):
        def kern(ts_ref, te_ref, rowp_ref, feats_hbm, out_fwd_ref,
                 ustore_ref, dout_ref, zeros_hbm, dfeats_hbm,
                 fbuf, dbuf_rd, dbuf_wr, scar, wk, sem_in, sem_rd, sem_wr):
            del zeros_hbm
            l_incl, s_upper = _tri_matrices(CS)
            moments = _moment_matrix(TX, PIX)
            for tb in range(tbp):
                t = pl.program_id(0) * tbp + tb
                start = ts_ref[t]
                end = te_ref[t]
                base = pl.multiple_of((start // CS) * CS, CS)
                px, py = _pixel_rows(t, gx, TX, TY, PIX,
                                     (t // gx) + rowp_ref[0])
                ox = (t % gx).astype(jnp.float32) * TX
                oy = ((t // gx) + rowp_ref[0]).astype(jnp.float32) * TY
                dldc = dout_ref[tb, 0:3]
                dldi = dout_ref[tb, 3:4]
                dldt = dout_ref[tb, 5:6]
                tmin = out_fwd_ref[tb, 5:6]
                dt_tmin = dldt * tmin
                kproc = out_fwd_ref[tb, 6, 0].astype(jnp.int32)
                nslabs = pl.cdiv(kproc, SL)
                scar[...] = jnp.zeros((1, PIX), jnp.float32)
                wk[0] = -1
                wk[1] = -1

                @pl.when(nslabs > 0)
                def _(nslabs=nslabs, base=base):
                    slab_dma(feats_hbm, fbuf, sem_in, base,
                             nslabs - 1, 0).start()
                    slab_dma(dfeats_hbm, dbuf_rd, sem_rd, base,
                             nslabs - 1, 0).start()

                def body(j, carry, kproc=kproc, nslabs=nslabs, base=base,
                         start=start, end=end, px=px, py=py, ox=ox, oy=oy,
                         dldc=dldc, dldi=dldi, dt_tmin=dt_tmin, tb=tb):
                    s = nslabs - 1 - j
                    slot = jax.lax.rem(j, 2)

                    @pl.when(j + 1 < nslabs)
                    def _():
                        slab_dma(feats_hbm, fbuf, sem_in, base, s - 1,
                                 1 - slot).start()
                        slab_dma(dfeats_hbm, dbuf_rd, sem_rd, base, s - 1,
                                 1 - slot).start()
                    slab_dma(feats_hbm, fbuf, sem_in, base, s, slot).wait()
                    slab_dma(dfeats_hbm, dbuf_rd, sem_rd, base, s,
                             slot).wait()

                    @pl.when(wk[slot] >= 0)
                    def _():
                        pltpu.make_async_copy(
                            dbuf_wr.at[slot],
                            dfeats_hbm.at[:, pl.ds(pl.multiple_of(
                                base + wk[slot] * SLE, CS), SLE)],
                            sem_wr.at[slot]).wait()
                    dbuf_wr[slot] = dbuf_rd[slot]
                    for i in range(SL - 1, -1, -1):
                        k = s * SL + i

                        @pl.when(k < kproc)
                        def _(k=k, i=i):
                            f = fbuf[slot][:, i * CS:(i + 1) * CS].T
                            vmask = _entry_mask(base, k, start, end)
                            x = f[:, 0:1]
                            y = f[:, 1:2]
                            ca = f[:, 2:3]
                            cb = f[:, 3:4]
                            cc = f[:, 4:5]
                            op = f[:, 5:6]
                            dxp = x - px
                            dyp = y - py
                            power = (-0.5 * (ca * dxp * dxp
                                             + cc * dyp * dyp)
                                     - cb * dxp * dyp)
                            g = jnp.exp(power)
                            opg = op * g
                            alpha_c = jnp.minimum(ALPHA_MAX, opg)
                            keep = ((power <= 0.0) & (alpha_c >= ALPHA_MIN)
                                    & vmask)
                            alpha = jnp.where(keep, alpha_c, 0.0)
                            opg_g = jnp.where(keep & (opg < ALPHA_MAX),
                                              opg, 0.0)
                            lg = jnp.log1p(-alpha)
                            cum = jnp.dot(l_incl, lg,
                                          preferred_element_type=jnp.float32)
                            u_prev = ustore_ref[tb, pl.ds(k, 1), :]
                            u_incl = u_prev * jnp.exp(cum)
                            inv1ma = 1.0 / (1.0 - alpha)
                            live = (u_incl >= T_EPS).astype(jnp.float32)
                            ul = u_incl * inv1ma * live
                            w = alpha * ul
                            cdot = jax.lax.dot_general(
                                f[:, 6:9], dldc, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            cdot = cdot + f[:, 9:10] * dldi
                            wc = w * cdot
                            suffix = jnp.dot(
                                s_upper, wc,
                                preferred_element_type=jnp.float32)
                            s_total = suffix + scar[...]
                            dalpha = (cdot * ul
                                      - (s_total + dt_tmin * live) * inv1ma)
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
                            d_op = jnp.where(
                                op > 0.0,
                                s0 / jnp.where(op > 0.0, op, 1.0), 0.0)
                            d_ca = -0.5 * (xl * xl * s0 - 2.0 * xl * sx
                                           + sxx)
                            d_cb = -(xl * yl * s0 - xl * sy - yl * sx + sxy)
                            d_cc = -0.5 * (yl * yl * s0 - 2.0 * yl * sy
                                           + syy)
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
                                [d_x, d_y, d_ca, d_cb, d_cc, d_op, d_rgb,
                                 d_invd, zeros6], axis=1)
                            dgrad = jnp.where(vmask, dgrad, 0.0)
                            dbuf_wr[slot, :, i * CS:(i + 1) * CS] = (
                                dbuf_wr[slot][:, i * CS:(i + 1) * CS]
                                + dgrad.T)
                            scar[...] = suffix[0:1] + wc[0:1] + scar[...]
                    pltpu.make_async_copy(
                        dbuf_wr.at[slot],
                        dfeats_hbm.at[:, pl.ds(pl.multiple_of(
                            base + s * SLE, CS), SLE)],
                        sem_wr.at[slot]).start()
                    wk[slot] = s
                    return carry

                jax.lax.fori_loop(0, nslabs, body, jnp.int32(0))
                for slot in (0, 1):
                    @pl.when(wk[slot] >= 0)
                    def _(slot=slot, base=base):
                        pltpu.make_async_copy(
                            dbuf_wr.at[slot],
                            dfeats_hbm.at[:, pl.ds(pl.multiple_of(
                                base + wk[slot] * SLE, CS), SLE)],
                            sem_wr.at[slot]).wait()
        return kern

    def run_bwd(tbp, feats_a, st, en, out_fwd, ustore, dout):
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
                pltpu.VMEM((2, NFEAT, SLE), jnp.float32),
                pltpu.VMEM((2, NFEAT, SLE), jnp.float32),
                pltpu.VMEM((2, NFEAT, SLE), jnp.float32),
                pltpu.VMEM((1, PIX), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        zeros = jnp.zeros_like(feats_a)
        return pl.pallas_call(
            make_bwd(tbp), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(feats_a.shape, jnp.float32),
            input_output_aliases={7: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(stp, enp, rowp, feats_a, of, us, do, zeros)

    # residuals from the real forward
    out0, res = _raster_tiles_fwd(feats, starts, ends, rowp, statics,
                                  save_ustore=True)
    _, _, _, _, out_fwd, ustore = res
    rng2 = np.random.default_rng(1)
    dout = jnp.asarray(rng2.uniform(-1, 1, (T, 8, PIX)).astype(np.float32))
    d0 = _raster_tiles_bwd(statics, res, dout)[0]
    d0 = jax.block_until_ready(d0)

    # fwd slab parity
    outs, ustores = jax.jit(functools.partial(run_fwd, 4))(
        featsp, starts, ends)
    err = float(jnp.max(jnp.abs(outs - out0)))
    print(f"fwd slab parity: max|out-out0|={err:.3e} "
          f"scale={float(jnp.max(jnp.abs(out0))):.3e}", flush=True)

    # bwd slab parity (on the real fwd's residuals, padded feats)
    dv = run_bwd(4, featsp, starts, ends, out_fwd, ustore, dout)[:, :D]
    errb = float(jnp.max(jnp.abs(dv - d0)))
    print(f"bwd slab parity: max|d-d0|={errb:.3e} "
          f"scale={float(jnp.max(jnp.abs(d0))):.3e}", flush=True)

    # ---- timing ----
    def p_fwd_slab(s, ff, st, en):
        o, _ = run_fwd(4, ff + s * 1e-30, st, en)
        return s + 1 + jnp.sum(o) * 1e-30

    def p_fwd_real(s, ff, st, en):
        o, _ = _raster_tiles_fwd(ff + s * 1e-30, st, en, rowp, statics,
                                 save_ustore=True)
        return s + 1 + jnp.sum(o) * 1e-30

    def p_bwd_slab(s, ff, st, en, of, us, do):
        dvv = run_bwd(4, ff, st, en, of, us, do + s * 1e-30)
        return s + 1 + jnp.sum(dvv) * 1e-30

    def p_bwd_real(s, ff, st, en, rp, of, us, do):
        dvv = _raster_tiles_bwd(
            statics, (ff, st, en, rp, of, us), do + s * 1e-30)[0]
        return s + 1 + jnp.sum(dvv) * 1e-30

    slope(p_fwd_real, (feats, starts, ends), "fwd real (w/ustore)")
    slope(p_fwd_slab, (featsp, starts, ends), "fwd SLAB")
    slope(p_bwd_real, (feats, starts, ends, rowp, out_fwd, ustore, dout),
          "bwd real")
    slope(p_bwd_slab, (featsp, starts, ends, out_fwd, ustore, dout),
          "bwd SLAB")


if __name__ == "__main__":
    main()
