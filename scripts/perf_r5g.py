"""Round-5g: LAYOUT-shuffle attribution on the pend-v2 bwd.

r5f: removing ALL matmuls saved only 4.4 ms (59.5 -> 55.1); op trimming
and cumprod neutral/worse. The one cost present in every math variant
but absent from the 12.9 ms no-math floor is LAYOUT WORK: the per-chunk
fbuf .T transpose, ten [CS,1] lane-column extracts, [CS,1] -> [CS,PIX]
lane-broadcast operands, the 10-piece [CS,1] concat and the output .T.
Timing-only variants isolate it:

  inwr   — the no-math floor again (reference, ~12.9)
  layout — floor + the transposes/extracts/concat ONLY (no arithmetic
           to speak of): f.T, 10 column extracts, concat, mask, .T out
  bcast  — layout + ~10 [CS,1]x[1,PIX] broadcast multiplies and one exp
           (the alpha-chain shape) but still no matmuls/ustore
  full   — r5c pend kernel (baseline)
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
        CS, NFEAT, _Statics, _chunk_alpha, _chunk_dma, _entry_mask,
        _moment_matrix, _pixel_rows, _raster_tiles_bwd, _raster_tiles_fwd,
        _tri_matrices)
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

    NSL = 3  # in-ring slots for full3

    def make_bwd(tbp, mode):
        do_in = True
        do_wr = True
        do_math = mode == "full"
        nomxu = False
        merged = False
        depth = 1
        nslot = 2

        def kern(ts_ref, te_ref, rowp_ref, feats_hbm, out_fwd_ref,
                 ustore_ref, dout_ref, zeros_hbm, dfeats_hbm,
                 hbuf, fbuf, wrbuf, pbuf, scar, st, hsem, sem_in,
                 sem_wr, sem_pf):
            del zeros_hbm
            l_incl, s_upper = _tri_matrices(CS)
            moments = _moment_matrix(TX, PIX)
            pid = pl.program_id(0)

            @pl.when(pid == 0)
            def _():
                for i in range(6):
                    st[i] = -1
                st[1] = 0

            def chunk_addr(c):
                return pl.multiple_of(c * CS, CS)

            def wr_start(buf, slot, sem, c):
                return pltpu.make_async_copy(
                    buf.at[slot], dfeats_hbm.at[:, pl.ds(chunk_addr(c), CS)],
                    sem.at[slot])

            kprocs = []
            metas = []
            for tb in range(tbp):
                t = pid * tbp + tb
                start = ts_ref[t]
                end = te_ref[t]
                base = pl.multiple_of((start // CS) * CS, CS)
                kproc = out_fwd_ref[tb, 6, 0].astype(jnp.int32)
                kprocs.append(kproc)
                metas.append((t, start, end, base))
                if do_in:
                    @pl.when(kproc > 0)
                    def _(base=base, kproc=kproc, tb=tb):
                        pltpu.make_async_copy(
                            feats_hbm.at[:, pl.ds(pl.multiple_of(
                                base + (kproc - 1) * CS, CS), CS)],
                            hbuf.at[tb], hsem.at[tb]).start()

            for tb in range(tbp):
                t, start, end, base = metas[tb]
                kproc = kprocs[tb]
                cb = base // CS
                c_top = cb + kproc - 1
                px, py = _pixel_rows(t, gx, TX, TY, PIX,
                                     (t // gx) + rowp_ref[0])
                ox = (t % gx).astype(jnp.float32) * TX
                oy = ((t // gx) + rowp_ref[0]).astype(jnp.float32) * TY
                dldc = dout_ref[tb, 0:3]
                dldi = dout_ref[tb, 3:4]
                dldt = dout_ref[tb, 5:6]
                tmin = out_fwd_ref[tb, 5:6]
                dld4 = jnp.concatenate([dldc, dldi], axis=0)   # [4, PIX]

                def compute(k, f, tb=tb, start=start, end=end, base=base,
                            px=px, py=py, ox=ox, oy=oy, dldc=dldc,
                            dldi=dldi, dldt=dldt, tmin=tmin,
                            dld4=dld4):
                    if not do_math:
                        if f is None:
                            return None
                        vmask = _entry_mask(base, k, start, end)
                        if mode == "inwr":
                            return jnp.where(vmask, f, 0.0).T
                        cols = [f[:, i:i + 1] for i in range(10)]
                        if mode == "bcast":
                            dx = cols[0] - px
                            dy = cols[1] - py
                            power = (-0.5 * (cols[2] * dx * dx
                                             + cols[4] * dy * dy)
                                     - cols[3] * dx * dy)
                            e = jnp.exp(power)
                            a = cols[5] * e
                            b = a * dx
                            c = a * dy
                            r0 = jnp.max(b + c, axis=1, keepdims=True)
                            cols = [cc_ + r0 * 1e-30 for cc_ in cols]
                        zeros6 = jnp.zeros((CS, NFEAT - 10), jnp.float32)
                        dgrad = jnp.concatenate(cols + [zeros6], axis=1)
                        return jnp.where(vmask, dgrad, 0.0).T
                    vmask = _entry_mask(base, k, start, end)
                    alpha, g, opg, dx, dy, gate = _chunk_alpha(
                        f, vmask, px, py)
                    lg = jnp.log1p(-alpha)
                    u_prev = ustore_ref[tb, pl.ds(k, 1), :]
                    if merged:
                        # cdot first (wc feeds the shared l_incl matmul)
                        cdot = jax.lax.dot_general(
                            f[:, 6:10], dld4, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    elif nomxu:
                        cdot = f[:, 6:7] + dldc[0:1] + dldi
                    else:
                        cdot = jax.lax.dot_general(
                            f[:, 6:9], dldc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        cdot = cdot + f[:, 9:10] * dldi
                    if merged:
                        cum = jnp.dot(l_incl, lg,
                                      preferred_element_type=jnp.float32)
                        u_incl = u_prev * jnp.exp(cum)
                        inv1ma = 1.0 / (1.0 - alpha)
                        u_excl = u_incl * inv1ma
                        live = (u_incl >= T_EPS).astype(jnp.float32)
                        w = alpha * u_excl * live
                        wc = w * cdot
                        pref = jnp.dot(l_incl, wc,
                                       preferred_element_type=jnp.float32)
                        colsum = pref[CS - 1:CS, :]
                        suffix = colsum - pref
                        s_total = suffix + scar[...]
                        dalpha = (cdot * u_excl * live
                                  - s_total * inv1ma
                                  - dldt * tmin * inv1ma * live)
                        dpower = dalpha * gate * opg
                    else:
                        if nomxu:
                            cum = lg * 1.000001
                        else:
                            cum = jnp.dot(l_incl, lg,
                                          preferred_element_type=jnp.float32)
                        u_incl = u_prev * jnp.exp(cum)
                        inv1ma = 1.0 / (1.0 - alpha)
                        u_excl = u_incl * inv1ma
                        live = (u_incl >= T_EPS).astype(jnp.float32)
                        w = alpha * u_excl * live
                        wc = w * cdot
                        if nomxu:
                            suffix = wc * 1.000001
                        else:
                            suffix = jnp.dot(
                                s_upper, wc,
                                preferred_element_type=jnp.float32)
                        s_total = suffix + scar[...]
                        dalpha = (cdot * u_excl * live
                                  - s_total * inv1ma
                                  - dldt * tmin * inv1ma * live)
                        dpower = dalpha * gate * opg
                    if nomxu:
                        S = dpower[:, 0:6] * 1.000001
                    else:
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
                    op = f[:, 5:6]
                    ca = f[:, 2:3]
                    cb_ = f[:, 3:4]
                    cc = f[:, 4:5]
                    d_op = jnp.where(op > 0.0,
                                     s0 / jnp.where(op > 0.0, op, 1.0), 0.0)
                    d_ca = -0.5 * (xl * xl * s0 - 2.0 * xl * sx + sxx)
                    d_cb = -(xl * yl * s0 - xl * sy - yl * sx + sxy)
                    d_cc = -0.5 * (yl * yl * s0 - 2.0 * yl * sy + syy)
                    mx = xl * s0 - sx
                    my = yl * s0 - sy
                    d_x = -(ca * mx + cb_ * my)
                    d_y = -(cc * my + cb_ * mx)
                    if merged:
                        drgbi = jax.lax.dot_general(
                            w, dld4, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        d_rgb = drgbi[:, 0:3]
                        d_invd = drgbi[:, 3:4]
                    elif nomxu:
                        d_rgb = f[:, 6:9] * 1.000001
                        d_invd = f[:, 9:10] * 1.000001
                    else:
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
                    if merged:
                        scar[...] = colsum + scar[...]
                    else:
                        scar[...] = (jnp.sum(wc, axis=0, keepdims=True)
                                     + scar[...])
                    return dgrad.T

                @pl.when(kproc > 0)
                def _(tb=tb, kproc=kproc, base=base, cb=cb, c_top=c_top,
                      start=start, end=end):
                    scar[...] = jnp.zeros((1, PIX), jnp.float32)
                    old_id = st[0]
                    old_slot = st[1]
                    carry_in = old_id == cb

                    if do_wr:
                        @pl.when(~carry_in & (old_id >= 0))
                        def _():
                            wr_start(pbuf, old_slot, sem_pf, old_id).start()
                            st[4 + old_slot] = old_id

                    if do_in:
                        pltpu.make_async_copy(
                            feats_hbm.at[:, pl.ds(pl.multiple_of(
                                base + (kproc - 1) * CS, CS), CS)],
                            hbuf.at[tb], hsem.at[tb]).wait()
                        for dd in range(1, depth + 1):
                            @pl.when(kproc > dd)
                            def _(dd=dd):
                                _chunk_dma(feats_hbm, fbuf, sem_in, base,
                                           kproc - 1 - dd,
                                           jax.lax.rem(jnp.int32(dd),
                                                       nslot)).start()
                        dg_top = compute(kproc - 1, hbuf[tb].T)
                    else:
                        dg_top = compute(kproc - 1, None)
                        if not do_math and not do_wr:
                            scar[0:1, 0:1] = scar[0:1, 0:1] + 1.0

                    if do_wr:
                        @pl.when(carry_in & (kproc == 1))
                        def _():
                            pbuf[old_slot] += dg_top

                        @pl.when(~(carry_in & (kproc == 1)))
                        def _():
                            new_slot = 1 - old_slot

                            @pl.when(st[4 + new_slot] >= 0)
                            def _():
                                pltpu.make_async_copy(
                                    pbuf.at[new_slot], dfeats_hbm.at[
                                        :, pl.ds(chunk_addr(
                                            st[4 + new_slot]), CS)],
                                    sem_pf.at[new_slot]).wait()
                            st[4 + new_slot] = -1
                            pbuf[new_slot] = dg_top
                            st[0] = c_top
                            st[1] = new_slot

                    def body(j, carry, tb=tb, kproc=kproc, base=base,
                             cb=cb, old_slot=old_slot, carry_in=carry_in):
                        k = kproc - 1 - j
                        slot = jax.lax.rem(j, nslot)
                        if do_in:
                            @pl.when(j + depth < kproc)
                            def _():
                                _chunk_dma(
                                    feats_hbm, fbuf, sem_in, base,
                                    k - depth,
                                    jax.lax.rem(j + depth, nslot)).start()
                            _chunk_dma(feats_hbm, fbuf, sem_in, base, k,
                                       slot).wait()
                            dg = compute(k, fbuf[slot].T)
                        else:
                            dg = compute(k, None)
                            if not do_math and not do_wr:
                                scar[0:1, 0:1] = scar[0:1, 0:1] + 1.0
                        if do_wr:
                            w = jax.lax.rem(j, 2)

                            @pl.when(st[2 + w] >= 0)
                            def _():
                                pltpu.make_async_copy(
                                    wrbuf.at[w], dfeats_hbm.at[
                                        :, pl.ds(chunk_addr(st[2 + w]),
                                                 CS)],
                                    sem_wr.at[w]).wait()
                            wrbuf[w] = dg

                            @pl.when((k == 0) & carry_in)
                            def _():
                                wrbuf[w] = wrbuf[w] + pbuf[old_slot]
                            wr_start(wrbuf, w, sem_wr, cb + k).start()
                            st[2 + w] = cb + k
                        elif do_in:
                            # keep the loaded data alive without writes
                            scar[0:1, 0:1] = (scar[0:1, 0:1]
                                              + fbuf[slot][0:1, 0:1])
                        return carry

                    jax.lax.fori_loop(1, kproc, body, jnp.int32(0))

            if not do_wr:
                # ONE write per program so the loops are not DCE'd (a
                # per-tile sync write would pollute the floor with its own
                # exposed latency)
                wrbuf[0, 0:1, :] = jnp.broadcast_to(scar[0:1, 0:CS], (1, CS))
                cpid = jnp.minimum(pid, jnp.int32(D // CS - 1))
                pltpu.make_async_copy(
                    wrbuf.at[0],
                    dfeats_hbm.at[:, pl.ds(chunk_addr(cpid), CS)],
                    sem_wr.at[0]).start()
                pltpu.make_async_copy(
                    wrbuf.at[0],
                    dfeats_hbm.at[:, pl.ds(chunk_addr(cpid), CS)],
                    sem_wr.at[0]).wait()
            if do_wr:
                for s in (0, 1):
                    @pl.when(st[2 + s] >= 0)
                    def _(s=s):
                        pltpu.make_async_copy(
                            wrbuf.at[s],
                            dfeats_hbm.at[:, pl.ds(chunk_addr(st[2 + s]),
                                                   CS)],
                            sem_wr.at[s]).wait()
                        st[2 + s] = -1

                    @pl.when(st[4 + s] >= 0)
                    def _(s=s):
                        pltpu.make_async_copy(
                            pbuf.at[s],
                            dfeats_hbm.at[:, pl.ds(chunk_addr(st[4 + s]),
                                                   CS)],
                            sem_pf.at[s]).wait()
                        st[4 + s] = -1

                @pl.when(pid == pl.num_programs(0) - 1)
                def _():
                    @pl.when(st[0] >= 0)
                    def _():
                        wr_start(pbuf, st[1], sem_pf, st[0]).start()
                        pltpu.make_async_copy(
                            pbuf.at[st[1]],
                            dfeats_hbm.at[:, pl.ds(chunk_addr(st[0]), CS)],
                            sem_pf.at[st[1]]).wait()
        return kern

    def run_bwd(tbp, mode, feats_a, st_, en, out_fwd, ustore, dout):
        t_pad = -(-T // tbp) * tbp
        pad = t_pad - T
        stp = jnp.pad(st_, (0, pad))
        enp = jnp.pad(en, (0, pad))
        of = jnp.pad(out_fwd, ((0, pad), (0, 0), (0, 0)))
        us = jnp.pad(ustore, ((0, pad), (0, 0), (0, 0)))
        do = jnp.pad(dout, ((0, pad), (0, 0), (0, 0)))
        nslot = 2
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
                pltpu.VMEM((tbp, NFEAT, CS), jnp.float32),   # hbuf
                pltpu.VMEM((nslot, NFEAT, CS), jnp.float32),  # fbuf
                pltpu.VMEM((2, NFEAT, CS), jnp.float32),     # wrbuf
                pltpu.VMEM((2, NFEAT, CS), jnp.float32),     # pbuf
                pltpu.VMEM((1, PIX), jnp.float32),           # scar
                pltpu.SMEM((6,), jnp.int32),                 # st
                pltpu.SemaphoreType.DMA((tbp,)),             # hsem
                pltpu.SemaphoreType.DMA((nslot,)),           # sem_in
                pltpu.SemaphoreType.DMA((2,)),               # sem_wr
                pltpu.SemaphoreType.DMA((2,)),               # sem_pf
            ],
        )
        zeros = jnp.zeros_like(feats_a)
        return pl.pallas_call(
            make_bwd(tbp, mode), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(feats_a.shape, jnp.float32),
            input_output_aliases={7: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(stp, enp, rowp, feats_a, of, us, do, zeros)

    out0, res = _raster_tiles_fwd(feats, starts, ends, rowp, statics,
                                  save_ustore=True)
    _, _, _, _, out_fwd, ustore = res
    rng2 = np.random.default_rng(1)
    dout = jnp.asarray(rng2.uniform(-1, 1, (T, 8, PIX)).astype(np.float32))
    d0 = _raster_tiles_bwd(statics, res, dout)[0]
    d0 = jax.block_until_ready(d0)

    for mode in ("full",):
        dv = run_bwd(4, mode, feats, starts, ends, out_fwd, ustore, dout)
        print(f"parity {mode}: {float(jnp.max(jnp.abs(dv - d0))):.3e}",
              flush=True)

    def p(mode, tbp=4):
        def f(s, ff, st_, en, of, us, do):
            dvv = run_bwd(tbp, mode, ff, st_, en, of, us, do + s * 1e-30)
            return s + 1 + jnp.sum(dvv) * 1e-30
        return f

    args = (feats, starts, ends, out_fwd, ustore, dout)
    slope(p("inwr"), args, "bwd floor inwr (ref)")
    slope(p("layout"), args, "bwd floor +layout shuffles")
    slope(p("bcast"), args, "bwd floor +broadcast chain")
    slope(p("full"), args, "bwd pend full (ref)")


if __name__ == "__main__":
    main()
