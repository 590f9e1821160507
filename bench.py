"""Benchmark: fwd+bwd rasterization throughput at 1080p on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}
where detail carries the per-stage breakdown and an MFU estimate.

Baseline derivation (BASELINE.md): the reference's accelerated CUDA rasterizer
trains an average scene (~1.1 Mpx images) in 27 min / 30k iterations on an
A6000 => ~18.5 it/s * 1.3 Mpx ~= 2.4e7 pixels/s forward+backward. vs_baseline
is our measured pixels/s divided by that.

Timing is slope-based with a host fetch per run: on the axon TPU tunnel,
``block_until_ready`` does not actually synchronize, and repeated identical
calls can be served from a cache — chaining each iteration's input on the
previous output and fetching a scalar forces real execution.
"""
import json
import math
import os
import time

import numpy as np

BASELINE_PIXELS_PER_S = 2.4e7
WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 500_000
CS = 128            # kernel chunk size (ops/rasterize_pallas.CS)
PEAK_BF16_FLOPS = 197e12   # v5e MXU peak; MFU is reported on this basis


def build_scene():
    import jax.numpy as jnp
    from gs_tpu.models.gaussian_model import create_from_pcd

    rng = np.random.default_rng(0)
    # box of small gaussians in front of the camera — tuned to realistic
    # trained-scene stats (~10-40 splats blended per pixel at 1080p)
    pts = np.concatenate([
        rng.uniform(-3.5, 3.5, (N_GAUSS, 1)),
        rng.uniform(-2.0, 2.0, (N_GAUSS, 1)),
        rng.uniform(2.5, 9.0, (N_GAUSS, 1)),
    ], axis=1)
    cols = rng.uniform(0, 1, (N_GAUSS, 3))
    params, alive = create_from_pcd(pts, cols, sh_degree=3,
                                    capacity=1 << 19)
    # create_from_pcd's 3-NN init makes splats tile the volume wall-to-wall;
    # trained scenes have much smaller splats relative to spacing — shrink so
    # per-pixel overdraw lands in the realistic 10-40 range
    params = params._replace(log_scale=params.log_scale + math.log(0.3))
    return params, alive


def _slope(f, x0, fetch, k1=1, k2=5):
    """Chained slope timing; f: x -> x, fetch: x -> host scalar."""
    fetch(f(x0))  # compile + run once
    def run(k):
        x = x0
        for _ in range(k):
            x = f(x)
        return fetch(x)
    t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
    return (t2 - t1) / (k2 - k1)


def main():
    import jax
    import jax.numpy as jnp
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.core.project import preprocess
    from gs_tpu.ops.binning import bin_gaussians_payload
    from gs_tpu.ops.rasterize_jnp import pack_projected
    from gs_tpu.render import render

    params, alive = build_scene()
    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    # ---- probe pass: actual duplicate count sizes the static buffers ------
    probe_kwargs = dict(active_sh_degree=3, backend="pallas", alive=alive,
                        dup_capacity=1 << 22, max_per_tile=8192, chunk=64)
    chk = jax.jit(lambda p: render(cam, p, bg, **probe_kwargs))(params)
    ov = bool(chk.overflow)
    nd = int(chk.num_duplicates)
    ml = int(chk.max_tile_len)
    if ov:
        print(json.dumps({"metric": "pixels_per_s_fwd_bwd_1080p", "value": 0,
                          "unit": "pixels/s", "vs_baseline": 0,
                          "error": f"binning overflow dups={nd} maxtile={ml}"}))
        return
    if ml == 0 and nd > 0:
        # scalar stat occasionally reads back 0 through the axon tunnel;
        # re-fetch, then fall back to a safe bound rather than truncating
        ml = int(np.asarray(chk.max_tile_len))
        if ml == 0:
            ml = 2048
    dup_capacity = max(((int(nd * 1.15) + 127) // 128) * 128, 1 << 20)
    max_per_tile = max(((int(ml * 1.3) + 127) // 128) * 128, 1024)
    if os.environ.get("GS_BENCH_CAP"):
        dup_capacity = int(os.environ["GS_BENCH_CAP"])
    if os.environ.get("GS_BENCH_MPT"):
        max_per_tile = int(os.environ["GS_BENCH_MPT"])
    kwargs = dict(active_sh_degree=3, backend="pallas", alive=alive,
                  dup_capacity=dup_capacity, max_per_tile=max_per_tile,
                  chunk=64)

    # ---- headline: full fwd+bwd step --------------------------------------
    # SCAN_STEPS iterations run inside ONE dispatch (exactly how on-TPU
    # training runs: --block_scan batches schedule-aligned step blocks into
    # one lax.scan). Dispatching single steps through the axon tunnel adds
    # ~100 ms of per-dispatch latency that production never pays.
    SCAN_STEPS = 4

    def loss_fn(p):
        out = render(cam, p, bg, **kwargs)
        return jnp.mean(jnp.abs(out.image - gt))

    @jax.jit
    def step_block(p):
        def body(pp, _):
            g = jax.grad(loss_fn)(pp)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, pp, g), 0.0
        p2, _ = jax.lax.scan(body, p, None, length=SCAN_STEPS)
        return p2

    fetch_p = lambda p: float(p.xyz[0, 0])
    # tunnel noise is strictly additive (±30% run-to-run band): the minimum
    # of repeated slope measurements is the closest to true device time
    dt = min(_slope(step_block, params, fetch_p, k1=2, k2=6)
             for _ in range(3)) / SCAN_STEPS

    # ---- per-stage probes (slope-timed, chained through a carried scalar) -
    def stage(fn):
        f = jax.jit(fn)
        return _slope(f, np.float32(0.0), float)

    # full-sum returns: element-sliced outputs let XLA DCE whole
    # elementwise/gather pipelines and under-measure (CLAUDE.md rule 3)
    def prep_fn(s):
        p = params._replace(xyz=params.xyz + s * 1e-30)
        proj = preprocess(p, cam, active_sh_degree=3, alive=alive)
        return s + 1 + jnp.sum(pack_projected(proj)) * 1e-30

    def binning_fn(s):
        p = params._replace(xyz=params.xyz + s * 1e-30)
        proj = preprocess(p, cam, active_sh_degree=3, alive=alive)
        pk = pack_projected(proj)
        bins, cols = bin_gaussians_payload(proj, pk, WIDTH, HEIGHT, 16, 16,
                                           dup_capacity)
        return s + 1 + (jnp.sum(cols[0])
                        + jnp.sum(bins.tile_start).astype(jnp.float32)) * 1e-30

    def fwd_fn(s):
        p = params._replace(xyz=params.xyz + s * 1e-30)
        out = render(cam, p, bg, **kwargs)
        return s + 1 + jnp.sum(out.image) * 1e-30

    t_prep = stage(prep_fn)
    t_bin = stage(binning_fn)          # includes prep (composed honestly)
    t_fwd = stage(fwd_fn)
    stages = {
        "preprocess_ms": round(t_prep * 1e3, 1),
        "prep_binning_ms": round(t_bin * 1e3, 1),
        "fwd_total_ms": round(t_fwd * 1e3, 1),
        "kernel_residual_ms": round(max(t_fwd - t_bin, 0.0) * 1e3, 1),
        "bwd_total_ms": round(max(dt - t_fwd, 0.0) * 1e3, 1),
        "step_ms": round(dt * 1e3, 1),
    }

    # ---- MFU model (MXU flops of the compositing math) --------------------
    # fwd per chunk: triangular-cumsum matmul [CS,CS]x[CS,PIX] + feature
    # contraction [4,CS]x[CS,PIX]; bwd: 2 triangular matmuls + cdot [CS,3]x
    # [3,PIX] + d_rgb/d_invd [CS,PIX]x[PIX,4]. PIX=256.
    pix = 256
    num_tiles = (WIDTH // 16) * math.ceil(HEIGHT / 16)
    chunks = nd / CS + num_tiles        # partial chunk per tile
    fwd_flops = chunks * (2 * CS * CS * pix + 2 * 4 * CS * pix)
    bwd_flops = chunks * (2 * 2 * CS * CS * pix + 2 * 3 * CS * pix
                          + 2 * 4 * CS * pix)
    mfu = (fwd_flops + bwd_flops) / (dt * PEAK_BF16_FLOPS)

    pixels_per_s = WIDTH * HEIGHT / dt
    print(json.dumps({
        "metric": "pixels_per_s_fwd_bwd_1080p",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
        "detail": {"sec_per_fwd_bwd": round(dt, 4), "n_gaussians": N_GAUSS,
                   "duplicates": nd, "max_tile_len": ml,
                   "dup_capacity": dup_capacity, "max_per_tile": max_per_tile,
                   "stages": stages,
                   "mfu_bf16_basis": round(mfu, 4),
                   "kernel_gflops_per_step": round(
                       (fwd_flops + bwd_flops) / 1e9, 1),
                   "device": str(jax.devices()[0]).replace(" ", "_")},
    }))


if __name__ == "__main__":
    main()
