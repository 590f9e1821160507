"""Benchmark: fwd+bwd rasterization throughput at 1080p on one chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline",
"detail"} IMMEDIATELY after the first measurement (round-2 lesson: the
driver's wall-clock budget is unknown and the axon tunnel adds 1-4 min of
one-time warmup — everything optional runs after the headline is out).

Scenes:
  uniform    — 500k gaussians tiling a box, ~10-40 splats/pixel (trained-
               scene average density). This is the headline.
  heavy_tail — same far field plus a dense near-camera cluster pushing
               max_tile_len into the thousands (sky/ground tiles of real
               trained scenes); exercises max_chunks loop bounds and early
               termination. Reported in the final combined line's detail.

Cost control:
  * the JAX persistent compilation cache is enabled at .jax_cache/ — a
    warm cache turns every jit here into a <1 s load (verified on axon);
  * no separate probe pass: buffer capacities are fixed known-good values
    (env-overridable), validated by overflow stats carried out of the
    measured step itself;
  * per-stage probes only with GS_BENCH_STAGES=1, extra slope repeats with
    GS_BENCH_REPEATS=n, heavy-tail scene skipped when the elapsed time
    exceeds half of GS_BENCH_BUDGET_S (default 600 s).

Baseline derivation (BASELINE.md): the reference's accelerated CUDA
rasterizer trains an average scene (~1.1 Mpx images) in 27 min / 30k
iterations on an A6000 => ~18.5 it/s * 1.3 Mpx ~= 2.4e7 pixels/s
forward+backward. vs_baseline is our measured pixels/s divided by that.

Timing is slope-based with a host fetch per run: on the axon TPU tunnel,
``block_until_ready`` does not actually synchronize, and repeated identical
calls can be served from a cache — chaining each iteration's input on the
previous output and fetching a scalar forces real execution.
"""
import json
import math
import os
import time

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("GS_BENCH_BUDGET_S", "600"))

import threading

_HEADLINE_OUT = threading.Event()


def _watchdog():
    """Emit SOMETHING parseable before the driver's budget expires.

    Round-2 failure mode: BENCH_r02.json was rc 124 with no output. Round-3
    adds a second hang mode — the axon tunnel being down makes
    ``jax.devices()`` block forever. If the headline hasn't been printed by
    T-minus-30 s, print an error JSON line and hard-exit: an honest zero
    with an error field beats a timeout with nothing to parse."""
    if not _HEADLINE_OUT.wait(timeout=max(BUDGET_S - 30.0, 30.0)):
        print(json.dumps({
            "metric": "pixels_per_s_fwd_bwd_1080p", "value": 0,
            "unit": "pixels/s", "vs_baseline": 0,
            "error": f"no measurement within {BUDGET_S - 30:.0f}s "
                     "(TPU backend unreachable or compile hang)"}),
            flush=True)
        os._exit(2)


# arm only when run as the bench; importing bench as a library (the perf
# probe scripts reuse build_scene/CAPS) must not start a kill timer —
# perf_r4g died to exactly that
if __name__ == "__main__":
    threading.Thread(target=_watchdog, daemon=True).start()

import numpy as np

BASELINE_PIXELS_PER_S = 2.4e7
WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 500_000
if os.environ.get("GS_BENCH_WH"):       # tiny-shape smoke (CPU CI)
    WIDTH, HEIGHT = map(int, os.environ["GS_BENCH_WH"].split("x"))
if os.environ.get("GS_BENCH_N"):
    N_GAUSS = int(os.environ["GS_BENCH_N"])
CS = 128            # kernel chunk size (ops/rasterize_pallas.CS)
PEAK_BF16_FLOPS = 197e12   # v5e MXU peak; MFU is reported on this basis
SCAN_STEPS = int(os.environ.get("GS_BENCH_SCAN_STEPS", "4"))
# steps per dispatch. NOTE the production block dispatch has been "chain"
# (host-chained single-step dispatches) since end-r4 — perf_r5k found the
# 4-step lax.scan block carries a ~50 ms/step while-loop context tax that
# chain dispatch does not pay; see measure_scene for the headline's
# dispatch mode.
# CPU smoke: pallas must run in interpret mode off-TPU
BACKEND = "pallas_interpret" if os.environ.get("GS_BENCH_INTERPRET") else "pallas"

# known-good static buffer sizes for the two scenes (measured; the step
# itself reports overflow so a regression cannot silently truncate).
# Round-4: capacities are TIERED (multiples of 512), not pow2 — every
# D-linear stage (expansion, both big sorts, cumsums, fold) scales with the
# padded capacity, and pow2 rounding was costing ~28% dead entries
# (3.02M real -> 4.19M padded).
CAPS = {
    # the scenes are deterministic (seeded): 3,022,338 / 3,004,846
    # duplicates exactly, every run — 3.072M (512-aligned) is a measured
    # fit with 1.6% headroom, and the step's own overflow flag (asserted
    # into the artifact) guards any regression. Every D-linear stage
    # (expansion, both sorts, the fold) scales with this padding.
    "uniform": (3_072_000, 1024),
    "heavy_tail": (3_072_000, 4096),
}


def _enable_compile_cache():
    import jax
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def build_scene(kind: str = "uniform"):
    import jax.numpy as jnp
    from gs_tpu.models.gaussian_model import create_from_pcd

    rng = np.random.default_rng(0)
    # box of small gaussians in front of the camera — tuned to realistic
    # trained-scene stats (~10-40 splats blended per pixel at 1080p)
    n_far = N_GAUSS if kind == "uniform" else int(N_GAUSS * 0.9)
    pts = [np.concatenate([
        rng.uniform(-3.5, 3.5, (n_far, 1)),
        rng.uniform(-2.0, 2.0, (n_far, 1)),
        rng.uniform(2.5, 9.0, (n_far, 1)),
    ], axis=1)]
    if kind == "heavy_tail":
        # dense cluster near the camera: a few tiles see thousands of entries
        n_c = N_GAUSS - n_far
        pts.append(np.concatenate([
            rng.uniform(-0.25, 0.25, (n_c, 1)),
            rng.uniform(-0.25, 0.25, (n_c, 1)),
            rng.uniform(2.0, 2.6, (n_c, 1)),
        ], axis=1))
    pts = np.concatenate(pts, axis=0)
    cols = rng.uniform(0, 1, (N_GAUSS, 3))
    # a trained scene loads at tight capacity (apps/render.py::params_from_ply
    # pads only to the next 1024); pow2 padding here (2^20 for 500k) was
    # adding ~50 ms/step of dead-slot work to every N-linear stage
    cap = max(1024, -(-int(N_GAUSS * 1.02) // 1024) * 1024)
    params, alive = create_from_pcd(pts, cols, sh_degree=3, capacity=cap)
    # create_from_pcd's 3-NN init makes splats tile the volume wall-to-wall;
    # trained scenes have much smaller splats relative to spacing — shrink so
    # per-pixel overdraw lands in the realistic 10-40 range
    params = params._replace(log_scale=params.log_scale + math.log(0.3))
    return params, alive


def measure_scene(kind: str, repeats: int) -> dict:
    """Compile one production-shaped step block and slope-time it.

    Returns {"dt": sec/step, "nd": duplicates, "ml": max_tile_len,
    "overflow": bool, caps...}. Exactly ONE jit compile per scene.
    """
    import jax
    import jax.numpy as jnp
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.render import render

    params, alive = build_scene(kind)
    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    dup_capacity, max_per_tile = CAPS[kind]
    if os.environ.get("GS_BENCH_CAP"):
        dup_capacity = int(os.environ["GS_BENCH_CAP"])
    if os.environ.get("GS_BENCH_MPT"):
        max_per_tile = int(os.environ["GS_BENCH_MPT"])
    kwargs = dict(active_sh_degree=3, backend=BACKEND, alive=alive,
                  dup_capacity=dup_capacity, max_per_tile=max_per_tile,
                  chunk=64,
                  # validated on-chip r4 and now the product defaults;
                  # set =0 to measure without a lever
                  exact_cull=os.environ.get("GS_BENCH_EXACT_CULL", "1") != "0",
                  pallas_expand=os.environ.get(
                      "GS_BENCH_PALLAS_EXPAND", "1") != "0",
                  pallas_fold=os.environ.get(
                      "GS_BENCH_PALLAS_FOLD", "1") != "0",
                  bf16_features=bool(os.environ.get("GS_BENCH_BF16")))

    def loss_fn(p):
        out = render(cam, p, bg, **kwargs)
        loss = jnp.mean(jnp.abs(out.image - gt))
        return loss, (out.num_duplicates, out.max_tile_len, out.overflow)

    @jax.jit
    def step_block(p):
        def body(pp, _):
            g, aux = jax.grad(loss_fn, has_aux=True)(pp)
            return jax.tree.map(lambda a, b: a - 1e-12 * b, pp, g), aux
        p2, auxs = jax.lax.scan(body, p, None, length=SCAN_STEPS)
        return p2, jax.tree.map(jnp.max, auxs)

    # warmup run absorbs compile (cache-served when warm) + tunnel first-fetch
    p1, stats = step_block(params)
    nd = int(stats[0])
    ml = int(stats[1])
    overflow = bool(stats[2])

    def run(k):
        x = params
        for _ in range(k):
            x, _ = step_block(x)
        return float(x.xyz[0, 0])

    # tunnel noise is strictly additive PER TIMED RUN, which makes
    # min-of-SLOPES biased LOW: noise on the short run's t1 enters the
    # slope (t3 - t1)/2 NEGATIVELY (one hiccup on t1 deflated a slope 27%
    # in r4 — spread [0.101, 0.174, 0.174] on an unchanged binary). The
    # robust estimator takes min over repeats of EACH endpoint separately:
    # both mins converge to the true time from above, so their difference
    # cannot be deflated. Per-repeat slopes are recorded as the spread so
    # round-over-round deltas can be judged against actual variance.
    t1s, t3s = [], []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(3); t3s.append(time.perf_counter() - t0)
    dt = (min(t3s) - min(t1s)) / 2 / SCAN_STEPS
    spread = sorted(round((b - a) / 2 / SCAN_STEPS, 4)
                    for a, b in zip(t1s, t3s))
    return dict(dt=dt, nd=nd, ml=ml, overflow=overflow,
                dup_capacity=dup_capacity, max_per_tile=max_per_tile,
                spread=spread)


def measure_train_step(kind: str, repeats: int) -> dict:
    """GS_BENCH_TRAIN=1: slope-time the REAL production training step — the
    packed-state channel-major layout, L1+SSIM loss, per-group Adam with LR
    schedule, densification-stat accumulation — dispatched exactly as block
    training does (block_dispatch="chain": host-chained single-step gather
    dispatches, ~60 ms/step faster than lax.scan on v5e, perf_r4h.log;
    GS_BENCH_TRAIN_DISPATCH=scan measures the old scan mode). This is the
    number comparable to the reference's it/s (BASELINE.md's 27 min/30k
    includes its full step, not just render+grad)."""
    import jax
    import jax.numpy as jnp
    from gs_tpu.config import (ModelConfig, OptimizationConfig,
                               PipelineConfig, RasterConfig)
    from gs_tpu.core.camera import make_camera, focal2fov, stack_cameras
    from gs_tpu.models.gaussian_model import init_state
    from gs_tpu.models.packed_state import pack_state
    from gs_tpu.train.step import (make_train_step, make_train_step_chain,
                                   make_train_steps_scan)

    params, alive = build_scene(kind)
    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    cams = stack_cameras([cam])
    images = jnp.zeros((1, 3, HEIGHT, WIDTH), jnp.float32)
    zeros1 = jnp.zeros((1,), jnp.float32)

    dup_capacity, max_per_tile = CAPS[kind]
    if os.environ.get("GS_BENCH_CAP"):
        dup_capacity = int(os.environ["GS_BENCH_CAP"])
    if os.environ.get("GS_BENCH_MPT"):
        max_per_tile = int(os.environ["GS_BENCH_MPT"])
    raster = RasterConfig(
        backend=BACKEND, dup_capacity=dup_capacity,
        max_per_tile=max_per_tile, chunk=64,
        exact_cull=os.environ.get("GS_BENCH_EXACT_CULL", "1") != "0",
        pallas_expand=os.environ.get("GS_BENCH_PALLAS_EXPAND", "1") != "0",
        pallas_fold=os.environ.get("GS_BENCH_PALLAS_FOLD", "1") != "0",
        bf16_features=bool(os.environ.get("GS_BENCH_BF16")))
    step = make_train_step(
        OptimizationConfig(iterations=30_000), ModelConfig(),
        PipelineConfig(), raster, cams, spatial_lr_scale=1.0,
        max_sh_degree=3, packed=True)
    state0 = pack_state(init_state(params, alive, num_images=1))

    idxs = jnp.zeros((SCAN_STEPS,), jnp.int32)
    keys = jax.random.split(jax.random.key(0), SCAN_STEPS)
    valid = jnp.ones((SCAN_STEPS,), bool)

    dispatch = os.environ.get("GS_BENCH_TRAIN_DISPATCH", "chain")
    if dispatch == "chain":
        step1 = make_train_step_chain(step, use_alpha=False, use_depth=False)

        def block(s, it):
            for j in range(SCAN_STEPS):
                s, m = step1(s, images, zeros1, zeros1, zeros1, zeros1,
                             jnp.int32(it + 1 + j), idxs[0], keys[j])
            return s, m
    else:
        scan = make_train_steps_scan(step, use_alpha=False, use_depth=False)

        def block(s, it):
            return scan(s, images, zeros1, zeros1, zeros1, zeros1,
                        jnp.int32(it), idxs, keys, valid)

    st, met = block(state0, 0)           # compile + warm
    overflow = bool(met.overflow)

    def run(k):
        s, it = state0, 0
        for _ in range(k):
            s, m = block(s, it)
            it += SCAN_STEPS
        return float(m.loss)

    t1s, t3s = [], []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(3); t3s.append(time.perf_counter() - t0)
    # min of each endpoint separately — see the headline slope's rationale
    dt = (min(t3s) - min(t1s)) / 2 / SCAN_STEPS
    px = WIDTH * HEIGHT / dt
    return {"sec_per_train_step": round(dt, 4),
            "pixels_per_s": round(px, 1),
            "vs_baseline": round(px / BASELINE_PIXELS_PER_S, 4),
            "overflow": overflow, "layout": "packed",
            "dispatch": dispatch}


def measure_render_fps(kind: str, repeats: int) -> dict:
    """GS_BENCH_FPS=1: forward-only novel-view rendering throughput — the
    number behind the reference's ">= 30 fps at 1080p" viewer claim
    (BASELINE.md, README.md:14). No-grad renders skip the transmittance
    checkpoint entirely (rasterize_pallas compiles without it).

    Uses the VIEWER PROFILE: fwd_only (entry gids leave the tile sort —
    they feed only the backward fold), exact_cull + pallas_expand (the
    validated r4 defaults), and bf16 feature streaming (documented ~0.4%
    color quantization, tests/test_pallas.py parity envelope; disable via
    GS_BENCH_FPS_BF16=0 for a strictly-f32 number)."""
    import jax
    import jax.numpy as jnp
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.render import render

    params, alive = build_scene(kind)
    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    dup_capacity, max_per_tile = CAPS[kind]
    bf16 = os.environ.get("GS_BENCH_FPS_BF16", "1") != "0"

    @jax.jit
    def frame(tx):
        # camera jitter rides as a traced translation so every frame is a
        # distinct dispatch (identical calls can be cache-served, CLAUDE.md)
        cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
        out = render(cam, params._replace(xyz=params.xyz + tx * 1e-30),
                     jnp.zeros(3), active_sh_degree=3, backend=BACKEND,
                     alive=alive, dup_capacity=dup_capacity,
                     max_per_tile=max_per_tile, chunk=64,
                     fwd_only=True, exact_cull=True, pallas_expand=True,
                     bf16_features=bf16)
        return jnp.sum(out.image) * 1e-30 + tx + 1

    frame(jnp.float32(0.0))

    def run(k):
        x = jnp.float32(0.0)
        for _ in range(k):
            x = frame(x)
        return float(x)

    # span >= ~0.5 s of frames (a 3-frame slope is smaller than the axon
    # tunnel's RTT variance and measured NEGATIVE once in r4) and min each
    # endpoint separately (additive noise cannot deflate the difference)
    t1s, t13s = [], []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(13); t13s.append(time.perf_counter() - t0)
    dt = (min(t13s) - min(t1s)) / 12
    if dt <= 1e-4:                       # slope lost under tunnel jitter
        return {"fps_1080p": None, "sec_per_frame": None,
                "meets_30fps": None,
                "error": f"non-positive slope {dt:.4f}s — tunnel jitter"}
    return {"fps_1080p": round(1.0 / dt, 2),
            "sec_per_frame": round(dt, 4),
            "meets_30fps": dt <= 1 / 30,
            "profile": ("viewer:fwd_only+exact_cull+pallas_expand"
                        + ("+bf16" if bf16 else ""))}


def headline_dict(m: dict, device: str) -> dict:
    dt = m["dt"]
    pixels_per_s = WIDTH * HEIGHT / dt

    # MFU model (MXU flops of the compositing math): fwd per chunk one
    # triangular-cumsum matmul [CS,CS]x[CS,PIX] + feature contraction
    # [4,CS]x[CS,PIX]; bwd 2 triangular matmuls + cdot + moment contraction.
    pix = 256
    num_tiles = (WIDTH // 16) * math.ceil(HEIGHT / 16)
    chunks = m["nd"] / CS + num_tiles        # partial chunk per tile
    fwd_flops = chunks * (2 * CS * CS * pix + 2 * 4 * CS * pix)
    bwd_flops = chunks * (2 * 2 * CS * CS * pix + 2 * 3 * CS * pix
                          + 2 * 4 * CS * pix)
    mfu = (fwd_flops + bwd_flops) / (dt * PEAK_BF16_FLOPS)
    return {
        "metric": "pixels_per_s_fwd_bwd_1080p",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
        "detail": {"sec_per_fwd_bwd": round(dt, 4), "n_gaussians": N_GAUSS,
                   "spread": m.get("spread"),
                   "duplicates": m["nd"], "max_tile_len": m["ml"],
                   "dup_capacity": m["dup_capacity"],
                   "max_per_tile": m["max_per_tile"],
                   "mfu_bf16_basis": round(mfu, 4),
                   "kernel_gflops_per_step": round(
                       (fwd_flops + bwd_flops) / 1e9, 1),
                   "device": device},
    }


def stage_probes(params, alive, dup_capacity, max_per_tile, dt) -> dict:
    """Per-stage slope probes (3 extra compiles) — GS_BENCH_STAGES=1 only."""
    import jax
    import jax.numpy as jnp
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.core.project import preprocess
    from gs_tpu.ops.binning import bin_gaussians_payload
    from gs_tpu.ops.rasterize_jnp import pack_projected
    from gs_tpu.render import render

    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    bg = jnp.zeros(3)
    kwargs = dict(active_sh_degree=3, backend=BACKEND, alive=alive,
                  dup_capacity=dup_capacity, max_per_tile=max_per_tile,
                  chunk=64)

    def _slope(f):
        jf = jax.jit(f)
        float(jf(np.float32(0.0)))
        def run(k):
            x = np.float32(0.0)
            for _ in range(k):
                x = jf(x)
            return float(x)
        t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(3); t2 = time.perf_counter() - t0
        return (t2 - t1) / 2

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

    t_prep = _slope(prep_fn)
    t_bin = _slope(binning_fn)          # includes prep (composed honestly)
    t_fwd = _slope(fwd_fn)
    return {
        "preprocess_ms": round(t_prep * 1e3, 1),
        "prep_binning_ms": round(t_bin * 1e3, 1),
        "fwd_total_ms": round(t_fwd * 1e3, 1),
        "kernel_residual_ms": round(max(t_fwd - t_bin, 0.0) * 1e3, 1),
        "bwd_total_ms": round(max(dt - t_fwd, 0.0) * 1e3, 1),
        "step_ms": round(dt * 1e3, 1),
    }


def main():
    _enable_compile_cache()
    import jax

    repeats = int(os.environ.get("GS_BENCH_REPEATS", "3"))
    device = str(jax.devices()[0]).replace(" ", "_")

    # ---- headline first, everything else after --------------------------
    m = measure_scene("uniform", repeats)
    if m["overflow"]:
        print(json.dumps({"metric": "pixels_per_s_fwd_bwd_1080p", "value": 0,
                          "unit": "pixels/s", "vs_baseline": 0,
                          "error": f"binning overflow dups={m['nd']} "
                                   f"maxtile={m['ml']}"}), flush=True)
        _HEADLINE_OUT.set()
        return
    head = headline_dict(m, device)
    print(json.dumps(head), flush=True)
    _HEADLINE_OUT.set()

    extra = {}

    def emit():
        # re-print the combined line after EVERY extra: a driver timeout
        # mid-extras then still leaves the fullest line as the last line
        # (r4: heavy_tail+fps+train exceed 600 s through the tunnel's
        # per-executable first-fetch warmup, and the single final print
        # was lost to the kill)
        head["detail"].update(extra)
        print(json.dumps(head), flush=True)

    # fps + real train step are ON by default (VERDICT r3 item 4: these are
    # the two numbers users compare — ref >=30 fps @1080p README.md:14 and
    # ~18.5 it/s training); disable via GS_BENCH_FPS=0 / GS_BENCH_TRAIN=0.
    # fps runs BEFORE the train probe: it is ~5x cheaper (one lean compile,
    # 14 frames/run) and was budget-starved out of BENCH_r04 when it ran
    # last — this order guarantees all four metrics inside the 600 s
    # driver budget (VERDICT r4 weak 6).
    if (os.environ.get("GS_BENCH_FPS", "1") != "0"
            and time.perf_counter() - T_START < 0.8 * BUDGET_S):
        try:
            extra["render_fps"] = measure_render_fps("uniform", repeats)
        except Exception as e:
            extra["render_fps"] = {"error": repr(e)}
        emit()
    # 0.7: with the persistent compile cache warm the train probe takes
    # ~120 s; at 0.6 a full headline+heavy+fps pass (~380 s through the
    # tunnel) starved it out of the driver artifact (r5 dry run)
    if (os.environ.get("GS_BENCH_TRAIN", "1") != "0"
            and time.perf_counter() - T_START < 0.55 * BUDGET_S):
        try:
            extra["train_step"] = measure_train_step("uniform", repeats)
        except Exception as e:
            extra["train_step"] = {"error": repr(e)}
        emit()
    # ---- heavy-tail scene LAST (r5): the driver budget fits headline +
    # fps + train + heavy only in that order — heavy is the least
    # decision-relevant of the four, so it is the one at risk ------------
    if (time.perf_counter() - T_START < 0.75 * BUDGET_S
            and not os.environ.get("GS_BENCH_NO_HEAVY")):
        try:
            mh = measure_scene("heavy_tail", repeats)
            px = WIDTH * HEIGHT / mh["dt"]
            extra["heavy_tail"] = {
                "pixels_per_s": round(px, 1),
                "vs_baseline": round(px / BASELINE_PIXELS_PER_S, 4),
                "sec_per_fwd_bwd": round(mh["dt"], 4),
                "duplicates": mh["nd"], "max_tile_len": mh["ml"],
                "overflow": mh["overflow"],
                "max_per_tile": mh["max_per_tile"],
            }
        except Exception as e:  # never lose the headline to the extra scene
            extra["heavy_tail"] = {"error": repr(e)}
        emit()

    if os.environ.get("GS_BENCH_STAGES"):
        params, alive = build_scene("uniform")
        extra["stages"] = stage_probes(params, alive, m["dup_capacity"],
                                       m["max_per_tile"], m["dt"])

    if os.environ.get("GS_BENCH_STAGES") and extra:
        emit()


if __name__ == "__main__":
    main()
