"""Benchmark: fwd+bwd rasterization throughput at 1080p on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
import time

import numpy as np

BASELINE_PIXELS_PER_S = 2.4e7
WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 500_000


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


def main():
    import jax
    import jax.numpy as jnp
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.render import render

    params, alive = build_scene()
    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    kwargs = dict(active_sh_degree=3, backend="pallas", alive=alive,
                  dup_capacity=1 << 22, max_per_tile=8192, chunk=64)

    def loss_fn(p):
        out = render(cam, p, bg, **kwargs)
        return jnp.mean(jnp.abs(out.image - gt))

    @jax.jit
    def step(p):
        g = jax.grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

    # sanity: capacity check before timing
    chk = jax.jit(lambda p: render(cam, p, bg, **kwargs))(params)
    ov = bool(chk.overflow)
    nd = int(chk.num_duplicates)
    ml = int(chk.max_tile_len)
    if ov:
        print(json.dumps({"metric": "pixels_per_s_fwd_bwd_1080p", "value": 0,
                          "unit": "pixels/s", "vs_baseline": 0,
                          "error": f"binning overflow dups={nd} maxtile={ml}"}))
        return

    def run(k):
        p = params
        for _ in range(k):
            p = step(p)
        return float(jnp.asarray(p.xyz).ravel()[0])   # forces completion

    run(1)  # compile
    k1, k2 = 2, 8
    t0 = time.perf_counter(); run(k1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(k2); t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (k2 - k1)

    pixels_per_s = WIDTH * HEIGHT / dt
    print(json.dumps({
        "metric": "pixels_per_s_fwd_bwd_1080p",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
        "detail": {"sec_per_fwd_bwd": round(dt, 4), "n_gaussians": N_GAUSS,
                   "duplicates": nd, "max_tile_len": ml,
                   "device": str(jax.devices()[0]).replace(" ", "_")},
    }))


if __name__ == "__main__":
    main()
