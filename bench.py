"""Benchmark: fwd+bwd rasterization throughput at 1080p on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference's accelerated CUDA rasterizer
trains an average scene (~1.1 Mpx images) in 27 min / 30k iterations on an
A6000 => ~18.5 it/s * 1.3 Mpx ~= 2.4e7 pixels/s forward+backward. vs_baseline
is our measured pixels/s divided by that.
"""
import json
import math
import time

import numpy as np

BASELINE_PIXELS_PER_S = 2.4e7
WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 200_000


def main():
    import jax
    import jax.numpy as jnp
    from gs_tpu.core.camera import make_camera, focal2fov
    from gs_tpu.models.gaussian_model import create_from_pcd
    from gs_tpu.render import render

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-2.2, 2.2, (N_GAUSS, 1)),
        rng.uniform(-1.3, 1.3, (N_GAUSS, 1)),
        rng.uniform(3.0, 8.0, (N_GAUSS, 1)),
    ], axis=1)
    cols = rng.uniform(0, 1, (N_GAUSS, 3))
    params, alive = create_from_pcd(pts, cols, sh_degree=3,
                                    capacity=1 << 18)

    fovx = math.radians(70.0)
    fovy = focal2fov(WIDTH / (2 * math.tan(fovx / 2)), HEIGHT)
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, WIDTH, HEIGHT)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    kwargs = dict(active_sh_degree=3, backend="binned", alive=alive,
                  dup_capacity=1 << 24, max_per_tile=4096, chunk=32,
                  tile_block=512)

    def loss_fn(p):
        out = render(cam, p, bg, **kwargs)
        return jnp.mean(jnp.abs(out.image - gt))

    step = jax.jit(jax.grad(loss_fn))

    # sanity: check duplicate capacity and per-tile cap before timing
    chk = jax.jit(lambda p: render(cam, p, bg, **kwargs))(params)
    ov = bool(chk.overflow)
    nd = int(chk.num_duplicates)
    if ov:
        print(json.dumps({"metric": "pixels_per_s_fwd_bwd_1080p", "value": 0,
                          "unit": "pixels/s", "vs_baseline": 0,
                          "error": f"binning overflow dups={nd}"}))
        return

    g = step(params)
    jax.block_until_ready(g)

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        g = step(params)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / n_iters

    pixels_per_s = WIDTH * HEIGHT / dt
    print(json.dumps({
        "metric": "pixels_per_s_fwd_bwd_1080p",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
        "detail": {"sec_per_fwd_bwd": round(dt, 4), "n_gaussians": N_GAUSS,
                   "duplicates": nd,
                   "device": str(jax.devices()[0]).replace(" ", "_")},
    }))


if __name__ == "__main__":
    main()
