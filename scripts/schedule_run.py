"""Schedule-shape convergence run (VERDICT r1 next-step #5).

Exercises the FULL reference training-schedule semantics at reduced scale —
SH ramp to 3, multiple opacity resets, densification growing the set >=10x,
block-scan dispatch — on a synthetic multi-view scene, and reports the
held-out PSNR trajectory plus post-reset recovery.

Run on TPU:   python scripts/schedule_run.py [--iters 7000]
(CPU works too with JAX_PLATFORMS=cpu + jax.config, but is slow.)

Writes SCHEDULE_RUN.json at the repo root.
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def ring_camera(angle, radius, height, width_px, height_px, fov_deg=55.0):
    from gs_tpu.core.camera import make_camera, focal2fov
    pos = np.array([radius * math.sin(angle), height,
                    radius * math.cos(angle)])
    z = -pos / np.linalg.norm(pos)                     # look at origin
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R_w2c = np.stack([x, y, z])                        # rows
    t = -R_w2c @ pos
    fovx = math.radians(fov_deg)
    fovy = focal2fov(width_px / (2 * math.tan(fovx / 2)), height_px)
    return make_camera(R_w2c.T, t, fovx, fovy, width_px, height_px)


def make_gt_scene(rng, n=1200):
    """Colored gaussian soup + a ground slab — structured enough that SH and
    densification have something to fit."""
    import jax.numpy as jnp
    from gs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
    from gs_tpu.core.sh import rgb2sh
    m = n // 4
    xyz = np.concatenate([
        rng.uniform(-1.6, 1.6, (n - m, 3)) * np.array([1, 0.8, 1]),
        np.concatenate([rng.uniform(-2.2, 2.2, (m, 1)),
                        np.full((m, 1), -1.0) + rng.normal(0, 0.02, (m, 1)),
                        rng.uniform(-2.2, 2.2, (m, 1))], axis=1),
    ]).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    return GaussianParams(
        xyz=jnp.asarray(xyz),
        sh_dc=jnp.asarray(rgb2sh(colors)[:, None, :], jnp.float32),
        sh_rest=jnp.zeros((n, 15, 3)),
        log_scale=jnp.asarray(rng.uniform(-3.2, -2.2, (n, 3)), jnp.float32),
        quat=jnp.asarray(
            rng.normal(0, 1, (n, 4)) + np.array([2.0, 0, 0, 0]), jnp.float32),
        logit_opacity=inverse_sigmoid(
            jnp.asarray(rng.uniform(0.5, 0.95, (n, 1)), jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--views", type=int, default=36)
    ap.add_argument("--res", type=int, nargs=2, default=(160, 120))
    ap.add_argument("--reset_interval", type=int, default=2000,
                    help="opacity reset interval; 0 disables resets "
                         "(ablation for the post-densify PSNR decay study)")
    ap.add_argument("--initial_capacity", type=int, default=1 << 15)
    ap.add_argument("--dup_capacity", type=int, default=1 << 20)
    ap.add_argument("--max_per_tile", type=int, default=4096)
    ap.add_argument("--densify_grad_threshold", type=float, default=0.0,
                    help="0 = auto: 1e-4 scaled by sqrt(pixels/160*120). "
                    "r4's fixed 1e-4 (tuned at 160x120) over-densified "
                    "4x at 320x240 — 584k splats for a 1.2k-splat GT "
                    "scene, test PSNR 29.6 -> 24.2 (SCHEDULE_RUN_r4); "
                    "mean |dL/dmean2d| shrinks ~1/sqrt(px) at fixed "
                    "scene scale, so the reference's 2e-4 at ~1 Mpx "
                    "maps to ~2e-4 here (ref arguments/__init__.py:87)")
    ap.add_argument("--out", default="SCHEDULE_RUN.json")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon sitecustomize overrides the env var; honor an explicit
        # cpu request (smoke runs)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gs_tpu.config import (ModelConfig, OptimizationConfig,
                               PipelineConfig, RasterConfig)
    from gs_tpu.data.camera_utils import LoadedCamera
    from gs_tpu.data.dataset_readers import CameraInfo
    from gs_tpu.render import render
    from gs_tpu.train.loop import Trainer

    rng = np.random.default_rng(3)
    W, H = args.res
    gt_params = make_gt_scene(rng)

    cams = [ring_camera(2 * math.pi * i / args.views,
                        radius=5.0 + 0.5 * math.sin(3 * i),
                        height=0.8 + 0.6 * math.cos(2 * i), width_px=W,
                        height_px=H)
            for i in range(args.views)]

    print("rendering ground-truth views...", flush=True)
    gt_render = jax.jit(lambda c: jnp.clip(render(
        c, gt_params, jnp.zeros(3), active_sh_degree=0, backend="auto",
        dup_capacity=1 << 18, max_per_tile=2048).image, 0, 1))
    loaded = []
    for i, c in enumerate(cams):
        # the axon tunnel can serve unready fetches as zeros — validate and
        # re-fetch (a black training set silently trains to transparency)
        img = np.asarray(gt_render(c))
        for _ in range(5):
            if img.max() > 1e-6:
                break
            time.sleep(1.0)
            img = np.asarray(gt_render(c))
        assert img.max() > 1e-6, f"view {i} fetched black from device"
        info = CameraInfo(uid=i, R=np.eye(3), T=np.zeros(3), fovx=1.0,
                          fovy=0.8, image_path="", image_name=f"v{i:03d}",
                          width=W, height=H)
        loaded.append(LoadedCamera(camera=c, info=info, image=img,
                                   alpha_mask=np.ones((1, H, W), np.float32),
                                   invdepth=None, depth_mask=None,
                                   depth_reliable=False))
    gt_mean = float(np.mean([c.image.mean() for c in loaded]))
    print(f"gt views: mean intensity {gt_mean:.3f}", flush=True)
    assert gt_mean > 0.01, "ground-truth views are black"
    train_cams = [c for i, c in enumerate(loaded) if i % 8 != 0]
    test_cams = [c for i, c in enumerate(loaded) if i % 8 == 0]

    # init: sparse random cloud — densification must do the work
    n0 = 300
    pts = rng.uniform(-2.0, 2.0, (n0, 3))
    cols = rng.uniform(0, 1, (n0, 3))

    # reset_interval=0 disables resets entirely (the reference has no such
    # mode; this is an ablation knob for the decay study, VERDICT r2 #7)
    reset_interval = args.reset_interval or (10 * args.iters)
    gthr = args.densify_grad_threshold or (
        1e-4 * math.sqrt(W * H / (160.0 * 120.0)))
    print(f"densify_grad_threshold: {gthr:.2e} at {W}x{H}", flush=True)
    opt = OptimizationConfig(
        iterations=args.iters, position_lr_max_steps=args.iters,
        densify_from_iter=500, densify_until_iter=args.iters * 4 // 7,
        densification_interval=100, opacity_reset_interval=reset_interval,
        densify_grad_threshold=gthr)
    raster = RasterConfig(backend="auto", dup_capacity=args.dup_capacity,
                          max_per_tile=args.max_per_tile, chunk=64)
    tr = Trainer(train_cams, (pts, cols, np.zeros_like(pts)),
                 spatial_lr_scale=4.0, model_cfg=ModelConfig(sh_degree=3),
                 opt=opt, pipe=PipelineConfig(), raster=raster,
                 test_cams=test_cams,
                 initial_capacity=args.initial_capacity)

    trajectory = []
    t0 = time.perf_counter()

    def on_test(i, report, trainer):
        psnr = report["test"].get("psnr", float("nan"))
        # train PSNR disambiguates the post-densify decay: overfitting shows
        # train rising while test falls; schedule damage drops both
        tpsnr = report.get("train_sample", {}).get("psnr", float("nan"))
        n_alive = int(trainer.state.num_alive)
        sh_deg = min(i // 1000, 3)
        trajectory.append({"iter": i, "test_psnr": round(psnr, 3),
                           "train_psnr": round(tpsnr, 3),
                           "n_gaussians": n_alive, "sh_degree": sh_deg,
                           "wall_s": round(time.perf_counter() - t0, 1)})
        print(f"[{i:5d}] psnr={psnr:.2f} train={tpsnr:.2f} n={n_alive} "
              f"sh={sh_deg} ema_loss={trainer.ema_loss:.4f}", flush=True)

    test_iters = sorted(set(
        list(range(500, args.iters + 1, 500))
        + [r + d for r in range(reset_interval, args.iters, reset_interval)
           for d in (-50, 100, 400)]))
    tr.train(test_iterations=test_iters, on_test=on_test, block_scan=True)

    wall = time.perf_counter() - t0
    by_iter = {t["iter"]: t for t in trajectory}
    # the reference resets opacity only INSIDE the densify window
    # (train.py:157-167); intervals beyond densify_until never fire
    resets = [r for r in range(reset_interval, opt.densify_until_iter,
                               reset_interval)]
    recovery = []
    for r in resets:
        pre = by_iter.get(r - 50, {}).get("test_psnr")
        post = by_iter.get(r + 400, {}).get("test_psnr")
        if pre and post:
            recovery.append({"reset_at": r, "psnr_pre": pre,
                             "psnr_post400": post,
                             "recovered": bool(post >= pre - 0.5)})
    final_n = int(tr.state.num_alive)
    result = {
        "config": {"iters": args.iters, "views": args.views, "res": [W, H],
                   "init_points": n0,
                   "opacity_reset_interval": args.reset_interval,
                   "densify_until": opt.densify_until_iter},
        "final": {"test_psnr": trajectory[-1]["test_psnr"] if trajectory
                  else None,
                  "n_gaussians": final_n,
                  "growth_factor": round(final_n / n0, 1),
                  "wall_s": round(wall, 1)},
        "opacity_reset_recovery": recovery,
        "trajectory": trajectory,
        "device": str(jax.devices()[0]),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["final"]))
    print(f"recovery: {recovery}")
    assert final_n >= 10 * n0, f"densification grew only {final_n}/{n0}"


if __name__ == "__main__":
    main()
