"""The training driver: schedule, densification, eval, snapshots.

Orchestrates the jitted train step exactly like the reference loop
(ref: train.py:43-183): epoch-less random camera picks without replacement,
densify/prune every ``densification_interval`` iters inside
[densify_from_iter, densify_until_iter), opacity reset every
``opacity_reset_interval`` (plus once at densify_from_iter on white bg),
SH-degree ramp, periodic test-set PSNR reports, PLY snapshots and training
checkpoints.

TPU-specific behavior with no reference counterpart: padded-capacity growth
(re-jit when the alive count approaches capacity) and duplicate-buffer
overflow recovery (re-jit with a larger binning capacity).
"""
from __future__ import annotations

import dataclasses
import math
import os
import time
from functools import partial
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import (ModelConfig, OptimizationConfig, PipelineConfig,
                      RasterConfig)
from ..core.camera import stack_cameras
from ..data.camera_utils import LoadedCamera
from ..models.gaussian_model import (TrainState, create_from_pcd,
                                     densify_and_prune, grow_capacity,
                                     init_state, reset_opacity)
from ..ops.losses import psnr
from ..render import render
from .step import StepMetrics, make_train_step


def _normalize_resolutions(cams: list) -> list:
    """Training batches require one (W, H); real COLMAP scenes occasionally
    differ by a pixel after undistortion — resize those to the modal
    resolution (sub-pixel warp, FoV kept) instead of crashing."""
    from collections import Counter
    sizes = Counter((c.camera.width, c.camera.height) for c in cams)
    if len(sizes) == 1:
        return cams
    (w, h), _ = sizes.most_common(1)[0]
    print(f"[gs_tpu] non-uniform camera resolutions {dict(sizes)}; "
          f"resizing all to {w}x{h}")
    from ..core.camera import Camera
    out = []
    for c in cams:
        if (c.camera.width, c.camera.height) == (w, h):
            out.append(c)
            continue
        import cv2
        img = cv2.resize(c.image.transpose(1, 2, 0), (w, h)).transpose(2, 0, 1)
        alpha = cv2.resize(c.alpha_mask[0], (w, h))[None]
        invd = (cv2.resize(c.invdepth, (w, h))
                if c.invdepth is not None else None)
        dmask = (cv2.resize(c.depth_mask, (w, h))
                 if c.depth_mask is not None else None)
        cam = Camera(world_view=c.camera.world_view,
                     full_proj=c.camera.full_proj,
                     camera_center=c.camera.camera_center,
                     tan_fovx=c.camera.tan_fovx, tan_fovy=c.camera.tan_fovy,
                     width=w, height=h)
        out.append(c._replace(camera=cam, image=np.ascontiguousarray(img),
                              alpha_mask=np.ascontiguousarray(alpha),
                              invdepth=invd, depth_mask=dmask))
    return out


class Trainer:
    def __init__(self, train_cams: Sequence[LoadedCamera],
                 point_cloud, spatial_lr_scale: float,
                 model_cfg: ModelConfig, opt: OptimizationConfig,
                 pipe: PipelineConfig, raster: RasterConfig,
                 test_cams: Sequence[LoadedCamera] = (),
                 start_state: Optional[TrainState] = None,
                 start_iteration: int = 0, seed: int = 0,
                 initial_capacity: Optional[int] = None,
                 mesh=None, packed: Optional[bool] = None):
        """``mesh`` (a jax Mesh with a 'gauss' axis) shards the Gaussian
        state over devices and renders via the shard_map multi-chip path.

        ``packed`` stores the training state in the channel-major [R, C]
        layout (models/packed_state.py) — measured ~TPU-layout win on the
        per-step hot path. Defaults to on whenever no mesh is used."""
        assert len(train_cams) > 0
        self.mesh = mesh
        self.packed = (mesh is None) if packed is None else packed
        assert not (self.packed and mesh is not None), \
            "packed layout is single-chip for now"
        self.train_cams = _normalize_resolutions(list(train_cams))
        self.test_cams = list(test_cams)
        self.model_cfg = model_cfg
        self.opt = opt
        self.pipe = pipe
        self.raster = raster
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.iteration = start_iteration
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.key(seed)

        self.cam_batch = stack_cameras([c.camera for c in self.train_cams])
        self.images = np.stack([c.image for c in self.train_cams])
        has_alpha = any(c.alpha_mask.min() < 1.0 for c in self.train_cams)
        self.alphas = (np.stack([c.alpha_mask for c in self.train_cams])
                       if has_alpha else None)
        # depth priors may cover only part of the cameras (the reference
        # simply skips the depth term for views without a map); missing views
        # get zero maps + depth_ok=0 so one jitted step shape serves all
        self.use_depth = any(c.invdepth is not None for c in self.train_cams)
        if self.use_depth:
            h, w = self.train_cams[0].image.shape[1:]
            zero = np.zeros((h, w), np.float32)
            self.invdepths = np.stack(
                [c.invdepth if c.invdepth is not None else zero
                 for c in self.train_cams])
            self.depth_masks = np.stack(
                [c.depth_mask if c.depth_mask is not None else zero
                 for c in self.train_cams])
            self.depth_ok = np.array(
                [1.0 if (c.invdepth is not None and c.depth_reliable) else 0.0
                 for c in self.train_cams], np.float32)

        if start_state is None:
            pts, cols, _ = point_cloud
            params, alive = create_from_pcd(pts, cols, model_cfg.sh_degree,
                                            capacity=initial_capacity)
            self.state = init_state(params, alive,
                                    num_images=len(self.train_cams))
        else:
            self.state = start_state
        if mesh is not None:
            from ..parallel.mesh import shard_state
            if self.state.capacity % mesh.devices.size != 0:
                self.state = grow_capacity(
                    self.state,
                    -(-self.state.capacity // mesh.devices.size)
                    * mesh.devices.size)
            self.state = shard_state(self.state, mesh)
        if self.packed:
            from ..models.packed_state import pack_state
            self.state = jax.jit(pack_state)(self.state)

        self._build_step()
        self._camera_stack: list[int] = []
        self.ema_loss = 0.0
        self.sync_every = 50          # device->host metric fetch cadence
        self._last_metrics = None
        self._last_cam = -1
        self._device_data = None      # lazily built for scan blocks

    # ------------------------------------------------------------- plumbing

    def _build_step(self):
        # any re-jit invalidates the scan wrapper built on the old step
        self._device_data = None
        self._scan_step = None
        self.train_step = make_train_step(
            self.opt, self.model_cfg, self.pipe, self.raster,
            self.cam_batch, self.spatial_lr_scale, self.model_cfg.sh_degree,
            mesh=self.mesh, packed=self.packed)
        # spatial_lr_scale IS the scene extent: the reference assigns
        # cameras_extent to both (scene/__init__.py passes it as
        # spatial_lr_scale; train.py:161 uses it as the densify extent)
        if self.packed:
            from ..models.packed_state import (densify_and_prune_packed,
                                               reset_opacity_packed)
            densify_fn, reset_fn = densify_and_prune_packed, reset_opacity_packed
        else:
            densify_fn, reset_fn = densify_and_prune, reset_opacity
        self._densify = jax.jit(partial(
            densify_fn,
            grad_threshold=self.opt.densify_grad_threshold,
            min_opacity=0.005,
            extent=self.spatial_lr_scale,
            percent_dense=self.opt.percent_dense))
        self._reset_opacity = jax.jit(reset_fn)

    def _next_camera(self) -> int:
        # random pop without replacement (ref: train.py:96-98)
        if not self._camera_stack:
            self._camera_stack = list(
                self.rng.permutation(len(self.train_cams)))
        return int(self._camera_stack.pop())

    def _split_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ----------------------------------------------------------------- step

    def step(self, sync: bool = False) -> StepMetrics:
        """Run one training iteration (self.iteration advances to i+1).

        Device->host syncs (loss read, overflow check) happen only every
        ``sync_every`` iterations or when ``sync`` is set — a per-step fetch
        would serialize the dispatch pipeline (and costs a full round trip on
        remote-attached TPUs). Returned metrics are device arrays.
        """
        self.iteration += 1
        i = self.iteration
        idx = self._next_camera()
        gt = jnp.asarray(self.images[idx])
        alpha = jnp.asarray(self.alphas[idx]) if self.alphas is not None else None
        if self.use_depth:
            invd = jnp.asarray(self.invdepths[idx])
            dmask = jnp.asarray(self.depth_masks[idx])
            dok = jnp.float32(self.depth_ok[idx])
        else:
            invd, dmask, dok = None, None, jnp.float32(0.0)
        self.state, metrics = self.train_step(
            self.state, jnp.int32(idx), gt, alpha, invd, dmask, dok,
            jnp.int32(i), self._split_key())
        self._last_metrics = metrics
        self._last_cam = idx

        self._apply_schedule(i)
        if sync or i % self.sync_every == 0:
            self.sync_metrics()
        return metrics

    def _apply_schedule(self, i: int):
        """Densify/opacity-reset at iteration i (ref: train.py:157-167)."""
        opt = self.opt
        if i < opt.densify_until_iter:
            if i > opt.densify_from_iter and i % opt.densification_interval == 0:
                use_size = jnp.bool_(i > opt.opacity_reset_interval)
                self.state, info = self._densify(
                    self.state, self._split_key(),
                    use_size_threshold=use_size)
                self._maybe_grow()
            if i % opt.opacity_reset_interval == 0 or (
                    self.model_cfg.white_background and
                    i == opt.densify_from_iter):
                self.state = self._reset_opacity(self.state)

    # --------------------------------------------------------- scan blocks

    def _ensure_device_data(self):
        if self._device_data is None:
            from .step import make_train_steps_scan
            use_alpha = self.alphas is not None
            self._scan_step = make_train_steps_scan(
                self.train_step, use_alpha=use_alpha,
                use_depth=self.use_depth)
            zeros1 = jnp.zeros((1,), jnp.float32)
            self._device_data = dict(
                images=jnp.asarray(self.images),
                alphas=jnp.asarray(self.alphas) if use_alpha else zeros1,
                invd=jnp.asarray(self.invdepths) if self.use_depth else zeros1,
                dmask=jnp.asarray(self.depth_masks) if self.use_depth else zeros1,
                dok=jnp.asarray(self.depth_ok) if self.use_depth else zeros1,
            )

    def run_block(self, k: int) -> StepMetrics:
        """Run ``k`` iterations in scan dispatches (lax.scan over steps; the
        ground-truth stack lives on device). The caller must ensure no
        densify/reset boundary falls inside the block — ``train`` aligns
        blocks to the schedule.

        Every dispatch uses ONE bucket length (the densification interval,
        tail steps masked invalid) so arbitrary block lengths share a single
        compiled executable."""
        self._ensure_device_data()
        B = max(int(self.opt.densification_interval), 1)
        d = self._device_data
        done = 0
        while done < k:
            b = min(B, k - done)
            real = [self._next_camera() for _ in range(b)]
            idxs = np.array(real + [real[-1]] * (B - b), np.int32)
            valid = np.arange(B) < b
            keys = jax.random.split(self._split_key(), B)
            self.state, metrics = self._scan_step(
                self.state, d["images"], d["alphas"], d["invd"], d["dmask"],
                d["dok"], jnp.int32(self.iteration), jnp.asarray(idxs), keys,
                jnp.asarray(valid))
            self.iteration += b
            done += b
            self._last_cam = int(real[-1])
        self._last_metrics = metrics
        return metrics

    def _next_boundary(self, i: int, end: int, extra=()) -> int:
        """Next schedule event strictly after iteration i."""
        opt = self.opt
        cands = [end]
        for interval, limit in ((opt.densification_interval,
                                 opt.densify_until_iter),
                                (opt.opacity_reset_interval, end)):
            if i < limit:
                cands.append(min((i // interval + 1) * interval, end))
        if i < opt.densify_from_iter:
            cands.append(opt.densify_from_iter)
        cands.extend(e for e in extra if e > i)
        return max(min(cands), i + 1)

    def sync_metrics(self):
        """Fetch the latest step metrics to host; handle overflow / NaN."""
        metrics = self._last_metrics
        if metrics is None:
            return
        if bool(metrics.overflow):
            self._handle_overflow(int(metrics.num_duplicates),
                                  int(metrics.max_tile_len))
        loss = float(metrics.loss)
        if not math.isfinite(loss):
            self._dump_debug(self._last_cam)
            raise FloatingPointError(
                f"non-finite loss at iteration {self.iteration} (camera "
                f"{self._last_cam}); state snapshot written next to the model")
        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss  # ref: train.py:142-148
        self._last_sync_iter = self.iteration

    def _dump_debug(self, cam_idx: int):
        """Crash snapshot of the rasterizer inputs — the TPU analogue of the
        reference's --debug dump-on-kernel-failure (ref: README.md:168-171,
        train.py:101-102)."""
        path = os.path.join(self.model_cfg.model_path or ".", "dump.npz")
        p = jax.device_get(self.state.params)
        np.savez(path, xyz=p.xyz, sh_dc=p.sh_dc, sh_rest=p.sh_rest,
                 log_scale=p.log_scale, quat=p.quat,
                 logit_opacity=p.logit_opacity,
                 alive=np.asarray(self.state.alive),
                 cam_idx=cam_idx, iteration=self.iteration)
        print(f"[gs_tpu] wrote debug dump to {path}")

    def _handle_overflow(self, num_duplicates: int, max_tile_len: int):
        """Grow whichever static buffer actually overflowed, then re-jit."""
        changes = {}
        if num_duplicates > self.raster.dup_capacity:
            changes["dup_capacity"] = 1 << int(
                math.ceil(math.log2(max(num_duplicates + 1, 2))))
        if max_tile_len > self.raster.max_per_tile:
            changes["max_per_tile"] = 1 << int(
                math.ceil(math.log2(max(max_tile_len + 1, 2))))
        if not changes:
            return
        # overflow is only observable at sync points: every step since the
        # previous sync may have trained on a truncated render/gradient —
        # report the damage window so runs are auditable
        ran = self.iteration - getattr(self, "_last_sync_iter", 0)
        print(f"[gs_tpu] binning overflow (dups={num_duplicates}, "
              f"max_tile={max_tile_len}); up to {ran} iterations ran "
              f"truncated; re-jitting with {changes}", flush=True)
        self.raster = dataclasses.replace(self.raster, **changes)
        self._build_step()

    def _maybe_grow(self, headroom: float = 0.85, factor: int = 4):
        n_alive = int(self.state.num_alive)
        cap = self.state.capacity
        if n_alive > headroom * cap:
            # grow aggressively: every growth re-jits the train step, which
            # costs tens of seconds of XLA compile — memory is cheaper
            new_cap = cap * factor
            if self.mesh is not None:
                k = self.mesh.devices.size
                new_cap = -(-new_cap // k) * k
            print(f"[gs_tpu] capacity {n_alive}/{cap} alive; "
                  f"growing to {new_cap}", flush=True)
            if self.packed:
                from ..models.packed_state import grow_capacity_packed
                self.state = grow_capacity_packed(self.state, new_cap)
            else:
                self.state = grow_capacity(self.state, new_cap)
            self._reshard()
            self._build_step()

    def _reshard(self):
        """Re-apply the gauss-axis sharding after any capacity change —
        grow/compact build fresh arrays whose default placement would
        silently drop the mesh layout."""
        if self.mesh is not None:
            from ..parallel.mesh import shard_state
            self.state = shard_state(self.state, self.mesh)

    # ----------------------------------------------------------------- eval

    def _eval_render(self, sh_deg: int, white_bg: bool):
        """Cached jitted per-view render (an unjitted render executes eagerly
        — hundreds of dispatches per frame). The SH degree is a TRACED
        argument (coefficients above it masked to zero — mathematically the
        truncated basis, exactly like the train step's ramp) so the degree
        schedule does not multiply compiles; only (resolution, capacity,
        raster sizes) do."""
        key = (white_bg, self.state.capacity,
               self.raster.dup_capacity, self.raster.max_per_tile)
        cache = getattr(self, "_eval_render_cache", None)
        if cache is None:
            cache = self._eval_render_cache = {}
        if key not in cache:
            bg = jnp.ones(3) if white_bg else jnp.zeros(3)
            from .step import mask_sh_rest
            max_deg = self.model_cfg.sh_degree

            @jax.jit
            def render_view(params, alive, cam, active_deg,
                            scaling_modifier=1.0):
                masked = mask_sh_rest(params, active_deg)
                out = render(cam, masked, bg,
                             active_sh_degree=max_deg,
                             scaling_modifier=scaling_modifier,
                             antialiasing=self.pipe.antialiasing,
                             convert_SHs_python=self.pipe.convert_SHs_python,
                             compute_cov3D_python=self.pipe.compute_cov3D_python,
                             alive=alive,
                             backend=self.raster.backend,
                             dup_capacity=self.raster.dup_capacity,
                             max_per_tile=self.raster.max_per_tile,
                             chunk=self.raster.chunk,
                             tile_block=self.raster.tile_block)
                return jnp.clip(out.image, 0.0, 1.0)

            cache[key] = render_view
        fn = cache[key]
        return lambda p, a, c, sm=1.0: fn(p, a, c, jnp.int32(sh_deg),
                                          jnp.float32(sm))

    def evaluate(self, cams: Sequence[LoadedCamera],
                 max_views: Optional[int] = None) -> dict:
        """L1 + PSNR over a camera list (ref: train.py:207-242 training_report)."""
        if max_views:
            cams = cams[:max_views]
        if not cams:
            return {}
        bg = jnp.ones(3) if self.model_cfg.white_background else jnp.zeros(3)
        sh_deg = min(self.iteration // 1000, self.model_cfg.sh_degree)
        render_view = self._eval_render(sh_deg, bool(
            self.model_cfg.white_background))

        l1s, psnrs = [], []
        for c in cams:
            img = render_view(self.state.params, self.state.alive, c.camera)
            gt = jnp.asarray(c.image)
            if self.model_cfg.train_test_exp:
                # score the right half only (ref: train.py:216-219 intent,
                # render.py:41-43)
                half = img.shape[-1] // 2
                img = img[..., half:]
                gt = gt[..., half:]
            l1s.append(float(jnp.mean(jnp.abs(img - gt))))
            psnrs.append(float(psnr(img[None], gt[None])[0, 0]))
        return {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs)),
                "n_views": len(cams)}

    # ------------------------------------------------------------------ run

    def train(self, iterations: Optional[int] = None,
              test_iterations: Sequence[int] = (),
              on_step: Optional[Callable] = None,
              on_test: Optional[Callable] = None,
              log_every: int = 10, block_scan: bool = False,
              boundary_iterations: Sequence[int] = ()):
        """Run until ``iterations`` (defaults to opt.iterations).

        ``block_scan`` runs whole schedule-aligned blocks of steps in one
        device dispatch each (lax.scan with device-resident images) — the
        right mode on TPU; per-step mode keeps the reference's loop shape.
        """
        end = iterations if iterations is not None else self.opt.iterations
        events = sorted(set(test_iterations) | set(boundary_iterations))
        t0 = time.perf_counter()
        while self.iteration < end:
            if block_scan:
                nb = self._next_boundary(self.iteration, end, extra=events)
                metrics = self.run_block(nb - self.iteration)
                i = self.iteration
                self._apply_schedule(i)
                self.sync_metrics()
                if on_step is not None:
                    on_step(i, metrics, self)
            else:
                metrics = self.step()
                i = self.iteration
                if on_step is not None and i % log_every == 0:
                    on_step(i, metrics, self)
            if i in test_iterations:
                report = {
                    "test": self.evaluate(self.test_cams),
                    "train_sample": self.evaluate(self.train_cams[:5]),
                }
                if on_test is not None:
                    on_test(i, report, self)
                else:
                    print(f"[ITER {i}] " + " ".join(
                        f"{k}: psnr={v.get('psnr', float('nan')):.2f} "
                        f"l1={v.get('l1', float('nan')):.4f}"
                        for k, v in report.items() if v))
        return time.perf_counter() - t0
