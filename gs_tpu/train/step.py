"""The jitted training step — loss, gradients, Adam, densification stats.

One compiled function covers the whole per-iteration hot path of the
reference training loop (ref: train.py:87-179): render, L1 + SSIM
(+ optional depth-L1) loss, backward, densification-stat accumulation, LR
schedule, (sparse-)Adam update, exposure update. Camera selection is a traced
index into a stacked CameraBatch so the random per-iteration pick
(ref: train.py:96-98) does not recompile.

The SH degree ramp (+1 per 1000 iters, ref: train.py:91-93) is implemented by
masking the inactive coefficients to zero under a traced degree, which is
mathematically identical to evaluating the truncated basis (the expansion is
linear in the coefficients) and keeps the jit static.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, OptimizationConfig, PipelineConfig, RasterConfig
from ..core.camera import CameraBatch
from ..core.gaussians import GaussianParams
from ..core.project import preprocess
from ..models.gaussian_model import (TrainState, adam_update,
                                     add_densification_stats, exposure_update,
                                     group_lrs)
from ..ops.losses import l1_loss
from ..ops.ssim import ssim
from ..render import render_projected
from ..utils.schedules import expon_lr


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    ssim: jnp.ndarray
    depth_l1: jnp.ndarray
    num_duplicates: jnp.ndarray
    max_tile_len: jnp.ndarray
    overflow: jnp.ndarray
    n_visible: jnp.ndarray
    # largest per-device visible count (multichip visible_capacity sizing;
    # 0 on single-chip). np default keeps jax uninitialized at import.
    max_band_visible: jnp.ndarray = np.int32(0)


def mask_sh_rest(params: GaussianParams, active_sh_degree) -> GaussianParams:
    """Zero coefficients above the active degree (traced-degree SH ramp)."""
    rest_dim = params.sh_rest.shape[1]
    k = jnp.arange(1, rest_dim + 1)  # index in the full basis (DC is 0)
    keep = k < (active_sh_degree + 1) ** 2
    mask = keep.astype(params.sh_rest.dtype)[None, :, None]
    return params._replace(sh_rest=params.sh_rest * mask)


def apply_exposure(image: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """image' = E[:, :3]^T-mixed colors + offset (ref: gaussian_renderer/__init__.py:111-114)."""
    return (jnp.einsum('chw,ck->khw', image, exposure[:3, :3])
            + exposure[:3, 3, None, None])


def make_train_step(opt: OptimizationConfig, model_cfg: ModelConfig,
                    pipe: PipelineConfig, raster: RasterConfig,
                    cams: CameraBatch, spatial_lr_scale: float,
                    max_sh_degree: int, mesh=None, packed: bool = False):
    """``mesh`` switches rendering to the shard_map multi-chip path
    (gaussians sharded over the 'gauss' axis, tiles banded per device).

    ``packed`` trains on the channel-major [R, C] parameter block
    (models/packed_state.PackedState) — the TPU-native storage layout; the
    state argument is then a PackedState. Identical semantics, different
    memory layout (see core/packed.py)."""
    width, height = cams.width, cams.height
    use_sparse = opt.optimizer_type == "sparse_adam"
    use_exposure = model_cfg.train_test_exp
    bg_static = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    if packed:
        from ..core.packed import layout as packed_layout, mask_sh_rows
        from ..core.project import preprocess_packed
        from ..models.packed_state import (adam_update_packed,
                                           group_lr_rows)
        lay = packed_layout(max_sh_degree)

    def loss_fn(params, tap, exposure_row, cam, gt_image, alpha_mask,
                invdepth_gt, depth_mask, depth_ok, active_sh_degree,
                iteration, bg, state_alive):
        if packed and mesh is not None:
            masked = mask_sh_rows(params, lay, active_sh_degree)
            from ..parallel.render_mc import render_multichip
            out = render_multichip(masked, cam, bg, mesh,
                                   active_sh_degree=max_sh_degree,
                                   antialiasing=pipe.antialiasing,
                                   alive=state_alive, mean2d_tap=tap,
                                   backend=raster.backend,
                                   dup_capacity=raster.dup_capacity,
                                   max_per_tile=raster.max_per_tile,
                                   chunk=raster.chunk,
                                   packed_sh_degree=max_sh_degree,
                                   visible_capacity=getattr(
                                       raster, "visible_capacity", 0),
                                   band_assign=getattr(
                                       raster, "band_assign", "cost"))
        elif packed:
            masked = mask_sh_rows(params, lay, active_sh_degree)
            proj = preprocess_packed(masked, cam, sh_degree=max_sh_degree,
                                     active_sh_degree=max_sh_degree,
                                     antialiasing=pipe.antialiasing,
                                     alive=state_alive)
            proj = proj._replace(mean2d=proj.mean2d + tap)
            out = render_projected(proj, width, height, bg,
                                   backend=raster.backend,
                                   dup_capacity=raster.dup_capacity,
                                   max_per_tile=raster.max_per_tile,
                                   chunk=raster.chunk,
                                   tile_block=raster.tile_block,
                                   bf16_features=getattr(
                                       raster, "bf16_features", False),
                                   pallas_expand=getattr(
                                       raster, "pallas_expand", False),
                                   exact_cull=getattr(
                                       raster, "exact_cull", False),
                                   pallas_fold=getattr(
                                       raster, "pallas_fold", False))
        elif mesh is not None:
            masked = mask_sh_rest(params, active_sh_degree)
            from ..parallel.render_mc import render_multichip
            out = render_multichip(masked, cam, bg, mesh,
                                   active_sh_degree=max_sh_degree,
                                   antialiasing=pipe.antialiasing,
                                   alive=state_alive, mean2d_tap=tap,
                                   backend=raster.backend,
                                   dup_capacity=raster.dup_capacity,
                                   max_per_tile=raster.max_per_tile,
                                   chunk=raster.chunk,
                                   visible_capacity=getattr(
                                       raster, "visible_capacity", 0),
                                   band_assign=getattr(
                                       raster, "band_assign", "cost"))
        else:
            masked = mask_sh_rest(params, active_sh_degree)
            proj = preprocess(masked, cam, active_sh_degree=max_sh_degree,
                              antialiasing=pipe.antialiasing,
                              alive=state_alive)
            proj = proj._replace(mean2d=proj.mean2d + tap)
            out = render_projected(proj, width, height, bg,
                                   backend=raster.backend,
                                   dup_capacity=raster.dup_capacity,
                                   max_per_tile=raster.max_per_tile,
                                   chunk=raster.chunk,
                                   tile_block=raster.tile_block,
                                   bf16_features=getattr(
                                       raster, "bf16_features", False),
                                   pallas_expand=getattr(
                                       raster, "pallas_expand", False),
                                   exact_cull=getattr(
                                       raster, "exact_cull", False),
                                   pallas_fold=getattr(
                                       raster, "pallas_fold", False))
        image = out.image
        if use_exposure:
            image = apply_exposure(image, exposure_row)
        if alpha_mask is not None:
            image = image * alpha_mask
        ll1 = l1_loss(image, gt_image)
        ssim_v = ssim(image, gt_image)
        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim_v)

        # depth regularization (ref: train.py:124-135)
        dw = expon_lr(iteration, opt.depth_l1_weight_init,
                      opt.depth_l1_weight_final, max_steps=opt.iterations)
        if invdepth_gt is not None:
            dl1_pure = jnp.mean(jnp.abs((out.invdepth[0] - invdepth_gt) * depth_mask))
            dl1 = dw * dl1_pure * depth_ok
            loss = loss + dl1
        else:
            dl1 = jnp.float32(0.0)
        aux = (out, ll1, ssim_v, dl1)
        return loss, aux

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

    def step_core(state: TrainState, cam_idx, gt_image, alpha_mask,
                  invdepth_gt, depth_mask, depth_ok, iteration, key,
                  valid=None):
        # ``valid`` (traced bool scalar, block-scan masked-tail steps):
        # False computes the full loss/metrics but leaves the state EXACTLY
        # unchanged. Gated inside each update (fused selects); the previous
        # post-hoc tree-wide select measured 65 ms/step at the bench shape.
        cam = cams.select(cam_idx)
        active_sh_degree = jnp.minimum(iteration // 1000, max_sh_degree)

        if opt.random_background:
            bg = jax.random.uniform(key, (3,))
        else:
            bg = bg_static

        tap = jnp.zeros((state.capacity, 2), jnp.float32)
        exposure_row = state.exposure[cam_idx]
        raw_params = state.packed if packed else state.params
        (pgrads, tap_grad, exp_grad), aux = grad_fn(
            raw_params, tap, exposure_row, cam, gt_image, alpha_mask,
            invdepth_gt, depth_mask, depth_ok, active_sh_degree,
            iteration, bg, state.alive)
        out, ll1, ssim_v, dl1 = aux

        # densification statistics (only while densify is active,
        # ref: train.py:157-160). Masked, not lax.cond-wrapped: the cond
        # returned the FULL state from both branches, which forces
        # whole-state copies — the stats arrays are [C]-small, so an
        # always-run masked update is cheaper and identical
        in_densify = iteration < opt.densify_until_iter
        stats_gate = out.visibility & in_densify
        if valid is not None:
            stats_gate = stats_gate & valid
        state = add_densification_stats(state, tap_grad, stats_gate,
                                        width, height, out.radii)

        visible = out.visibility if use_sparse else None
        if packed:
            lr = group_lr_rows(lay, opt, iteration, spatial_lr_scale)
            state = adam_update_packed(state, pgrads, lr, visible,
                                       valid=valid)
        else:
            lrs = group_lrs(opt, iteration, spatial_lr_scale)
            state = adam_update(state, pgrads, lrs, visible, valid=valid)

        if use_exposure:
            full_exp_grad = jnp.zeros_like(state.exposure).at[cam_idx].set(exp_grad)
            state = exposure_update(state, full_exp_grad, opt, iteration,
                                    valid=valid)

        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim_v) + dl1
        mbv = (jnp.max(out.band_visible).astype(jnp.int32)
               if out.band_visible is not None else jnp.int32(0))
        metrics = StepMetrics(loss=loss, l1=ll1, ssim=ssim_v, depth_l1=dl1,
                              num_duplicates=out.num_duplicates,
                              max_tile_len=out.max_tile_len,
                              overflow=out.overflow,
                              n_visible=jnp.sum(out.visibility),
                              max_band_visible=mbv)
        return state, metrics

    return jax.jit(step_core)


def make_train_steps_scan(train_step, *, use_alpha: bool, use_depth: bool):
    """Wrap a step built by :func:`make_train_step` into a K-steps-per-dispatch
    scan with device-resident training data.

    Per-step host dispatch costs a full round trip on remote-attached TPUs
    (and ~10s of microseconds locally); scanning ``K`` steps inside one jit
    amortizes it to nothing. The ground-truth stack lives on device and each
    step slices its image by a traced camera index.

    A per-step ``valid`` mask lets the trainer run EVERY block at one fixed
    bucket length (the densification interval): masked steps compute but do
    not update the state, so a short tail block reuses the same executable
    instead of triggering a fresh ~100 s XLA compile per distinct length.

    Returns ``steps(state, images [B,3,H,W], alphas, invd, dmasks, doks,
    start_iteration, idxs [K], keys [K], valid [K]) -> (state,
    last-valid StepMetrics)``.
    """
    core = train_step.__wrapped__

    @jax.jit
    def train_steps(state, images, alphas, invdepths, depth_masks, depth_oks,
                    start_iteration, idxs, keys, valid):
        def body(s, inp):
            off, idx, key, v = inp
            gt = images[idx]
            alpha = alphas[idx] if use_alpha else None
            if use_depth:
                invd, dmask, dok = (invdepths[idx], depth_masks[idx],
                                    depth_oks[idx])
            else:
                invd, dmask, dok = None, None, jnp.float32(0.0)
            s, m = core(s, idx, gt, alpha, invd, dmask, dok,
                        start_iteration + off, key, valid=v)
            return s, m

        k = idxs.shape[0]
        offs = jnp.arange(1, k + 1, dtype=jnp.int32)
        state, ms = jax.lax.scan(body, state, (offs, idxs, keys, valid))
        n_valid = jnp.sum(valid.astype(jnp.int32))
        last = jax.tree.map(lambda x: x[jnp.maximum(n_valid - 1, 0)], ms)
        # surface the worst overflow across the block, not just the last step
        vmask = valid
        last = last._replace(
            overflow=jnp.any(ms.overflow & vmask),
            num_duplicates=jnp.max(jnp.where(vmask, ms.num_duplicates, 0)),
            max_tile_len=jnp.max(jnp.where(vmask, ms.max_tile_len, 0)),
            max_band_visible=jnp.max(
                jnp.where(vmask, ms.max_band_visible, 0)))
        return state, last

    return train_steps


def make_train_step_chain(train_step, *, use_alpha: bool, use_depth: bool):
    """Single-step dispatch with the device-resident training stacks: the
    ground-truth image is gathered by a TRACED camera index inside the jit,
    so chained host dispatches never move a frame over the wire.

    Measured on v5e at the 1080p bench shape, k host-chained dispatches of
    this executable run ~60 ms/step FASTER than the identical step inside a
    4-step ``lax.scan`` (192.7 vs 252.8 ms/step,
    studies/r4_measure/perf_r4h.log) — the scan's while-loop context costs
    far more than per-dispatch enqueue, even through the axon tunnel. The
    trainer therefore defaults block dispatch to this ("chain") and keeps
    the scan ("scan") as the fallback dispatch mode.

    Returns ``step1(state, images [V,3,H,W], alphas, invd, dmasks, doks,
    iteration, idx, key) -> (state, StepMetrics)``.
    """
    core = train_step.__wrapped__

    @jax.jit
    def step1(state, images, alphas, invdepths, depth_masks, depth_oks,
              iteration, idx, key):
        gt = images[idx]
        alpha = alphas[idx] if use_alpha else None
        if use_depth:
            invd, dmask, dok = (invdepths[idx], depth_masks[idx],
                                depth_oks[idx])
        else:
            invd, dmask, dok = None, None, jnp.float32(0.0)
        return core(state, idx, gt, alpha, invd, dmask, dok, iteration, key)

    return step1
