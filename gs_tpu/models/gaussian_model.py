"""Training-state Gaussian model: parameters + Adam + density control.

TPU-native re-design of the reference ``GaussianModel``
(ref: scene/gaussian_model.py). The reference reallocates parameter tensors
and performs optimizer-state surgery on every densify/prune
(ref: scene/gaussian_model.py:274-344); under XLA that would mean a recompile
every 100 iterations. Instead all arrays are padded to a static capacity with
an ``alive`` mask, and densify/clone/split/prune are pure functions that write
into free slots — shapes never change inside jit. Capacity growth (rare)
happens on the host via :func:`grow_capacity`.

Semantics preserved exactly (ref: scene/gaussian_model.py:367-433 and
train.py:157-167):
  * clone when grad-norm >= tau and max scale <= percent_dense * extent
  * split (N=2) when grad-norm >= tau and max scale above threshold; children
    sampled from N(0, scale) rotated into world frame, scales /= 1.6
  * prune on opacity < min_opacity, plus (after the first opacity reset)
    world-size > 0.1 * extent. The reference's screen-size prune reads
    ``max_radii2D`` *after* densification_postfix has zeroed it
    (ref: gaussian_model.py:346-365 vs :420-425), so it never fires; we
    reproduce that faithfully (the stat is still tracked for logging).
  * densification stats accumulate ||dL/d(mean2D ndc-half-res)||
    (ref: gaussian_model.py:431-433)
  * Adam with eps=1e-15, per-group LRs, f_rest = feature_lr/20, exponential
    xyz schedule (ref: gaussian_model.py:160-191); optimizer state of new
    slots is zeroed, step count shared (torch keeps the per-tensor step
    across cat surgery)
  * sparse-adam applies the update only to rows visible in the last render
    (ref: train.py:173-175)
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.gaussians import (GaussianParams, get_opacity, get_scaling,
                              inverse_sigmoid, quat_to_rotmat)
from ..core.sh import rgb2sh
from ..core.spatial import mean_sq_dist_to_3nn
from ..config import OptimizationConfig
from ..utils.schedules import expon_lr

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15      # ref: gaussian_model.py:170
EXP_ADAM_EPS = 1e-8   # torch default for the exposure optimizer


class TrainState(NamedTuple):
    params: GaussianParams
    alive: jnp.ndarray          # [C] bool
    m: GaussianParams           # Adam first moment
    v: GaussianParams           # Adam second moment
    step: jnp.ndarray           # [] int32 shared Adam step
    grad_accum: jnp.ndarray     # [C] sum of ||mean2D grad||
    denom: jnp.ndarray          # [C] visibility counts
    max_radii2D: jnp.ndarray    # [C] int32
    exposure: jnp.ndarray       # [num_images, 3, 4]
    exp_m: jnp.ndarray
    exp_v: jnp.ndarray
    exp_step: jnp.ndarray       # [] int32

    @property
    def capacity(self) -> int:
        return self.params.capacity

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)


def _zeros_like_params(p: GaussianParams) -> GaussianParams:
    return jax.tree.map(jnp.zeros_like, p)


def init_state(params: GaussianParams, alive: jnp.ndarray,
               num_images: int) -> TrainState:
    c = params.capacity
    exposure = jnp.tile(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)[None],
        (max(num_images, 1), 1, 1)).astype(jnp.float32)
    return TrainState(
        params=params, alive=alive,
        m=_zeros_like_params(params), v=_zeros_like_params(params),
        step=jnp.int32(0),
        grad_accum=jnp.zeros((c,), jnp.float32),
        denom=jnp.zeros((c,), jnp.float32),
        max_radii2D=jnp.zeros((c,), jnp.int32),
        exposure=exposure,
        exp_m=jnp.zeros_like(exposure), exp_v=jnp.zeros_like(exposure),
        exp_step=jnp.int32(0),
    )


def create_from_pcd(points: np.ndarray, colors: np.ndarray, sh_degree: int,
                    capacity: Optional[int] = None) -> tuple[GaussianParams, jnp.ndarray]:
    """Initial Gaussians from a point cloud (ref: scene/gaussian_model.py:130-153)."""
    n = points.shape[0]
    if capacity is None:
        capacity = max(1 << int(math.ceil(math.log2(max(n, 1) * 2))), 1024)
    rest_dim = (sh_degree + 1) ** 2 - 1

    xyz = jnp.asarray(points, jnp.float32)
    dist2 = mean_sq_dist_to_3nn(xyz)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    sh_dc = rgb2sh(jnp.asarray(colors, jnp.float32))[:, None, :]
    quat = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (n, 1))
    logit_op = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))

    def pad(x, fill=0.0):
        cfg = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    params = GaussianParams(
        xyz=pad(xyz),
        sh_dc=pad(sh_dc),
        sh_rest=jnp.zeros((capacity, rest_dim, 3), jnp.float32),
        log_scale=pad(log_scale, -10.0),
        quat=pad(quat).at[n:, 0].set(1.0),
        logit_opacity=pad(logit_op, -10.0),
    )
    alive = (jnp.arange(capacity) < n)
    return params, alive


# ---------------------------------------------------------------- Adam

def group_lrs(opt: OptimizationConfig, step, spatial_lr_scale: float) -> GaussianParams:
    """Per-parameter-group learning rates (ref: gaussian_model.py:160-191)."""
    xyz_lr = expon_lr(step,
                      opt.position_lr_init * spatial_lr_scale,
                      opt.position_lr_final * spatial_lr_scale,
                      lr_delay_mult=opt.position_lr_delay_mult,
                      max_steps=opt.position_lr_max_steps)
    return GaussianParams(
        xyz=xyz_lr,
        sh_dc=jnp.float32(opt.feature_lr),
        sh_rest=jnp.float32(opt.feature_lr / 20.0),
        log_scale=jnp.float32(opt.scaling_lr),
        quat=jnp.float32(opt.rotation_lr),
        logit_opacity=jnp.float32(opt.opacity_lr),
    )


def adam_update(state: TrainState, grads: GaussianParams,
                lrs: GaussianParams,
                visible_mask: Optional[jnp.ndarray] = None,
                valid=None) -> TrainState:
    """Dense Adam, or sparse (row-masked) when ``visible_mask`` is given.

    ``valid`` False makes the whole update an exact no-op (incl. the step
    counter) — the block-scan's masked-tail gate, fused into the update
    (see packed_state.adam_update_packed)."""
    if valid is None:
        step = state.step + 1
    else:
        step = state.step + valid.astype(state.step.dtype)
    t = step.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** t
    bc2 = 1.0 - ADAM_B2 ** t

    def masked(new, old, p):
        mask = None
        if visible_mask is not None:
            mask = visible_mask.reshape((-1,) + (1,) * (p.ndim - 1))
        if valid is not None:
            mask = valid if mask is None else (mask & valid)
        if mask is None:
            return new
        return jnp.where(mask, new, old)

    m = jax.tree.map(lambda g, m, p: masked(ADAM_B1 * m + (1 - ADAM_B1) * g, m, p),
                     grads, state.m, state.params)
    v = jax.tree.map(lambda g, v, p: masked(ADAM_B2 * v + (1 - ADAM_B2) * g * g, v, p),
                     grads, state.v, state.params)
    params = jax.tree.map(
        lambda p, m_new, v_new, lr: masked(
            p - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + ADAM_EPS), p, p),
        state.params, m, v, lrs)
    return state._replace(params=params, m=m, v=v, step=step)


def exposure_update(state: TrainState, exp_grad: jnp.ndarray,
                    opt: OptimizationConfig, iteration,
                    valid=None) -> TrainState:
    lr = expon_lr(iteration, opt.exposure_lr_init, opt.exposure_lr_final,
                  lr_delay_steps=opt.exposure_lr_delay_steps,
                  lr_delay_mult=opt.exposure_lr_delay_mult,
                  max_steps=opt.iterations)
    if valid is None:
        step = state.exp_step + 1
    else:
        step = state.exp_step + valid.astype(state.exp_step.dtype)
    t = step.astype(jnp.float32)
    m = ADAM_B1 * state.exp_m + (1 - ADAM_B1) * exp_grad
    v = ADAM_B2 * state.exp_v + (1 - ADAM_B2) * exp_grad ** 2
    p = state.exposure - lr * (m / (1 - ADAM_B1 ** t)) / (
        jnp.sqrt(v / (1 - ADAM_B2 ** t)) + EXP_ADAM_EPS)
    if valid is not None:
        m = jnp.where(valid, m, state.exp_m)
        v = jnp.where(valid, v, state.exp_v)
        p = jnp.where(valid, p, state.exposure)
    return state._replace(exposure=p, exp_m=m, exp_v=v, exp_step=step)


# ----------------------------------------------------- density control

class DensifyInfo(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray   # new Gaussians that found no free slot
    n_alive: jnp.ndarray


def add_densification_stats(state: TrainState, mean2d_grad: jnp.ndarray,
                            visibility: jnp.ndarray, width: int, height: int,
                            radii: jnp.ndarray) -> TrainState:
    """Accumulate ||dL/d mean2D|| in the reference's ndc-half-res units.

    ``mean2d_grad`` is in pixels; the reference's screenspace tensor carries
    gradients scaled by (0.5*W, 0.5*H) (ref: gaussian_model.py:431-433 +
    the CUDA ddelx_dx factor).
    """
    g = mean2d_grad * jnp.array([0.5 * width, 0.5 * height], jnp.float32)
    norm = jnp.linalg.norm(g, axis=-1)
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(visibility, norm, 0.0),
        denom=state.denom + visibility.astype(jnp.float32),
        max_radii2D=jnp.where(visibility,
                              jnp.maximum(state.max_radii2D, radii),
                              state.max_radii2D),
    )


def densify_and_prune(state: TrainState, key: jax.Array, *,
                      grad_threshold: float, min_opacity: float,
                      extent: float, percent_dense: float,
                      use_size_threshold) -> tuple[TrainState, DensifyInfo]:
    """One densify/clone/split/prune pass at fixed capacity.

    ``use_size_threshold`` may be traced (bool scalar): the reference enables
    size pruning only after the first opacity reset (train.py:163).
    """
    p = state.params
    c = p.capacity
    alive = state.alive

    grads = state.grad_accum / state.denom
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)      # ref: gaussian_model.py:413-414

    scaling = get_scaling(p)
    max_scale = jnp.max(scaling, axis=1)
    opacity = get_opacity(p)[:, 0]

    grad_ok = grads >= grad_threshold
    small = max_scale <= percent_dense * extent
    clone_mask = alive & grad_ok & small                 # ref: :393-397
    split_mask = alive & grad_ok & ~small                # ref: :367-374

    # prune condition for existing rows. The view-space radii term reads the
    # post-postfix (zeroed) max_radii2D in the reference, so it is always
    # False — reproduced deliberately; see module docstring.
    ws_prune = max_scale > 0.1 * extent
    use_st = jnp.asarray(use_size_threshold)
    prune_cond = (opacity < min_opacity) | (use_st & ws_prune)

    keep = alive & ~prune_cond & ~split_mask
    n_pruned = jnp.sum(alive & prune_cond & ~split_mask)

    # --- candidate lists -------------------------------------------------
    clone_create = clone_mask & ~prune_cond
    split_create = split_mask
    n_clone = jnp.sum(clone_create)
    n_split = jnp.sum(split_create)

    clone_src_list = jnp.nonzero(clone_create, size=c, fill_value=0)[0]
    split_src_list = jnp.nonzero(split_create, size=c, fill_value=0)[0]
    free_slots = jnp.nonzero(~keep, size=c, fill_value=c)[0]
    n_free = jnp.sum(~keep)

    r = jnp.arange(c)
    is_clone = r < n_clone
    is_split_a = (r >= n_clone) & (r < n_clone + n_split)
    is_split_b = (r >= n_clone + n_split) & (r < n_clone + 2 * n_split)
    src = jnp.where(
        is_clone, clone_src_list[jnp.clip(r, 0, c - 1)],
        jnp.where(is_split_a, split_src_list[jnp.clip(r - n_clone, 0, c - 1)],
                  split_src_list[jnp.clip(r - n_clone - n_split, 0, c - 1)]))
    is_split_child = is_split_a | is_split_b
    valid_new = is_clone | is_split_child

    n_new = n_clone + 2 * n_split
    n_dropped = jnp.maximum(n_new - n_free, 0)

    # --- new values ------------------------------------------------------
    src_xyz = p.xyz[src]
    src_scale = scaling[src]
    src_quat = p.quat[src]
    eps = jax.random.normal(key, (c, 3))                 # ref: :376-378
    R = quat_to_rotmat(src_quat)
    offset = jnp.einsum('nij,nj->ni', R, eps * src_scale)
    new_xyz = jnp.where(is_split_child[:, None], src_xyz + offset, src_xyz)
    child_log_scale = jnp.log(src_scale / (0.8 * 2))     # ref: :381
    new_log_scale = jnp.where(is_split_child[:, None],
                              child_log_scale, p.log_scale[src])

    # children may themselves violate the prune conditions (the reference
    # prunes right after creating them, ref: :420-425)
    child_max_scale = max_scale[src] / (0.8 * 2)
    child_prune = (opacity[src] < min_opacity) | (use_st & (child_max_scale > 0.1 * extent))
    valid_new = valid_new & ~(is_split_child & child_prune)

    target = jnp.where(valid_new, free_slots[jnp.clip(r, 0, c - 1)], c)

    def place(arr, new_rows):
        return arr.at[target].set(new_rows, mode='drop')

    new_params = GaussianParams(
        xyz=place(p.xyz, new_xyz),
        sh_dc=place(p.sh_dc, p.sh_dc[src]),
        sh_rest=place(p.sh_rest, p.sh_rest[src]),
        log_scale=place(p.log_scale, new_log_scale),
        quat=place(p.quat, p.quat[src]),
        logit_opacity=place(p.logit_opacity, p.logit_opacity[src]),
    )
    new_alive = keep.at[target].set(True, mode='drop')
    # optimizer state of new slots is zeroed (ref: :324-344); slots that were
    # pruned and not refilled also reset so stale moments never leak back in
    changed = new_alive != keep
    reset_rows = changed | (~new_alive & alive)

    def reset(x):
        mask = reset_rows.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, 0.0, x)

    new_m = jax.tree.map(reset, state.m)
    new_v = jax.tree.map(reset, state.v)

    info = DensifyInfo(n_cloned=n_clone, n_split=n_split, n_pruned=n_pruned,
                       n_dropped=n_dropped, n_alive=jnp.sum(new_alive))
    new_state = state._replace(
        params=new_params, alive=new_alive, m=new_m, v=new_v,
        grad_accum=jnp.zeros_like(state.grad_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2D=jnp.zeros_like(state.max_radii2D),
    )
    return new_state, info


def reset_opacity(state: TrainState) -> TrainState:
    """Clamp opacity to <= 0.01 and reset its Adam state
    (ref: gaussian_model.py:226-229, :274-287)."""
    op = get_opacity(state.params)
    new_logit = inverse_sigmoid(jnp.minimum(op, 0.01))
    params = state.params._replace(logit_opacity=new_logit)
    return state._replace(
        params=params,
        m=state.m._replace(logit_opacity=jnp.zeros_like(state.m.logit_opacity)),
        v=state.v._replace(logit_opacity=jnp.zeros_like(state.v.logit_opacity)),
    )


# -------------------------------------------------- capacity management

def compact(state: TrainState, capacity: Optional[int] = None) -> TrainState:
    """Gather alive rows to the front and optionally shrink capacity.

    Host-side (forces a re-jit, like grow_capacity). Used after heavy
    pruning or before serving: the padded dead slots stop costing preprocess
    FLOPs and memory. Order of alive gaussians is preserved.
    """
    alive = np.asarray(state.alive)
    idx = np.flatnonzero(alive)
    n = len(idx)
    if capacity is None:
        capacity = max(1 << int(math.ceil(math.log2(max(n, 1) * 2))), 1024)
    assert capacity >= n
    c = state.capacity
    take = jnp.asarray(np.concatenate([idx, np.zeros(capacity - n, np.int64)]))
    keep = jnp.arange(capacity) < n

    def pick(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == c:
            out = jnp.take(x, take, axis=0)
            mask = keep.reshape((-1,) + (1,) * (out.ndim - 1))
            return jnp.where(mask, out, jnp.zeros_like(out))
        return x

    new = jax.tree.map(pick, state)
    params = new.params._replace(
        quat=new.params.quat.at[n:, 0].set(1.0),
        log_scale=new.params.log_scale.at[n:].set(-10.0),
        logit_opacity=new.params.logit_opacity.at[n:].set(-10.0))
    return new._replace(params=params, alive=keep)


def grow_capacity(state: TrainState, new_capacity: int) -> TrainState:
    """Host-side re-pad of every [C, ...] array (forces one re-jit)."""
    c = state.capacity
    assert new_capacity >= c

    def pad(x):
        if x.ndim >= 1 and x.shape[0] == c:
            cfg = [(0, new_capacity - c)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, cfg)
        return x

    grown = jax.tree.map(pad, state)
    # keep padded quats normalizable
    quat = grown.params.quat.at[c:, 0].set(1.0)
    lsc = grown.params.log_scale.at[c:].set(-10.0)
    lop = grown.params.logit_opacity.at[c:].set(-10.0)
    return grown._replace(params=grown.params._replace(
        quat=quat, log_scale=lsc, logit_opacity=lop))
