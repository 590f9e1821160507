"""Training state over the channel-major packed parameter block.

The hot training path (gradients, Adam moments, updates) runs on ONE
[R, C] f32 array per state tensor (see core/packed.py for why: TPU (8,128)
tiling makes the reference-shaped [C,K,3] pytree leaves pay up to 40x lane
padding on every read/write). Cold operations — densify/prune every 100
iterations, opacity reset every 3000, checkpoint/PLY IO, eval renders —
convert to the reference-shaped :class:`TrainState` and reuse its exact
semantics (models/gaussian_model.py), so the behavioral contract
(ref: scene/gaussian_model.py, train.py:157-167) is tested once.

``PackedState.params`` is a convenience property that unpacks on access —
existing cold-path call sites (PLY save, viewer, TensorBoard histograms)
keep working unchanged.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.gaussians import GaussianParams, inverse_sigmoid
from ..core.packed import (PackedLayout, layout, lr_rows, pack_params,
                           unpack_params)
from ..config import OptimizationConfig
from .gaussian_model import (ADAM_B1, ADAM_B2, ADAM_EPS, TrainState,
                             densify_and_prune, grow_capacity, compact)


def degree_from_rows(rows: int) -> int:
    """Recover the SH degree from the padded row count (unique for 0..3)."""
    for d in range(5):
        if layout(d).rows == rows:
            return d
    raise ValueError(f"no SH degree maps to {rows} packed rows")


class PackedState(NamedTuple):
    packed: jnp.ndarray         # [R, C] parameters (channel-major)
    alive: jnp.ndarray          # [C] bool
    m: jnp.ndarray              # [R, C] Adam first moment
    v: jnp.ndarray              # [R, C] Adam second moment
    step: jnp.ndarray           # [] int32 shared Adam step
    grad_accum: jnp.ndarray     # [C]
    denom: jnp.ndarray          # [C]
    max_radii2D: jnp.ndarray    # [C] int32
    exposure: jnp.ndarray       # [num_images, 3, 4]
    exp_m: jnp.ndarray
    exp_v: jnp.ndarray
    exp_step: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.packed.shape[1]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)

    @property
    def sh_degree(self) -> int:
        return degree_from_rows(self.packed.shape[0])

    @property
    def params(self) -> GaussianParams:
        return unpack_params(self.packed, self.sh_degree)


def pack_state(ts: TrainState) -> PackedState:
    return PackedState(
        packed=pack_params(ts.params), alive=ts.alive,
        m=pack_params(ts.m), v=pack_params(ts.v),
        step=ts.step, grad_accum=ts.grad_accum, denom=ts.denom,
        max_radii2D=ts.max_radii2D, exposure=ts.exposure,
        exp_m=ts.exp_m, exp_v=ts.exp_v, exp_step=ts.exp_step)


def unpack_state(ps: PackedState) -> TrainState:
    d = ps.sh_degree
    return TrainState(
        params=unpack_params(ps.packed, d), alive=ps.alive,
        m=unpack_params(ps.m, d), v=unpack_params(ps.v, d),
        step=ps.step, grad_accum=ps.grad_accum, denom=ps.denom,
        max_radii2D=ps.max_radii2D, exposure=ps.exposure,
        exp_m=ps.exp_m, exp_v=ps.exp_v, exp_step=ps.exp_step)


# ---------------------------------------------------------------- hot path

def group_lr_rows(lay: PackedLayout, opt: OptimizationConfig, step,
                  spatial_lr_scale: float) -> jnp.ndarray:
    """[R,1] per-row LRs — packed form of gaussian_model.group_lrs
    (ref: gaussian_model.py:160-191)."""
    from ..utils.schedules import expon_lr
    xyz_lr = expon_lr(step,
                      opt.position_lr_init * spatial_lr_scale,
                      opt.position_lr_final * spatial_lr_scale,
                      lr_delay_mult=opt.position_lr_delay_mult,
                      max_steps=opt.position_lr_max_steps)
    return lr_rows(lay, xyz_lr, opt.feature_lr, opt.feature_lr / 20.0,
                   opt.scaling_lr, opt.rotation_lr, opt.opacity_lr)


def adam_update_packed(ps: PackedState, grad: jnp.ndarray,
                       lr: jnp.ndarray,
                       visible_mask: Optional[jnp.ndarray] = None,
                       valid=None) -> PackedState:
    """Dense Adam (or row-masked sparse Adam) — one fused elementwise pass.

    Same math/constants as gaussian_model.adam_update (eps 1e-15,
    ref: gaussian_model.py:170; sparse row masking ref: train.py:173-175).

    ``valid`` (traced bool scalar): False makes the whole update an EXACT
    no-op (params, moments, AND the step counter). The block-scan's masked
    tail steps gate here, fused into the update's own elementwise pass — a
    post-hoc tree-wide select measured 65 ms/step at the bench shape (it
    keeps the old state alive across the step, forcing full-state copies).
    """
    if valid is None:
        step = ps.step + 1
    else:
        step = ps.step + valid.astype(ps.step.dtype)
    t = step.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** t
    bc2 = 1.0 - ADAM_B2 ** t
    m = ADAM_B1 * ps.m + (1 - ADAM_B1) * grad
    v = ADAM_B2 * ps.v + (1 - ADAM_B2) * grad * grad
    p = ps.packed - lr * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS)
    gate = None
    if visible_mask is not None:
        gate = visible_mask[None, :]
    if valid is not None:
        gate = valid if gate is None else (gate & valid)
    if gate is not None:
        m = jnp.where(gate, m, ps.m)
        v = jnp.where(gate, v, ps.v)
        p = jnp.where(gate, p, ps.packed)
    return ps._replace(packed=p, m=m, v=v, step=step)


def reset_opacity_packed(ps: PackedState) -> PackedState:
    """Packed reset_opacity (ref: gaussian_model.py:226-229, :274-287):
    clamp opacity <= 0.01, zero its Adam rows — pure row elementwise."""
    lay = layout(ps.sh_degree)
    row = jnp.arange(ps.packed.shape[0]) == lay.logit_opacity
    rowf = row.astype(ps.packed.dtype)[:, None]
    op = jax.nn.sigmoid(ps.packed[lay.logit_opacity])
    new_logit = inverse_sigmoid(jnp.minimum(op, 0.01))
    packed = ps.packed * (1 - rowf) + rowf * new_logit[None, :]
    return ps._replace(packed=packed,
                       m=ps.m * (1 - rowf), v=ps.v * (1 - rowf))


# ------------------------------------------------- cold-path delegations

def densify_and_prune_packed(ps: PackedState, key, **kw):
    """Unpack -> reference-semantics densify -> repack (jit-safe; runs every
    densification_interval iterations, so the transposes are amortized)."""
    ts, info = densify_and_prune(unpack_state(ps), key, **kw)
    return pack_state(ts), info


def grow_capacity_packed(ps: PackedState, new_capacity: int) -> PackedState:
    return pack_state(grow_capacity(unpack_state(ps), new_capacity))


def compact_packed(ps: PackedState, capacity: Optional[int] = None) -> PackedState:
    return pack_state(compact(unpack_state(ps), capacity))
