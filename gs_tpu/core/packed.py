"""Channel-major packed parameter block — the TPU training layout.

Training state (params, grads, Adam moments) lives as ONE [R, C] f32 array:
row = scalar parameter channel, column = gaussian. Rationale (measured,
round 2/3): TPU tiles the two minor dims of every array to (8 sublanes, 128
lanes). The reference-shaped pytree leaves ([C,3] xyz, [C,15,3] sh_rest, ...)
put 1-3-wide axes in the lane dimension, so each Adam step reads and writes
up to 40x padding; with channels as ROWS the lane dim is the capacity C
(always a multiple of 128) and the only padding is 59 -> 64 rows.

The reference stores parameters as six torch tensors and pays nothing for
layout because CUDA has no tiled memory (ref: scene/gaussian_model.py:53-58);
this module is the TPU-native equivalent of that storage decision.

Row layout for SH degree d (rest = (d+1)^2 - 1):
    0..2                xyz
    3..5                sh_dc (r, g, b)
    6 .. 6+3*rest-1     sh_rest band k color c at 6 + 3k + c
    then                log_scale (3), quat (4), logit_opacity (1)
    pad to multiple of 8 rows (sublane tiling)

Conversions to/from :class:`GaussianParams` are transposes — used at the
few cold boundaries (init, densify every 100 steps, checkpoint/PLY IO,
eval renders), never in the per-step hot path.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussians import GaussianParams


class PackedLayout(NamedTuple):
    """Static row indices for one SH degree."""
    sh_degree: int
    rest: int        # number of sh_rest bands
    xyz: int         # first xyz row (always 0)
    sh_dc: int
    sh_rest: int
    log_scale: int
    quat: int
    logit_opacity: int
    n_channels: int  # real channels
    rows: int        # padded row count (multiple of 8)


def layout(sh_degree: int) -> PackedLayout:
    rest = (sh_degree + 1) ** 2 - 1
    xyz = 0
    sh_dc = 3
    sh_rest = 6
    log_scale = sh_rest + 3 * rest
    quat = log_scale + 3
    logit_opacity = quat + 4
    n = logit_opacity + 1
    rows = -(-n // 8) * 8
    return PackedLayout(sh_degree, rest, xyz, sh_dc, sh_rest, log_scale,
                        quat, logit_opacity, n, rows)


def pack_params(p: GaussianParams) -> jnp.ndarray:
    """GaussianParams -> [R, C] packed block (transposes; cold path only)."""
    lay = layout(p.sh_degree)
    c = p.capacity
    cols = [p.xyz, p.sh_dc.reshape(c, 3),
            p.sh_rest.reshape(c, 3 * lay.rest),
            p.log_scale, p.quat, p.logit_opacity]
    flat = jnp.concatenate(cols, axis=1)          # [C, n_channels]
    packed = flat.T                               # [n, C]
    pad = lay.rows - lay.n_channels
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad, c), packed.dtype)], axis=0)
    return packed


def unpack_params(packed: jnp.ndarray, sh_degree: int) -> GaussianParams:
    """[R, C] -> GaussianParams (transposes; cold path only)."""
    lay = layout(sh_degree)
    c = packed.shape[1]
    flat = packed[:lay.n_channels].T              # [C, n]
    return GaussianParams(
        xyz=flat[:, lay.xyz:lay.xyz + 3],
        sh_dc=flat[:, lay.sh_dc:lay.sh_dc + 3].reshape(c, 1, 3),
        sh_rest=flat[:, lay.sh_rest:lay.sh_rest + 3 * lay.rest].reshape(
            c, lay.rest, 3),
        log_scale=flat[:, lay.log_scale:lay.log_scale + 3],
        quat=flat[:, lay.quat:lay.quat + 4],
        logit_opacity=flat[:, lay.logit_opacity:lay.logit_opacity + 1],
    )


# ------------------------------------------------------------- row access

@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def read_rows(packed: jnp.ndarray, start: int, n: int, rows_total: int):
    """Differentiable read of rows [start, start+n) as a tuple of [C] arrays.

    The custom VJP materializes the cotangent with ONE stack + pad instead of
    autodiff's n scatter-adds into the padded [R, C] tile grid (each
    single-row dynamic-update-slice read-modify-writes whole (8,128) tiles
    and they serialize). ``rows_total`` must equal packed.shape[0]."""
    return tuple(packed[start + i] for i in range(n))


def _read_rows_fwd(packed, start, n, rows_total):
    assert rows_total == packed.shape[0]
    return read_rows(packed, start, n, rows_total), None


def _read_rows_bwd(start, n, rows_total, res, cts):
    block = jnp.stack(list(cts), axis=0)
    c = block.shape[1]
    top = jnp.zeros((start, c), block.dtype)
    bot = jnp.zeros((rows_total - start - n, c), block.dtype)
    return (jnp.concatenate([top, block, bot], axis=0),)


read_rows.defvjp(_read_rows_fwd, _read_rows_bwd)


def all_channels(packed: jnp.ndarray, sh_degree: int):
    """One differentiable read of every real channel row.

    Returns a dict of flat [C] channels: x, y, z, sh_dc (3), sh_rest
    (list of 3*rest), ls0..2, q0..3, lop. A single read_rows call means the
    whole backward materializes one stacked [R, C] cotangent."""
    lay = layout(sh_degree)
    rows = read_rows(packed, 0, lay.n_channels, packed.shape[0])
    r = lay.sh_rest
    return dict(
        x=rows[0], y=rows[1], z=rows[2],
        sh_dc=rows[lay.sh_dc:lay.sh_dc + 3],
        sh_rest=rows[r:r + 3 * lay.rest],
        ls=rows[lay.log_scale:lay.log_scale + 3],
        quat=rows[lay.quat:lay.quat + 4],
        lop=rows[lay.logit_opacity],
    )


# ------------------------------------------------------- per-row metadata

def lr_rows(lay: PackedLayout, xyz_lr, sh_dc_lr, sh_rest_lr, log_scale_lr,
            quat_lr, logit_opacity_lr) -> jnp.ndarray:
    """[R, 1] per-row learning rates from the six group LRs (traced ok)."""
    segs = [(lay.xyz, 3, xyz_lr), (lay.sh_dc, 3, sh_dc_lr),
            (lay.sh_rest, 3 * lay.rest, sh_rest_lr),
            (lay.log_scale, 3, log_scale_lr), (lay.quat, 4, quat_lr),
            (lay.logit_opacity, 1, logit_opacity_lr)]
    out = jnp.zeros((lay.rows,), jnp.float32)
    for start, n, v in segs:
        mask = (jnp.arange(lay.rows) >= start) & (jnp.arange(lay.rows) < start + n)
        out = out + mask.astype(jnp.float32) * v
    return out[:, None]


def sh_band_index(lay: PackedLayout):
    """Static [R] int vector: full-basis index of each sh_rest row (0 for
    every other row) — used for the traced SH-degree ramp mask."""
    import numpy as np
    idx = np.zeros((lay.rows,), np.int32)
    for k in range(lay.rest):
        for cch in range(3):
            idx[lay.sh_rest + 3 * k + cch] = k + 1
    return jnp.asarray(idx)


def mask_sh_rows(packed: jnp.ndarray, lay: PackedLayout, active_sh_degree):
    """Zero sh_rest rows above the active degree (traced-degree SH ramp).

    Mathematically identical to evaluating the truncated basis; matches
    models/gaussian_model semantics (step.mask_sh_rest)."""
    keep = sh_band_index(lay) < (active_sh_degree + 1) ** 2
    return packed * keep.astype(packed.dtype)[:, None]
