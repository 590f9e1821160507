"""Shared alpha-compositing math for all rasterizer backends.

Encodes the reference blend semantics exactly (ref: SURVEY.md §2.3-N1 render
stage): front-to-back ``C += c * alpha * T; T *= (1 - alpha)`` with
``alpha = min(0.99, opacity * exp(power))``, skip when ``power > 0`` or
``alpha < 1/255``, and per-pixel termination *before* adding the contribution
that would push T below 1e-4 (the CUDA loop sets ``done`` on
``test_T = T*(1-alpha) < 1e-4`` and keeps the pre-update T for background
blending).

Because transmittance is monotonically non-increasing, the frozen "done" T is
recoverable without sequential control flow:

  U_g        = T0 * prod_{h<=g} (1 - alpha_h)        (unfrozen running T)
  w_g        = alpha_g * U_{g-1} * [U_g >= 1e-4]     (contribution weight)
  T_final    = min{ U_g : U_g >= 1e-4 } (incl. U_{-1}=T0)

which turns the per-pixel sequential loop into cumsum/exp — ideal for the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def splat_alpha(packets, px, py):
    """Per-(entry, pixel) alpha.

    packets: [..., G, 10] rows (x, y, ca, cb, cc, opacity, r, g, b, invd)
    px, py: [..., P] pixel coordinates
    Returns alpha [..., G, P].
    """
    dx = packets[..., :, 0:1] - px[..., None, :]
    dy = packets[..., :, 1:2] - py[..., None, :]
    ca = packets[..., :, 2:3]
    cb = packets[..., :, 3:4]
    cc = packets[..., :, 4:5]
    op = packets[..., :, 5:6]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha


def composite_chunk(alpha, rgb, invd, carry_U, carry_Tmin):
    """Composite one depth-ordered chunk of entries into all pixels.

    alpha: [G, P] (already masked to 0 for skipped entries)
    rgb:   [G, 3]
    invd:  [G]
    carry_U:    [P] running (unfrozen) transmittance entering the chunk
    carry_Tmin: [P] running frozen-T tracker
    Returns (color [P,3], invdepth [P], new_U, new_Tmin).
    """
    lg = jnp.log1p(-alpha)                           # [G, P]
    cum = jnp.cumsum(lg, axis=0)
    U = carry_U[None, :] * jnp.exp(cum)              # U after each entry
    U_before = carry_U[None, :] * jnp.exp(cum - lg)
    live = U >= T_EPS
    w = alpha * U_before * live                      # [G, P]
    color = jnp.einsum('gp,gc->pc', w, rgb)
    invdepth = jnp.einsum('gp,g->p', w, invd)
    new_U = U[-1]
    new_Tmin = jnp.minimum(carry_Tmin, jnp.min(jnp.where(live, U, jnp.inf), axis=0))
    return color, invdepth, new_U, new_Tmin
