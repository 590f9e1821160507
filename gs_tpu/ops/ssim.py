"""SSIM — reference formula (ref: utils/loss_utils.py:100-159).

11x11 Gaussian window, sigma=1.5, per-channel (grouped) convolution with
same-padding, C1=0.01^2, C2=0.03^2. XLA fuses the separable convolutions into
a handful of kernels; this replaces both the reference's torch SSIM and the
fused-ssim CUDA extension (ref: SURVEY.md §2.3-N3 — must match the reference
SSIM to ~1e-6). Differentiable in both inputs (the fused CUDA op only
backprops img1; autograd here simply also gives img2 grads, which the
training loss never uses).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur_axis(x: jnp.ndarray, win: np.ndarray, axis: int) -> jnp.ndarray:
    """Same-padded 1-D correlation along ``axis`` as K shifted
    multiply-adds. XLA fuses the shifted slices of one padded array into a
    single elementwise pass (stencil fusion), where the grouped
    conv_general_dilated lowering measured ~21 ms per train step at 1080p
    on v5e (channels=3 can't tile the MXU); this form is exact f32 and its
    VJP is the mirrored stencil, equally fused."""
    k = win.shape[0]
    pad = k // 2
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (pad, pad)
    xp = jnp.pad(x, cfg)
    n = x.shape[axis]
    out = None
    for i in range(k):
        term = float(win[i]) * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
        out = term if out is None else out + term
    return out


def _blur(img: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Separable same-padded Gaussian blur; img [C, H, W]."""
    return _blur_axis(_blur_axis(img, win, 1), win, 2)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM of two [C, H, W] images in [0,1]."""
    win = _gaussian_window(window_size)
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu1_mu2
    ssim_map = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) /
                ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    return jnp.mean(ssim_map)
