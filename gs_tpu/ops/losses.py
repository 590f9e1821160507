"""Loss and image-metric primitives (ref: utils/loss_utils.py:40-66,
utils/image_utils.py:14-19)."""
from __future__ import annotations

import jax.numpy as jnp


def l1_loss(x, gt):
    return jnp.mean(jnp.abs(x - gt))


def l2_loss(x, gt):
    return jnp.mean((x - gt) ** 2)


def mse(img1, img2):
    """Per-image MSE, inputs [B, ...]. ref: utils/image_utils.py:14-15"""
    d = (img1 - img2) ** 2
    return d.reshape(d.shape[0], -1).mean(axis=1, keepdims=True)


def psnr(img1, img2):
    """Per-image PSNR = 20 log10(1/sqrt(MSE)). ref: utils/image_utils.py:17-19"""
    m = mse(img1, img2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))
