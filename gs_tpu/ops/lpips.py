"""LPIPS v0.1 (VGG16 backbone) in pure JAX.

Behavioral port of the reference's self-contained lpipsPyTorch
(ref: lpipsPyTorch/modules/lpips.py, networks.py — VGG16 features at
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-normalized activations,
frozen 1x1 linear heads, input normalization shift/scale constants).

The reference downloads backbone + head weights at runtime (torchvision +
richzhang GitHub); this environment has no egress and no torchvision, so the
weights must be provided as a local ``.npz`` — path via ``$GS_TPU_LPIPS_WEIGHTS``
or ``~/.cache/gs_tpu/lpips_vgg.npz``. :func:`convert_torch_weights` converts
the standard torch checkpoints if you have them on disk. When weights are
absent, callers (metrics CLI) degrade to SSIM/PSNR-only.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# ref: lpipsPyTorch/modules/networks.py (ScalingLayer constants)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv layout: (out_channels per conv, 'M' = maxpool). Feature taps are
# taken right before each pool (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512]
TAP_CHANNELS = [64, 128, 256, 512, 512]


def default_weights_path() -> str:
    return os.environ.get(
        "GS_TPU_LPIPS_WEIGHTS",
        os.path.expanduser("~/.cache/gs_tpu/lpips_vgg.npz"))


def convert_torch_weights(vgg_state_path: str, lin_state_path: str,
                          out_npz: str):
    """Convert torchvision vgg16 ``state_dict`` + richzhang vgg.pth lin heads
    (saved with torch.save) into the npz this module loads."""
    import torch
    vgg = torch.load(vgg_state_path, map_location="cpu")
    lin = torch.load(lin_state_path, map_location="cpu")
    arrays = {}
    conv_idx = 0
    torch_layer = 0
    for c in VGG16_CFG:
        if c == "M":
            torch_layer += 1
            continue
        arrays[f"conv{conv_idx}_w"] = vgg[f"features.{torch_layer}.weight"].numpy()
        arrays[f"conv{conv_idx}_b"] = vgg[f"features.{torch_layer}.bias"].numpy()
        conv_idx += 1
        torch_layer += 2   # conv + relu
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        arrays[f"lin{i}"] = lin[key].numpy()[:, :, 0, 0]  # [1, C]
    os.makedirs(os.path.dirname(os.path.abspath(out_npz)), exist_ok=True)
    np.savez(out_npz, **arrays)


def _vgg_features(x: jnp.ndarray, weights: dict) -> list[jnp.ndarray]:
    """x: [1, 3, H, W] normalized; returns the 5 tap activations."""
    taps = []
    conv_idx = 0
    for c in VGG16_CFG:
        if c == "M":
            taps.append(x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, 2, 2), window_strides=(1, 1, 2, 2),
                padding="VALID")
            continue
        w = weights[f"conv{conv_idx}_w"]          # [O, I, 3, 3]
        b = weights[f"conv{conv_idx}_b"]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + b[None, :, None, None])
        conv_idx += 1
    taps.append(x)
    return taps


def _normalize_act(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=1, keepdims=True))
    return feat / (norm + eps)


def lpips_vgg(weights_path: str | None = None):
    """Returns a jitted ``f(img1 [3,H,W], img2) -> scalar`` in [0,1] inputs.

    Raises FileNotFoundError when the weights npz is absent.
    """
    path = weights_path or default_weights_path()
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {path}; set GS_TPU_LPIPS_WEIGHTS or "
            "run gs_tpu.ops.lpips.convert_torch_weights on the torch "
            "checkpoints")
    loaded = np.load(path)
    weights = {k: jnp.asarray(loaded[k]) for k in loaded.files}

    shift = jnp.asarray(SHIFT)[None, :, None, None]
    scale = jnp.asarray(SCALE)[None, :, None, None]

    @jax.jit
    def f(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        # the reference's vendored lpipsPyTorch z-scores the RAW input
        # (networks.py BaseNet.z_score: (x - shift) / scale, no internal
        # [-1,1] rescale), and metrics.py:74 passes [0,1] images — match
        # that exactly so reported LPIPS is comparable
        x1 = (img1[None] - shift) / scale
        x2 = (img2[None] - shift) / scale
        f1 = _vgg_features(x1, weights)
        f2 = _vgg_features(x2, weights)
        total = jnp.float32(0.0)
        for i, (a, b) in enumerate(zip(f1, f2)):
            d = (_normalize_act(a) - _normalize_act(b)) ** 2   # [1,C,H,W]
            lin = weights[f"lin{i}"]                            # [1, C]
            weighted = jnp.einsum("nchw,oc->nohw", d, lin)
            total = total + jnp.mean(weighted, axis=(2, 3))[0, 0]
        return total

    return f
