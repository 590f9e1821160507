"""LPIPS architecture validation against a torch replica of the reference.

Real LPIPS weights are not obtainable in this environment (no egress, no
torchvision), so the network has never been run with them — but the
ARCHITECTURE can still be proven: build the reference's exact pipeline
(lpipsPyTorch/modules/networks.py VGG16 target_layers [4,9,16,23,30] =
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 taps, z-score on raw input,
unit-normalized activations, bias-free 1x1 lin heads, spatial mean, layer
sum — lpips.py:31-36) in torch.nn.functional with fixed random weights, and
require the JAX port to match on random images.
"""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gs_tpu.ops import lpips as L


def _make_random_weights(rng):
    arrays = {}
    cin = 3
    conv_idx = 0
    for c in L.VGG16_CFG:
        if c == "M":
            continue
        arrays[f"conv{conv_idx}_w"] = rng.normal(
            0, 0.05, (c, cin, 3, 3)).astype(np.float32)
        arrays[f"conv{conv_idx}_b"] = rng.normal(0, 0.05, (c,)).astype(
            np.float32)
        cin = c
        conv_idx += 1
    for i, nc in enumerate(L.TAP_CHANNELS):
        arrays[f"lin{i}"] = np.abs(rng.normal(0, 0.1, (1, nc))).astype(
            np.float32)
    return arrays


def _torch_lpips(img1, img2, weights):
    """Reference pipeline, verbatim semantics (networks.py + lpips.py)."""
    import torch.nn.functional as F

    mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    std = torch.tensor([.458, .448, .450])[None, :, None, None]

    def features(x):
        x = (x - mean) / std                       # z_score on RAW input
        taps = []
        conv_idx = 0
        for c in L.VGG16_CFG:
            if c == "M":
                taps.append(x)
                x = F.max_pool2d(x, 2, 2)
                continue
            w = torch.from_numpy(weights[f"conv{conv_idx}_w"])
            b = torch.from_numpy(weights[f"conv{conv_idx}_b"])
            x = F.relu(F.conv2d(x, w, b, padding=1))
            conv_idx += 1
        taps.append(x)
        # normalize_activation (utils.py)
        return [t / (torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
                     + 1e-10) for t in taps]

    fx = features(img1[None])
    fy = features(img2[None])
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        lin = torch.from_numpy(weights[f"lin{i}"])[:, :, None, None]
        total = total + F.conv2d(d, lin).mean((2, 3), True)
    return float(total[0, 0, 0, 0])


def test_lpips_matches_torch_reference(rng, tmp_path):
    weights = _make_random_weights(rng)
    npz = tmp_path / "lpips_rand.npz"
    np.savez(npz, **weights)
    f = L.lpips_vgg(str(npz))

    img1 = rng.uniform(0, 1, (3, 64, 96)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(
        np.float32)

    got = float(f(jnp.asarray(img1), jnp.asarray(img2)))
    want = _torch_lpips(torch.from_numpy(img1), torch.from_numpy(img2),
                        weights)
    assert got == pytest.approx(want, rel=1e-4, abs=1e-6)

    # identical images -> 0
    assert float(f(jnp.asarray(img1), jnp.asarray(img1))) == pytest.approx(
        0.0, abs=1e-8)


def test_lpips_missing_weights_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        L.lpips_vgg(str(tmp_path / "absent.npz"))
