"""SSIM must match the reference torch implementation (utils/loss_utils.py)
to ~1e-6 — same 11x11 sigma-1.5 window, same-padding, same constants."""
import numpy as np
import jax.numpy as jnp
import pytest

from gs_tpu.ops.ssim import ssim


def torch_reference_ssim(a, b, window_size=11, sigma=1.5):
    import torch
    import torch.nn.functional as F
    from math import exp
    img1 = torch.from_numpy(a)[None]
    img2 = torch.from_numpy(b)[None]
    gauss = torch.tensor([exp(-(x - window_size // 2) ** 2 / (2 * sigma ** 2))
                          for x in range(window_size)])
    gauss = (gauss / gauss.sum()).float()
    _1d = gauss.unsqueeze(1)
    _2d = _1d.mm(_1d.t()).unsqueeze(0).unsqueeze(0)
    channel = img1.size(-3)
    window = _2d.expand(channel, 1, window_size, window_size).contiguous()
    mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=channel)
    mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(m.mean())


def test_ssim_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 64, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_reference_ssim(a, b)
    assert abs(ours - ref) < 2e-6, (ours, ref)


def test_ssim_identical_images():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-6)
