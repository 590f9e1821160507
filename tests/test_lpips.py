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
import os

import numpy as np
import pytest
import jax.numpy as jnp

from gs_tpu.ops import lpips as L
from utils import lpips_random_weights


def _make_random_weights(rng):
    # legacy shim: the architecture test draws weights from the passed rng
    arrays = lpips_random_weights(int(rng.integers(0, 2 ** 31)))
    return arrays


def _torch_lpips(img1, img2, weights):
    """Reference pipeline, verbatim semantics (networks.py + lpips.py)."""
    import torch
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


@pytest.mark.slow
def test_lpips_matches_torch_reference(rng, tmp_path):
    torch = pytest.importorskip("torch")
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


def test_convert_torch_weights_cli(tmp_path):
    """The one-command converter must map torchvision vgg16 feature indices
    (convs at 0,2,5,7,10,12,14,17,19,21,24,26,28) and richzhang lin-head
    keys onto our npz layout exactly."""
    torch = pytest.importorskip("torch")
    weights = lpips_random_weights(7)
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg = {}
    for ci, ti in enumerate(conv_ids):
        vgg[f"features.{ti}.weight"] = torch.from_numpy(weights[f"conv{ci}_w"])
        vgg[f"features.{ti}.bias"] = torch.from_numpy(weights[f"conv{ci}_b"])
    lin = {f"lin{i}.model.1.weight":
           torch.from_numpy(weights[f"lin{i}"][:, :, None, None])
           for i in range(5)}
    vp, lp = tmp_path / "vgg16.pth", tmp_path / "vgg.pth"
    torch.save(vgg, vp)
    torch.save(lin, lp)
    out = tmp_path / "lpips.npz"
    from gs_tpu.apps.convert_lpips import main as conv_main
    conv_main(["--vgg", str(vp), "--lin", str(lp), "-o", str(out)])
    loaded = np.load(out)
    assert set(loaded.files) == set(weights)
    for k, v in weights.items():
        np.testing.assert_array_equal(loaded[k], v)


@pytest.mark.slow
def test_lpips_tap_fixture(tmp_path):
    """Committed fixture from the torch replica (tests/golden/lpips_taps.npz,
    regenerated only by gen_lpips_fixture.py): every normalized tap
    activation AND the final value must match — catches drift in any single
    stage (conv padding, pool placement, normalization, z-score constants)
    without torch in the loop."""
    import jax
    fx = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "lpips_taps.npz"))
    weights = lpips_random_weights(int(fx["seed"]))
    npz = tmp_path / "w.npz"
    np.savez(npz, **weights)

    img1, img2 = jnp.asarray(fx["img1"]), jnp.asarray(fx["img2"])

    # final value through the public entry point
    f = L.lpips_vgg(str(npz))
    got = float(f(img1, img2))
    assert got == pytest.approx(float(fx["value"]), rel=1e-4, abs=1e-6)

    # per-tap normalized activations (strided slices as committed)
    w = {k: jnp.asarray(v) for k, v in weights.items()}
    shift = jnp.asarray(L.SHIFT)[None, :, None, None]
    scale = jnp.asarray(L.SCALE)[None, :, None, None]
    cs, ys, xs = 7, 3, 5   # gen_lpips_fixture.TAP_STRIDES
    for img, suffix in ((img1, "a"), (img2, "b")):
        taps = L._vgg_features((img[None] - shift) / scale, w)
        for i, t in enumerate(taps):
            t = np.asarray(L._normalize_act(t))[0, ::cs, ::ys, ::xs]
            np.testing.assert_allclose(
                t, fx[f"tap{i}_{suffix}"], rtol=2e-4, atol=2e-5,
                err_msg=f"tap {i} image {suffix}")
