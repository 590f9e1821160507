"""Generate the committed LPIPS tap fixture (lpips_taps.npz).

Runs the TORCH replica of the reference's lpipsPyTorch pipeline
(ref: lpipsPyTorch/modules/networks.py, lpips.py) with deterministic random
weights (seed-regenerated — committing full VGG16 weights would be ~59 MB)
and records strided slices of every normalized tap activation plus the final
LPIPS value. The regression test (tests/test_lpips.py::test_lpips_tap_fixture)
replays the JAX port against these arrays WITHOUT needing torch, so future
refactors cannot drift silently.

Regenerate ONLY deliberately:  python tests/golden/gen_lpips_fixture.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

SEED = 123
H, W = 32, 48
TAP_STRIDES = (7, 3, 5)   # (channel, y, x) strides for the committed slices


def torch_taps_and_value(img1, img2, weights):
    """Reference pipeline in torch.nn.functional, tap outputs included."""
    import torch
    import torch.nn.functional as F
    from gs_tpu.ops import lpips as L

    mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    std = torch.tensor([.458, .448, .450])[None, :, None, None]

    def features(x):
        x = (x - mean) / std
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
        return [t / (torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
                     + 1e-10) for t in taps]

    f1 = features(torch.from_numpy(img1)[None])
    f2 = features(torch.from_numpy(img2)[None])
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (a - b) ** 2
        lin = torch.from_numpy(weights[f"lin{i}"])[:, :, None, None]
        total = total + F.conv2d(d, lin).mean((2, 3), True)
    return f1, f2, float(total[0, 0, 0, 0])


def main():
    from utils import lpips_random_weights

    weights = lpips_random_weights(SEED)
    rng = np.random.default_rng(SEED + 1)
    img1 = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(
        np.float32)

    f1, f2, value = torch_taps_and_value(img1, img2, weights)
    cs, ys, xs = TAP_STRIDES
    out = {"img1": img1, "img2": img2, "value": np.float32(value),
           "seed": np.int64(SEED)}
    for i, (a, b) in enumerate(zip(f1, f2)):
        out[f"tap{i}_a"] = a.numpy()[0, ::cs, ::ys, ::xs]
        out[f"tap{i}_b"] = b.numpy()[0, ::cs, ::ys, ::xs]

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "lpips_taps.npz")
    np.savez_compressed(path, **out)
    size = os.path.getsize(path) / 1024
    print(f"wrote {path} ({size:.0f} KiB), lpips={value:.6f}")


if __name__ == "__main__":
    main()
