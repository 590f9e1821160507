"""One-command LPIPS weight conversion: torch checkpoints -> gs_tpu npz.

The reference's vendored lpipsPyTorch downloads its weights at runtime
(torchvision vgg16 features + the richzhang v0.1 ``vgg.pth`` linear heads,
ref: lpipsPyTorch/modules/networks.py:50-60). This environment (and many TPU
pods) has no egress, so gs_tpu loads them from a local ``.npz`` instead
(ops/lpips.py). Given the two torch files, this CLI produces that npz:

    gs-tpu-convert-lpips --vgg vgg16-397923af.pth --lin vgg.pth

writes ``~/.cache/gs_tpu/lpips_vgg.npz`` (override with -o or
``$GS_TPU_LPIPS_WEIGHTS``), after which ``gs-tpu-metrics`` reports LPIPS
numbers reference-identical to lpipsPyTorch (same taps, same z-score
constants, same head weights — architecture equality is proven against a
torch replica in tests/test_lpips.py and pinned by the committed tap fixture
tests/golden/lpips_taps.npz).

Where to get the inputs (on a machine with egress):
  vgg16:  https://download.pytorch.org/models/vgg16-397923af.pth
          (or torch.save(torchvision.models.vgg16(weights='IMAGENET1K_V1')
           .state_dict(), 'vgg16.pth'))
  lin:    https://github.com/richzhang/PerceptualSimilarity/raw/master/
          lpips/weights/v0.1/vgg.pth
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--vgg", required=True,
                   help="torchvision vgg16 state_dict .pth")
    p.add_argument("--lin", required=True,
                   help="richzhang LPIPS v0.1 vgg.pth (linear heads)")
    p.add_argument("-o", "--out", default=None,
                   help="output npz (default: $GS_TPU_LPIPS_WEIGHTS or "
                        "~/.cache/gs_tpu/lpips_vgg.npz)")
    p.add_argument("--check", action="store_true",
                   help="after writing, run a JAX-vs-torch LPIPS cross-check "
                        "on random images (requires torch)")
    args = p.parse_args(argv)

    from ..ops.lpips import convert_torch_weights, default_weights_path
    out = args.out or default_weights_path()
    convert_torch_weights(args.vgg, args.lin, out)
    print(f"wrote {out}")

    if args.check:
        import numpy as np
        import jax.numpy as jnp
        from ..ops.lpips import lpips_vgg
        f = lpips_vgg(out)
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        val = float(f(jnp.asarray(a), jnp.asarray(b)))
        print(f"self-check: lpips(random pair) = {val:.6f} "
              f"(identical pair = {float(f(jnp.asarray(a), jnp.asarray(a))):.2e})")


if __name__ == "__main__":
    main()
