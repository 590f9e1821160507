"""Evaluation CLI — TPU equivalent of the reference ``metrics.py``.

Usage: ``python -m gs_tpu.apps.metrics -m <model_dir> [...]``

Walks ``<model>/test/ours_<it>/{renders,gt}``, computes SSIM / PSNR (and
LPIPS-vgg when weights are available locally — torchvision and its pretrained
weights are not vendored in this environment, see gs_tpu/ops/lpips.py), and
writes ``results.json`` + ``per_view.json`` (ref: metrics.py:24-103).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.losses import psnr as psnr_fn
from ..ops.ssim import ssim as ssim_fn


def read_images(renders_dir: str, gt_dir: str):
    """ref: metrics.py:24-34 (readImages)."""
    from PIL import Image
    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        with Image.open(os.path.join(renders_dir, fname)) as r:
            renders.append(np.asarray(r.convert("RGB"), np.float32) / 255.0)
        with Image.open(os.path.join(gt_dir, fname)) as g:
            gts.append(np.asarray(g.convert("RGB"), np.float32) / 255.0)
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths: list[str], use_lpips: bool = True):
    """ref: metrics.py:36-93 (evaluate)."""
    lpips_fn = None
    if use_lpips:
        try:
            from ..ops.lpips import lpips_vgg
            lpips_fn = lpips_vgg()
        except Exception as e:
            print(f"LPIPS unavailable ({e}); reporting SSIM/PSNR only")

    jit_ssim = jax.jit(ssim_fn)
    full_dict, per_view_dict = {}, {}
    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full_dict[scene_dir] = {}
        per_view_dict[scene_dir] = {}
        test_dir = os.path.join(scene_dir, "test")
        for method in sorted(os.listdir(test_dir)):
            print("Method:", method)
            method_dir = os.path.join(test_dir, method)
            renders, gts, names = read_images(
                os.path.join(method_dir, "renders"),
                os.path.join(method_dir, "gt"))
            ssims, psnrs, lpipss = [], [], []
            for r, g, name in zip(renders, gts, names):
                rc = jnp.asarray(r.transpose(2, 0, 1))
                gc = jnp.asarray(g.transpose(2, 0, 1))
                ssims.append(float(jit_ssim(rc, gc)))
                psnrs.append(float(psnr_fn(rc[None], gc[None])[0, 0]))
                if lpips_fn is not None:
                    lpipss.append(float(lpips_fn(rc, gc)))
            print(f"  SSIM : {np.mean(ssims):>12.7f}")
            print(f"  PSNR : {np.mean(psnrs):>12.7f}")
            if lpipss:
                print(f"  LPIPS: {np.mean(lpipss):>12.7f}")
            entry = {"SSIM": float(np.mean(ssims)),
                     "PSNR": float(np.mean(psnrs))}
            views = {"SSIM": dict(zip(names, map(float, ssims))),
                     "PSNR": dict(zip(names, map(float, psnrs)))}
            if lpipss:
                entry["LPIPS"] = float(np.mean(lpipss))
                views["LPIPS"] = dict(zip(names, map(float, lpipss)))
            full_dict[scene_dir][method] = entry
            per_view_dict[scene_dir][method] = views
        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict[scene_dir], f, indent=True)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view_dict[scene_dir], f, indent=True)
    return full_dict


def main(argv=None):
    parser = argparse.ArgumentParser(description="Metrics script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+",
                        type=str)
    parser.add_argument("--no_lpips", action="store_true")
    args = parser.parse_args(argv)
    evaluate(args.model_paths, use_lpips=not args.no_lpips)


if __name__ == "__main__":
    main()
