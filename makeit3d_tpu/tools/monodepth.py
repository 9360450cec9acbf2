"""Folder monocular-depth CLI.

Flax/TPU port of the reference's standalone DPT runner (reference:
DPT/run_monodepth.py — read a folder of images, run DPT-hybrid, write
16-bit depth PNGs + PFMs). Usage:

    python -m makeit3d_tpu.tools.monodepth -i input_dir -o output_dir \
        -m /path/to/dpt_weights

Writes <name>.png (16-bit, min-max normalized like DPT/util/io.py
write_depth) and <name>.pfm (raw inverse depth) per image.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def run(input_dir: str, output_dir: str, weights: str) -> int:
    import jax
    import jax.numpy as jnp

    from ..models.dpt import (
        DPTDepthModel,
        interpolate_bicubic_align,
        interpolate_bilinear,
        load_dpt_params,
    )
    from ..utils.depth_io import write_depth, write_pfm

    cfg, params = load_dpt_params(weights)
    model = DPTDepthModel(cfg)
    fwd = jax.jit(lambda p, v: model.apply({"params": p}, v))

    os.makedirs(output_dir, exist_ok=True)
    names = sorted(
        p for p in glob.glob(os.path.join(input_dir, "*"))
        if p.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    print(f"[monodepth] {len(names)} images, weights={weights}")
    for i, path in enumerate(names):
        import cv2

        img = cv2.imread(path)
        if img is None:
            print(f"  skip unreadable {path}")
            continue
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        H, W = rgb.shape[:2]
        x = jnp.asarray(rgb)[None]
        x = interpolate_bilinear(x, cfg.image_size, cfg.image_size,
                                 align_corners=False)
        x = (x - 0.5) / 0.5  # reference transform (main.py:119-124)
        pred = fwd(params, x)
        pred = interpolate_bicubic_align(pred[..., None], H, W)[0, ..., 0]
        pred = np.asarray(pred)

        base = os.path.join(
            output_dir, os.path.splitext(os.path.basename(path))[0]
        )
        write_depth(base, pred, bits=2)
        write_pfm(base + ".pfm", pred.astype(np.float32))
        print(f"  [{i + 1}/{len(names)}] {base}.png")
    return len(names)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_path", default="input")
    p.add_argument("-o", "--output_path", default="output_monodepth")
    p.add_argument("-m", "--model_weights", required=True)
    args = p.parse_args(argv)
    run(args.input_path, args.output_path, args.model_weights)


if __name__ == "__main__":
    main()
