"""Folder semantic-segmentation CLI (standalone DPT tool).

Equivalent of the reference's `DPT/run_segmentation.py`: run the
DPT-hybrid ADE20K segmentation model over every image in a folder and
write palette-colored overlay PNGs. The model is the flax
DPTSegmentationModel (models/dpt.py); inference is one jitted forward
per fixed 480x480 input shape (images are square-resized to the
network size — NOTE: this distorts aspect ratio, unlike the reference's
keep-aspect Resize — so every image reuses the same compiled program;
the torch original pays per-image dynamic shapes instead).

CLI: python -m makeit3d_tpu.tools.segmentation -i in_dir -o out_dir -m seg.pt
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp


def run(input_dir: str, output_dir: str, weights: str,
        net_size: int = 480, num_classes: int = 150) -> list:
    """reference: DPT/run_segmentation.py:18-116 run()."""
    import cv2

    from ..models.dpt import (
        DPTSegmentationModel,
        interpolate_bilinear,
        load_dpt_seg_params,
    )
    from ..utils.palette import write_segm_img

    cfg, params = load_dpt_seg_params(weights, num_classes=num_classes)
    model = DPTSegmentationModel(cfg, num_classes=num_classes)

    @jax.jit
    def forward(p, x):
        return model.apply({"params": p}, x)

    os.makedirs(output_dir, exist_ok=True)
    names = sorted(
        n for n in glob.glob(os.path.join(input_dir, "*"))
        if os.path.isfile(n)
    )
    written = []
    for ind, name in enumerate(names):
        print(f"  processing {name} ({ind + 1}/{len(names)})")
        bgr = cv2.imread(name)
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        H, W = rgb.shape[:2]
        # normalize (mean 0.5, std 0.5) and resize to the network input
        # (reference: run_segmentation.py:52-66)
        x = jnp.asarray(rgb)[None]
        x = interpolate_bilinear(x, net_size, net_size, align_corners=False)
        x = (x - 0.5) / 0.5
        logits = forward(params, x)  # [1, h, w, K]
        logits = interpolate_bilinear(logits, H, W, align_corners=False)
        # reference: argmax + 1 (class ids are 1-based, :104)
        labels = np.asarray(jnp.argmax(logits[0], axis=-1)) + 1
        stem = os.path.splitext(os.path.basename(name))[0]
        written.append(
            write_segm_img(os.path.join(output_dir, stem), rgb, labels)
        )
    print("finished")
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_path", default="input")
    p.add_argument("-o", "--output_path", default="output_semseg")
    p.add_argument("-m", "--model_weights", required=True,
                   help="DPT-hybrid ADE20K weights (.pt or HF dir)")
    p.add_argument("--net_size", type=int, default=480)
    args = p.parse_args(argv)
    run(args.input_path, args.output_path, args.model_weights,
        net_size=args.net_size)


if __name__ == "__main__":
    main()
