"""Segmentation mask palettes and overlay writer.

Equivalent of the reference's `DPT/util/pallete.py` (procedural VOC
bit-shuffle palette + the ADE20K color table) and
`DPT/util/io.py:280-298 write_segm_img` (alpha-blended overlay PNG).
"""

from __future__ import annotations

import numpy as np

# ADE20K 151-entry palette (class 0 = unlabeled), flat [r,g,b, ...] list;
# same table the reference embeds (DPT/util/pallete.py adepallete).
ADE20K_PALETTE = [
    0, 0, 0, 120, 120, 120, 180, 120, 120, 6, 230, 230, 80, 50, 50, 4, 200,
    3, 120, 120, 80, 140, 140, 140, 204, 5, 255, 230, 230, 230, 4, 250, 7,
    224, 5, 255, 235, 255, 7, 150, 5, 61, 120, 120, 70, 8, 255, 51, 255, 6,
    82, 143, 255, 140, 204, 255, 4, 255, 51, 7, 204, 70, 3, 0, 102, 200, 61,
    230, 250, 255, 6, 51, 11, 102, 255, 255, 7, 71, 255, 9, 224, 9, 7, 230,
    220, 220, 220, 255, 9, 92, 112, 9, 255, 8, 255, 214, 7, 255, 224, 255,
    184, 6, 10, 255, 71, 255, 41, 10, 7, 255, 255, 224, 255, 8, 102, 8, 255,
    255, 61, 6, 255, 194, 7, 255, 122, 8, 0, 255, 20, 255, 8, 41, 255, 5,
    153, 6, 51, 255, 235, 12, 255, 160, 150, 20, 0, 163, 255, 140, 140, 140,
    250, 10, 15, 20, 255, 0, 31, 255, 0, 255, 31, 0, 255, 224, 0, 153, 255,
    0, 0, 0, 255, 255, 71, 0, 0, 235, 255, 0, 173, 255, 31, 0, 255, 11, 200,
    200, 255, 82, 0, 0, 255, 245, 0, 61, 255, 0, 255, 112, 0, 255, 133, 255,
    0, 0, 255, 163, 0, 255, 102, 0, 194, 255, 0, 0, 143, 255, 51, 255, 0, 0,
    82, 255, 0, 255, 41, 0, 255, 173, 10, 0, 255, 173, 255, 0, 0, 255, 153,
    255, 92, 0, 255, 0, 255, 255, 0, 245, 255, 0, 102, 255, 173, 0, 255, 0,
    20, 255, 184, 184, 0, 31, 255, 0, 255, 61, 0, 71, 255, 255, 0, 204, 0,
    255, 194, 0, 255, 82, 0, 10, 255, 0, 112, 255, 51, 0, 255, 0, 194, 255,
    0, 122, 255, 0, 255, 163, 255, 153, 0, 0, 255, 10, 255, 112, 0, 143,
    255, 0, 82, 0, 255, 163, 255, 0, 255, 235, 0, 8, 184, 170, 133, 0, 255,
    0, 255, 92, 184, 0, 255, 255, 0, 31, 0, 184, 255, 0, 214, 255, 255, 0,
    112, 92, 255, 0, 0, 224, 255, 112, 224, 255, 70, 184, 160, 163, 0, 255,
    153, 0, 255, 71, 255, 0, 255, 0, 163, 255, 204, 0, 255, 0, 143, 0, 255,
    235, 133, 255, 0, 255, 0, 235, 245, 0, 255, 255, 0, 122, 255, 245, 0,
    10, 190, 212, 214, 255, 0, 0, 204, 255, 20, 0, 255, 255, 255, 0, 0, 153,
    255, 0, 41, 255, 0, 255, 204, 41, 0, 255, 41, 255, 0, 173, 0, 255, 0,
    245, 255, 71, 0, 255, 122, 0, 255, 0, 255, 184, 0, 92, 255, 184, 255, 0,
    0, 133, 255, 255, 214, 0, 25, 194, 194, 102, 255, 0, 92, 0, 255,
]


def voc_palette(num_classes: int = 256) -> np.ndarray:
    """Procedural VOC label colors (reference: pallete.py:28-42
    _get_voc_pallete): label bits are distributed across the RGB
    channels' high bits. Returns [num_classes, 3] uint8."""
    out = np.zeros((num_classes, 3), np.uint8)
    for j in range(num_classes):
        lab, i = j, 0
        r = g = b = 0
        while lab > 0:
            r |= ((lab >> 0) & 1) << (7 - i)
            g |= ((lab >> 1) & 1) << (7 - i)
            b |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
        out[j] = (r, g, b)
    return out


def colorize_labels(labels: np.ndarray, dataset: str = "ade20k") -> np.ndarray:
    """[H, W] int labels -> [H, W, 3] uint8 color mask
    (reference: pallete.py:13-26 get_mask_pallete)."""
    labels = np.asarray(labels)
    if dataset == "ade20k":
        pal = np.asarray(ADE20K_PALETTE, np.uint8).reshape(-1, 3)
        pal = np.concatenate(
            [pal, np.zeros((256 - len(pal), 3), np.uint8)], axis=0
        )
    else:
        pal = voc_palette(256)
    return pal[np.clip(labels, 0, 255).astype(np.int32)]


def write_segm_img(path: str, image: np.ndarray, labels: np.ndarray,
                   dataset: str = "ade20k", alpha: float = 0.5) -> str:
    """Blend the color mask over the image and write a PNG
    (reference: DPT/util/io.py:280-298). `path` has no extension;
    image is [H, W, 3] float in [0, 1]; labels is [H, W] int."""
    import cv2

    mask = colorize_labels(labels, dataset).astype(np.float32)
    img = np.asarray(image, np.float32) * 255.0
    out = np.clip(img * (1 - alpha) + mask * alpha, 0, 255).astype(np.uint8)
    full = path + ".png"
    cv2.imwrite(full, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    return full
