"""Reference-image preprocessing.

reference: main.py:155-214 — load RGBA, resize to 512, composite onto
white, erode the alpha mask, run monocular depth, median-filter the
disparity, invert and normalize to [0.1, 1.0] outside the mask.

The DPT depth model is optional (weights may be absent in a zero-egress
environment); callers may pass a precomputed disparity instead.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def load_ref_image(path: str, size: int = 512):
    """RGBA image -> (ref_rgba [1,512,512,4] in [0,1], ori_rgb composited
    onto white [1,512,512,3]). reference: main.py:182-185."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.shape[-1] == 3:
        alpha = np.full(img.shape[:2] + (1,), 255, img.dtype)
        img = np.concatenate([img, alpha], axis=-1)
    img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
    rgba = img.astype(np.float32)[None] / 255.0
    rgb, a = rgba[..., :3], rgba[..., 3:]
    ori = rgb * a + (1.0 - a)
    return rgba, ori


def erode_mask(alpha: np.ndarray, ksize: int = 5, iterations: int = 1):
    """Eroded background mask: True where background.
    reference: main.py:187-194 (5x5 erode then invert)."""
    import cv2

    kernel = np.ones((ksize, ksize), np.uint8)
    a = np.asarray(alpha)
    if a.ndim == 3:
        a = a[..., 0]
    eroded = cv2.erode(a, kernel, iterations=iterations)
    return eroded == 0


def normalize_depth(
    disparity: np.ndarray, bg_mask: np.ndarray, median_size: int = 5
) -> np.ndarray:
    """Disparity -> normalized depth in [0.1, 1.0] on the object;
    background pixels are forced to depth 1.0 pre-normalization and thus
    map to 0.1 (the reference's exact formula, main.py:212-214 — only
    the object-masked Pearson loss ever consumes this, so the
    bg-looks-nearest quirk is inert). The reference's 16-bit PNG
    round-trip is replaced by direct normalization; the median filter is
    kept."""
    from scipy.ndimage import median_filter

    disp = np.asarray(disparity, np.float64)
    rng = disp.max() - disp.min()
    disp = (disp - disp.min()) / (rng if rng > 0 else 1.0)
    disp = median_filter(disp, size=median_size)
    depth = 1.0 / np.maximum(disp, 1e-2)
    bg = np.asarray(bg_mask, bool)
    depth = depth * (~bg) + np.ones_like(depth) * bg
    depth = ((depth - 1.0) / max(depth.max() - 1.0, 1e-8)) * 0.9 + 0.1
    return depth.astype(np.float32)


def estimate_depth(
    ori_rgb: np.ndarray, dpt_weights: Optional[str] = None
) -> np.ndarray:
    """Monocular disparity for the reference view.

    With DPT weights available, runs the flax DPT port; otherwise falls
    back to an alpha-based heuristic (flat disparity on the object) so
    the pipeline stays runnable end-to-end without pretrained weights.
    """
    if dpt_weights is not None:
        from ..models.dpt import dpt_disparity

        return dpt_disparity(ori_rgb, dpt_weights)
    # heuristic fallback: luminance-modulated flat disparity
    rgb = np.asarray(ori_rgb)[0] if ori_rgb.ndim == 4 else np.asarray(ori_rgb)
    lum = rgb.mean(-1)
    return (0.6 + 0.4 * (1.0 - lum)).astype(np.float32)
