"""Image fidelity metrics (PSNR / SSIM) for the render-quality harness.

The driver target is "within ~1 dB PSNR of reference renders"
(BASELINE.md). The reference repo computes no metrics itself (its
Trainer's PSNRMeter is instantiated but never fed in the 3D pipeline,
nerf/utils.py:153-178); this module backs scripts/fidelity.py and the
round-over-round comparisons recorded in BASELINE.md.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB. Inputs in [0, data_range]."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' convolution over the two leading axes."""
    from numpy.lib.stride_tricks import sliding_window_view

    out = sliding_window_view(img, k.size, axis=0)
    out = np.tensordot(out, k, axes=([-1], [0]))
    out = sliding_window_view(out, k.size, axis=1)
    return np.tensordot(out, k, axes=([-1], [0]))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Structural similarity (Wang et al. 2004), 11x11 Gaussian window.

    a, b: [H, W] or [H, W, C] in [0, data_range]; channels averaged.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mx = _filter2d_sep(x, k)
        my = _filter2d_sep(y, k)
        mxx = _filter2d_sep(x * x, k)
        myy = _filter2d_sep(y * y, k)
        mxy = _filter2d_sep(x * y, k)
        vx = mxx - mx * mx
        vy = myy - my * my
        cxy = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx * mx + my * my + c1) * (vx + vy + c2)
        )
        vals.append(float(s.mean()))
    return float(np.mean(vals))
