"""Loss functions for the coarse stage.

reference: nerf/utils.py:417-457 (img/depth/clip losses) and
nerf/utils.py:519-563 (regularizer assembly in train_step). All functions
are jit-friendly; branch gates arrive as traced 0/1 floats so one compiled
step serves front/novel views and both diffusion phases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def img_l1(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (reference: utils.py:417-421)."""
    return jnp.mean(jnp.abs(pred - gt))


def masked_pearson_depth(
    pred_depth: jnp.ndarray, gt_depth: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """1 - Pearson correlation over masked pixels.

    reference: utils.py:423-433 (torchmetrics.PearsonCorrCoef on boolean-
    masked pixels). Static shapes: the mask enters as 0/1 weights; the
    weighted correlation equals the masked correlation exactly.
    """
    p = jnp.nan_to_num(pred_depth.reshape(-1))
    g = gt_depth.reshape(-1)
    w = mask.reshape(-1).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    pm = jnp.sum(p * w) / n
    gm = jnp.sum(g * w) / n
    pc = (p - pm) * w
    gc = (g - gm) * w
    cov = jnp.sum(pc * gc)
    # eps inside each variance keeps the gradient finite when either side
    # is constant (sqrt'(0) is inf; a fresh field renders flat depth)
    denom = jnp.sqrt((jnp.sum(pc * pc) + 1e-8) * (jnp.sum(gc * gc) + 1e-8))
    return 1.0 - cov / denom


def opacity_loss(weights_sum: jnp.ndarray) -> jnp.ndarray:
    """Mean squared pixel alpha (reference: utils.py:519-520)."""
    return jnp.mean(weights_sum**2)


def entropy_loss(weights_sum: jnp.ndarray) -> jnp.ndarray:
    """Binary entropy of pixel alphas, pushing them to 0 or 1
    (reference: utils.py:526-529)."""
    a = jnp.clip(weights_sum, 1e-5, 1.0 - 1e-5)
    return jnp.mean(-a * jnp.log2(a) - (1.0 - a) * jnp.log2(1.0 - a))


def clip_cosine_loss(z1: jnp.ndarray, z2: jnp.ndarray) -> jnp.ndarray:
    """Negative cosine similarity of (already encoded) feature vectors
    (reference: utils.py:436-453)."""
    z1 = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    z2 = z2 / jnp.linalg.norm(z2, axis=-1, keepdims=True)
    return -jnp.mean(jnp.sum(z1 * z2, axis=-1))


def resize_bilinear(
    img: jnp.ndarray, out_hw, align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize for [H, W, C] (or [H, W]) arrays.

    torch F.interpolate semantics, both align_corners variants
    (the reference mixes them: utils.py:551 uses True, sd.py:124 False).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    OH, OW = out_hw

    def coords(out_n, in_n):
        i = jnp.arange(out_n, dtype=jnp.float32)
        if align_corners:
            if out_n == 1:
                return jnp.zeros((1,), jnp.float32)
            return i * (in_n - 1) / (out_n - 1)
        c = (i + 0.5) * in_n / out_n - 0.5
        return jnp.clip(c, 0.0, in_n - 1)

    ys = coords(OH, H)
    xs = coords(OW, W)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]

    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return out[..., 0] if squeeze else out
