"""CLIP text and vision transformers (flax).

Covers every CLIP use in the reference with one configurable
implementation:
  - SD 2.x text encoder (OpenCLIP ViT-H text tower: 23 layers, width
    1024, gelu) — reference: nerf/sd.py:43.
  - SD 1.5 text encoder (CLIP ViT-L text: 12 layers, width 768,
    quick_gelu).
  - ViT-B/16 image+text model for the trainer's CLIP losses —
    reference: nerf/utils.py:248, 436-453.
  - ViT-L/14 vision towers — reference: nerf/sd.py:44-45.

Names mirror the HF transformers CLIP state dict for weight porting.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# image preprocessing constants (reference: nerf/utils.py:323-326)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    act: str = "quick_gelu"
    projection_dim: Optional[int] = 512  # None: no text projection


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    act: str = "quick_gelu"
    projection_dim: Optional[int] = 512


SD2_TEXT_CONFIG = CLIPTextConfig(width=1024, layers=23, heads=16,
                                 act="gelu", projection_dim=None)
SD15_TEXT_CONFIG = CLIPTextConfig(width=768, layers=12, heads=12,
                                  act="quick_gelu", projection_dim=None)
VIT_B16 = (CLIPTextConfig(), CLIPVisionConfig())
VIT_L14 = (
    CLIPTextConfig(width=768, heads=12, projection_dim=768),
    CLIPVisionConfig(patch_size=14, width=1024, layers=24, heads=16,
                     projection_dim=768),
)


class CLIPMLP(nn.Module):
    width: int
    act: str

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.width * 4, name="fc1")(x)
        # exact erf GELU: torch F.gelu default, used by OpenCLIP / the
        # SD2 text encoder (flax's default approximate=True is tanh)
        h = quick_gelu(h) if self.act == "quick_gelu" else nn.gelu(
            h, approximate=False)
        return nn.Dense(self.width, name="fc2")(h)


class CLIPAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal: bool):
        B, L, _ = x.shape
        hd = self.width // self.heads
        q = nn.Dense(self.width, name="q_proj")(x)
        k = nn.Dense(self.width, name="k_proj")(x)
        v = nn.Dense(self.width, name="v_proj")(x)
        q = q.reshape(B, L, self.heads, hd)
        k = k.reshape(B, L, self.heads, hd)
        v = v.reshape(B, L, self.heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        if causal:
            mask = jnp.tril(jnp.ones((L, L), bool))
            attn = jnp.where(mask[None, None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        return nn.Dense(self.width, name="out_proj")(
            out.reshape(B, L, self.width).astype(x.dtype)
        )


class CLIPLayer(nn.Module):
    width: int
    heads: int
    act: str

    @nn.compact
    def __call__(self, x, causal: bool):
        x = x + CLIPAttention(self.width, self.heads, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x), causal
        )
        x = x + CLIPMLP(self.width, self.act, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        )
        return x


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids):
        """input_ids: [B, 77] -> dict(last_hidden_state, pooled).

        pooled = features at the EOT token (highest token id), as in
        CLIP; projected if projection_dim is set.
        """
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.width, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.width),
        )
        x = tok + pos[None, : input_ids.shape[1]]
        for i in range(c.layers):
            x = CLIPLayer(c.width, c.heads, c.act, name=f"layers_{i}")(
                x, causal=True
            )
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        if c.projection_dim is not None:
            pooled = nn.Dense(c.projection_dim, use_bias=False,
                              name="text_projection")(pooled)
        return {"last_hidden_state": x, "pooled": pooled}


class CLIPVisionModel(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixels):
        """pixels: [B, H, W, 3], already CLIP-normalized ->
        dict(last_hidden_state, pooled [projected])."""
        c = self.cfg
        B = pixels.shape[0]
        patches = nn.Conv(
            c.width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False, name="patch_embedding",
        )(pixels)
        patches = patches.reshape(B, -1, c.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.width)), patches], axis=1
        )
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (n_pos, c.width))
        x = x + pos[None, : x.shape[1]]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(x)
        for i in range(c.layers):
            x = CLIPLayer(c.width, c.heads, c.act, name=f"layers_{i}")(
                x, causal=False
            )
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        if c.projection_dim is not None:
            pooled = nn.Dense(c.projection_dim, use_bias=False,
                              name="visual_projection")(pooled)
        return {"last_hidden_state": x, "pooled": pooled}


def clip_preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1] -> resized + normalized (reference:
    utils.py:323-326 T.Resize(224) + T.Normalize(CLIP stats))."""
    from ...training.losses import resize_bilinear

    x = jax.vmap(lambda im: resize_bilinear(im, (size, size),
                                            align_corners=False))(images)
    return (x - CLIP_MEAN) / CLIP_STD
