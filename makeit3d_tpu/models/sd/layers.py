"""Shared diffusion-model blocks (flax.linen).

From-scratch implementations of the blocks the reference consumes via
the diffusers library (reference: nerf/sd.py:2,41-55 loads AutoencoderKL
and UNet2DConditionModel). Submodule names mirror the diffusers state
dict ("down_blocks_0", "to_out_0", ...) so pretrained torch checkpoints
map mechanically (see weights.py).

TPU notes: attention runs as batched einsum matmuls on the MXU with a
bfloat16 compute-dtype option; GroupNorm statistics stay in f32.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, diffusers convention
    (flip_sin_to_cos=True, downscale_freq_shift=0 for SD)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = jnp.asarray(t, jnp.float32)[..., None] * freqs
    # SD UNet uses cos-first ordering
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock2D(nn.Module):
    out_channels: int
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Attention(nn.Module):
    """Multi-head attention over flattened spatial or token axes.

    Covers both self-attention (context=None) and cross-attention.
    """

    heads: int
    dim_head: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)

        scale = 1.0 / math.sqrt(self.dim_head)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, N, inner).astype(x.dtype)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses torch F.gelu (exact erf), not tanh
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.heads, self.dim_head, self.dim,
                          dtype=self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + Attention(self.heads, self.dim_head, self.dim,
                          dtype=self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context
        )
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        )
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 proj_in -> transformer blocks over
    HW tokens -> 1x1 proj_out, residual."""

    heads: int
    dim_head: int
    depth: int
    context_dim: int
    use_linear_projection: bool = True  # SD2 uses linear proj
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        residual = x
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(B, H * W, inner)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.context_dim,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, context)
        if self.use_linear_projection:
            h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, inner)
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class VaeAttention(nn.Module):
    """Single-head attention block used in the VAE mid blocks."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        attn = jnp.einsum("bnc,bmc->bnm", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(C)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        h = jnp.einsum("bnm,bmc->bnc", attn, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        h = nn.Dense(C, dtype=self.dtype, name="to_out_0")(h)
        return x + h.reshape(B, H, W, C)
