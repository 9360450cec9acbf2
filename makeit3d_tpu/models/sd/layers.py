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
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Attention implementation dispatch (round-2 verdict item 10).
#
# The einsum path materializes the [B, h, N, M] score matrix in HBM —
# at the SD2 UNet's 64x64 self-attention (N = 4096, 5 heads, CFG batch 2)
# that is ~670 MB of f32 traffic per layer for softmax alone. The fused
# (flash-style) Pallas kernel streams K/V blocks through VMEM and never
# materializes the scores. Eligibility is decided per call site at trace
# time (static shapes):
#   - "einsum": always the reference formulation (CPU tests, parity);
#   - "flash":  force the Pallas kernel (shape asserts inside the kernel);
#   - "auto":   kernel on TPU backends when both sequence axes tile to the
#     128-lane blocks, the problem is big enough to win (N*M >= 1024^2),
#     AND the head dim fills the 128-wide MXU tiles (d >= 128). Measured
#     on v5e (scripts/probe_attention.py, 2026-08-19): the UNet's d=64
#     multi-head shapes run FASTER on einsum (full UNet fwd 32.0 ms vs
#     46.6 ms flash — the kernel's [*, 64] matmuls half-fill the MXU and
#     its fixed overhead never amortizes), while the VAE mid-block's
#     single-head d=512 N=4096 attention is 1.9x faster on flash
#     (92.8 -> 48.8 ms; its einsum materializes a 4096^2 score matrix
#     per ~0 reusable heads). Cross-attention against the 77-token text
#     context always stays on einsum (tiny score matrix).
#
# Grad-path caveat (advisor r3 #5): the VAE mid-block flash win holds
# forward-only; through fwd+bwd the two impls are a measured wash
# (68.4 ms flash vs 66.2 ms einsum, probe_attention.py 2026-08-19).
# _flash_eligible cannot see grad context (trace-time dispatch), so the
# SDS grad path takes flash at that call site — accepted as a wash, not
# a win; flash_attn_flops() in bench.py credits the kernel's FLOPs to
# sds_mfu either way, so the MFU figure is consistent with the dispatch.
# ---------------------------------------------------------------------------
_ATTN_IMPL = [os.environ.get("MAKEIT3D_ATTENTION", "auto")]


def set_attention_impl(impl: str):
    """Select the attention implementation for SUBSEQUENT traces.

    The impl is read at trace time: functions already jitted (and their
    cached executables) keep whatever impl was active when they were
    traced — calling this afterwards is a silent no-op for them. Set it
    before building/jitting the model, or force a retrace (new static
    args / fresh jit) after changing it. bench.py's attempt ladder works
    because each attempt builds a fresh salted step function."""
    assert impl in ("auto", "einsum", "flash"), impl
    _ATTN_IMPL[0] = impl


def get_attention_impl() -> str:
    return _ATTN_IMPL[0]


def _flash_eligible(N: int, M: int, d: int) -> bool:
    impl = _ATTN_IMPL[0]
    if impl == "einsum":
        return False
    if impl == "flash":
        return True
    return (
        jax.default_backend() == "tpu"
        and N % 128 == 0
        and M % 128 == 0
        and N * M >= 1024 * 1024
        and d % 128 == 0
        and d <= 512
    )


def scaled_attention(q, k, v, scale: float, out_dtype):
    """softmax(q k^T * scale) v with implementation dispatch.

    q: [B, N, h, d]; k, v: [B, M, h, d]. Returns [B, N, h*d] in out_dtype.
    """
    B, N, h, d = q.shape
    M = k.shape[1]
    if _flash_eligible(N, M, d):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=scale,
        )
        return out.transpose(0, 2, 1, 3).reshape(B, N, h * d).astype(out_dtype)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, N, h * d).astype(out_dtype)


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
        out = scaled_attention(q, k, v, scale, x.dtype)
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
        # single head of width C; the VAE mid block sits in the SDS grad
        # path, so the flash kernel's hand-written backward runs too.
        # Measured on v5e (docs/TPU_NOTES.md round 3): forward-only flash
        # wins 1.9x here, fwd+bwd is a wash (68.4 ms flash vs 66.2 ms
        # einsum, ~3% — within relay noise), so dispatching the grad path
        # to flash costs nothing measurable and keeps one code path.
        h = scaled_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
            1.0 / math.sqrt(C), x.dtype)
        h = nn.Dense(C, dtype=self.dtype, name="to_out_0")(h)
        return x + h.reshape(B, H, W, C)
