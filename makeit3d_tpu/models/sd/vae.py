"""AutoencoderKL (the SD VAE) in flax.

Equivalent of the diffusers AutoencoderKL the reference loads
(reference: nerf/sd.py:41, used at sd.py:201-220 for encode/decode with
the 0.18215 latent scale). Channel layout is NHWC throughout (TPU conv
layout); callers pass images as [B, H, W, 3] in [-1, 1].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Downsample2D, ResnetBlock2D, Upsample2D, VaeAttention

SD_LATENT_SCALE = 0.18215


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, use_time_emb=False, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(ch) - 1:
                h = Downsample2D(c, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
        h = ResnetBlock2D(ch[-1], use_time_emb=False, dtype=self.dtype,
                          name="mid_block_resnets_0")(h)
        h = VaeAttention(ch[-1], dtype=self.dtype,
                         name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(ch[-1], use_time_emb=False, dtype=self.dtype,
                          name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock2D(ch[0], use_time_emb=False, dtype=self.dtype,
                          name="mid_block_resnets_0")(h)
        h = VaeAttention(ch[0], dtype=self.dtype,
                         name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(ch[0], use_time_emb=False, dtype=self.dtype,
                          name="mid_block_resnets_1")(h)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, use_time_emb=False, dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(ch) - 1:
                h = Upsample2D(c, dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels,
                               latent_channels=self.latent_channels,
                               dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels,
                               latent_channels=self.latent_channels,
                               dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B,H,W,3] in [-1,1] -> (mean, logvar) of the latent posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, key) -> jnp.ndarray:
        """Sample the posterior and apply the SD latent scale
        (reference: sd.py:212-220)."""
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return z * SD_LATENT_SCALE

    def decode(self, z) -> jnp.ndarray:
        """Latents -> image in [-1, 1] (reference: sd.py:201-210)."""
        z = z / SD_LATENT_SCALE
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        z = self.encode(x, key)
        return self.decode(z)
