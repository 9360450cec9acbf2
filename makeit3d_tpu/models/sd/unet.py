"""UNet2DConditionModel (Stable Diffusion epsilon-prediction UNet) in flax.

Equivalent of the diffusers UNet the reference loads (reference:
nerf/sd.py:53, forward at sd.py:146). Default hyperparameters are the
SD 2.x-base configuration: 4-ch latents, block channels (320, 640, 1280,
1280), 2 layers/block, cross-attention dim 1024, 64-dim attention heads,
linear transformer projections. SD 1.5 is expressible with
cross_attention_dim=768, head_dims=(40, 80, 160, 160) style settings.

Layout: NHWC. Names mirror the diffusers state dict for weight porting.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


class UNet2DConditionModel(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_heads: Sequence[int] = (5, 10, 20, 20)  # dim_head = ch // heads
    use_linear_projection: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states):
        """sample: [B, H, W, C_in]; timesteps: [] or [B];
        encoder_hidden_states: [B, L, cross_attention_dim]."""
        ch = self.block_out_channels
        B = sample.shape[0]
        t = jnp.broadcast_to(jnp.asarray(timesteps), (B,))
        temb = timestep_embedding(t, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(temb)
        ctx = encoder_hidden_states

        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample)
        hs = [h]

        # ---- down: 3x CrossAttnDownBlock2D + 1x DownBlock2D ----
        n_blocks = len(ch)
        for i, c in enumerate(ch):
            has_attn = i < n_blocks - 1
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    heads = self.attention_heads[i]
                    h = Transformer2D(
                        heads, c // heads, 1, self.cross_attention_dim,
                        self.use_linear_projection, dtype=self.dtype,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(h, ctx)
                hs.append(h)
            if i < n_blocks - 1:
                h = Downsample2D(c, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
                hs.append(h)

        # ---- mid ----
        heads = self.attention_heads[-1]
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(heads, ch[-1] // heads, 1, self.cross_attention_dim,
                          self.use_linear_projection, dtype=self.dtype,
                          name="mid_block_attentions_0")(h, ctx)
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_1")(h, temb)

        # ---- up: 1x UpBlock2D + 3x CrossAttnUpBlock2D ----
        rev = list(reversed(ch))  # (1280, 1280, 640, 320)
        for i, c in enumerate(rev):
            has_attn = i > 0
            for j in range(self.layers_per_block + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(c, dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    heads = self.attention_heads[n_blocks - 1 - i]
                    h = Transformer2D(
                        heads, c // heads, 1, self.cross_attention_dim,
                        self.use_linear_projection, dtype=self.dtype,
                        name=f"up_blocks_{i}_attentions_{j}",
                    )(h, ctx)
            if i < n_blocks - 1:
                h = Upsample2D(c, dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(h)

        h = nn.GroupNorm(32, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


def sd2_base_unet(dtype=jnp.float32) -> UNet2DConditionModel:
    return UNet2DConditionModel(dtype=dtype)


def sd15_unet(dtype=jnp.float32) -> UNet2DConditionModel:
    return UNet2DConditionModel(
        cross_attention_dim=768,
        attention_heads=(8, 8, 8, 8),
        use_linear_projection=False,
        dtype=dtype,
    )


def tiny_unet(dtype=jnp.float32) -> UNet2DConditionModel:
    """Random-weight miniature for pipeline tests (SURVEY.md §4: guidance
    can be faked with a tiny random UNet)."""
    return UNet2DConditionModel(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_heads=(2, 4),
        dtype=dtype,
    )
