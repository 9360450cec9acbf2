"""Neural point renderer: gated-conv UNet with multi-scale input.

reference: nerf/unet.py (2-down/2-up UNet, gated conv blocks, a
3-scale input pyramid concatenated at matching depths, sigmoid output;
instantiated with 3 RGB + 16 feature input channels at
nerf/utils.py:808).

Normalization: the reference uses BatchNorm2d at batch size 1 in train
mode, which normalizes each channel over its spatial extent — i.e.
instance norm with unused running stats. Implemented here as GroupNorm
with one group per channel (identical math, stateless and jit-clean).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _instance_norm(x, name):
    return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5, name=name)(x)


class GatedBlock(nn.Module):
    """features * sigmoid(mask) gating (reference: unet.py:33-60)."""

    out_channels: int
    normalize: bool = True

    @nn.compact
    def __call__(self, x):
        f = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    name="conv_f")(x)
        m = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    name="conv_m")(x)
        out = nn.elu(f) * jax.nn.sigmoid(m)
        if self.normalize:
            out = _instance_norm(out, "norm")
        return out


class RefineUNet(nn.Module):
    """inputs: list of 3 pyramid levels [H, W, C], [H/2, ...], [H/4, ...].

    reference: unet.py:111-172 with feature_scale=4 ->
    filters (16, 32, 64).
    """

    num_input_channels: int = 19   # 3 rgb + 16 point features
    num_output_channels: int = 3
    feature_scale: int = 4

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        f = [x // self.feature_scale for x in (64, 128, 256)]
        nic = self.num_input_channels

        x0 = GatedBlock(f[0], name="start")(inputs[0])

        d1 = nn.avg_pool(x0, (2, 2), strides=(2, 2))
        d1 = GatedBlock(f[1] - nic, name="down1")(d1)
        d1 = jnp.concatenate([d1, inputs[1]], axis=-1)        # [H/2, f1]

        d2 = nn.avg_pool(d1, (2, 2), strides=(2, 2))
        d2 = GatedBlock(f[2] - nic, name="down2")(d2)
        d2 = jnp.concatenate([d2, inputs[2]], axis=-1)        # [H/4, f2]

        # up2: upsample d2 -> f1, cat d1 -> gated conv (no norm)
        u = jax.image.resize(d2, (d2.shape[0] * 2, d2.shape[1] * 2,
                                  d2.shape[2]), "bilinear")
        u = nn.Conv(f[1], (3, 3), padding="SAME", name="up2_conv")(u)
        u = GatedBlock(f[1], normalize=False, name="up2_block")(
            jnp.concatenate([u, d1], axis=-1)
        )

        # up1: upsample -> f0, cat x0
        u = jax.image.resize(u, (u.shape[0] * 2, u.shape[1] * 2, u.shape[2]),
                             "bilinear")
        u = nn.Conv(f[0], (3, 3), padding="SAME", name="up1_conv")(u)
        u = GatedBlock(f[0], normalize=False, name="up1_block")(
            jnp.concatenate([u, x0], axis=-1)
        )

        out = nn.Conv(self.num_output_channels, (1, 1), name="final")(u)
        return jax.nn.sigmoid(out)
