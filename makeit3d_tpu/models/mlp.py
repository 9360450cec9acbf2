"""Small MLP blocks for the NeRF fields (flax.linen).

reference: nerf/network_tcnn.py:13-32 (plain ReLU MLP) and
nerf/network.py:14-86 (ResBlock/BasicBlock MLP for the vanilla backbone).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class ReluMLP(nn.Module):
    """num_layers dense layers with ReLU between (not after the last)."""

    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            is_last = layer == self.num_layers - 1
            x = nn.Dense(
                self.dim_out if is_last else self.dim_hidden,
                dtype=self.dtype,
                name=f"dense_{layer}",
            )(x)
            if not is_last:
                x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """dense -> LayerNorm -> +skip -> SiLU (reference: network.py:14-42)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Dense(self.dim_out, dtype=self.dtype)(x)
        out = nn.LayerNorm(dtype=self.dtype)(out)
        if x.shape[-1] != self.dim_out:
            identity = nn.Dense(self.dim_out, use_bias=False, dtype=self.dtype)(x)
        return nn.silu(out + identity)


class ResMLP(nn.Module):
    """BasicBlock -> (ResBlock x N-2) -> Dense (reference: network.py:61-86)."""

    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.dim_hidden, dtype=self.dtype)(x))
        for _ in range(self.num_layers - 2):
            x = ResBlock(self.dim_hidden, dtype=self.dtype)(x)
        return nn.Dense(self.dim_out, dtype=self.dtype)(x)
