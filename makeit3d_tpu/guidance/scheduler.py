"""DDIM noise scheduler (Stable Diffusion flavor).

Equivalent of the diffusers DDIMScheduler the reference loads
(reference: nerf/sd.py:55-63): scaled-linear betas 0.00085->0.012 over
1000 train timesteps, epsilon prediction, eta=0 deterministic steps.
Pure-array implementation; every method is jit-safe with traced t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DDIMScheduler(NamedTuple):
    alphas_cumprod: jnp.ndarray  # [T]
    num_train_timesteps: int = 1000
    final_alpha_cumprod: float = 1.0  # used when prev_t < 0

    @staticmethod
    def create(
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        set_alpha_to_one: bool = False,
    ) -> "DDIMScheduler":
        if beta_schedule == "scaled_linear":
            betas = (
                np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps)
                ** 2
            )
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps)
        else:
            raise ValueError(beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
        return DDIMScheduler(
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            num_train_timesteps=num_train_timesteps,
            final_alpha_cumprod=final,
        )

    def add_noise(self, x0, noise, t):
        """x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps; t traced int."""
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def sds_weight(self, t):
        """w(t) = 1 - alpha_cumprod_t (reference: sd.py:164-166)."""
        return 1.0 - self.alphas_cumprod[t]

    def step(self, eps_pred, t, x_t, num_inference_steps: int | None = None):
        """One deterministic DDIM step x_t -> x_{t-prev} (eta = 0).

        With num_inference_steps == num_train_timesteps (the reference's
        single-denoise branch, sd.py:154-156) prev_t = t - 1.
        """
        n = num_inference_steps or self.num_train_timesteps
        stride = self.num_train_timesteps // n
        prev_t = t - stride
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )
        x0_pred = (x_t - jnp.sqrt(1.0 - a_t) * eps_pred) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0_pred + jnp.sqrt(1.0 - a_prev) * eps_pred

    def timesteps(self, num_inference_steps: int):
        """Descending sampling schedule (diffusers 'leading' spacing with
        steps_offset=1, the SD default)."""
        stride = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * stride).round()[::-1].astype(np.int64)
        return np.minimum(ts + 1, self.num_train_timesteps - 1)  # steps_offset
