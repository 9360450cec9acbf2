"""Truncated exponential (density activation).

Both forward and backward clamp x at 15 (reference: activation.py:5-18
clamps only the BACKWARD at 15 and leaves the forward as a raw exp).
The forward clamp is a deliberate TPU-robustness deviation: a sigma
logit past ~88 overflows f32 exp to inf, which NaNs the composited
render, which NaNs every gradient — and the non-finite-update guard
(optax.apply_if_finite) then skips every subsequent step, leaving
training permanently dead with finite-but-saturated params (observed:
results/results/teddy_fourier_r2 step 576, fourier 128^2 at max LR).
Clamping the forward at 15 is visually identity — density e^15 = 3.3e6
makes alpha = 1 for any dt >= 1e-5 — and the GRADIENT is bit-identical
to the reference for every x (exp(min(x, 15))), so saturated regions
keep exactly the reference's recovery pressure.

Implemented as a jax.custom_jvp so it composes with jit/vmap/grad.
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    return jnp.exp(jnp.minimum(x, 15.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(jnp.minimum(x, 15.0))
    return y, dx * y
