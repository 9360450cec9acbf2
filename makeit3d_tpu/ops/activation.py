"""Truncated-gradient exponential.

Forward is exp(x); the backward clamps x at 15 so the gradient cannot
overflow (reference: activation.py:5-18, used for density activation).
Implemented as a jax.custom_jvp so it composes with jit/vmap/grad.
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(x)
    return y, dx * jnp.exp(jnp.minimum(x, 15.0))
