"""Tensor-parallel sharding of the frozen guidance towers (parallel/tp.py).

SURVEY.md §2.3 "TPU-native mapping": the frozen SD UNet can be
replicated or tensor-sharded with pjit. These tests shard a tiny random
UNet (SURVEY §4: guidance faked with a tiny random UNet) over the
8-device virtual CPU mesh and check the partitioned program agrees with
the replicated one — forward AND the SDS-style backward to the latents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.models.sd.unet import tiny_unet
from makeit3d_tpu.parallel.tp import (
    make_tp_mesh,
    shard_guidance_params,
    sharded_fraction,
    tp_param_shardings,
)


@pytest.fixture(scope="module")
def towers():
    unet = tiny_unet()
    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    params = unet.init(key, latents, jnp.asarray(500.0), ctx)
    return unet, params, latents, ctx


def test_tp_forward_matches_replicated(towers):
    unet, params, latents, ctx = towers
    eps_ref = unet.apply(params, latents, jnp.asarray(500.0), ctx)

    mesh = make_tp_mesh(8)
    shardings = tp_param_shardings(params, mesh)
    # the tiny UNet's channel dims (32/64/128) divide 8: most bytes shard
    assert sharded_fraction(params, shardings) > 0.5
    tp_params = shard_guidance_params(params, mesh)

    # at least one kernel physically lives in 8 pieces
    leaves = [x for x in jax.tree.leaves(tp_params) if x.ndim >= 2]
    assert any(len(x.addressable_shards) == 8
               and x.addressable_shards[0].data.size < x.size
               for x in leaves)

    fwd = jax.jit(lambda p, z, c: unet.apply(p, z, jnp.asarray(500.0), c))
    eps_tp = fwd(tp_params, latents, ctx)
    np.testing.assert_allclose(
        np.asarray(eps_tp), np.asarray(eps_ref), rtol=2e-5, atol=2e-5)


def test_tp_latent_grad_matches_replicated(towers):
    """The SDS backward differentiates through the UNet to the latents
    (guidance/sd.py single-backward reformulation); the TP program must
    produce the same latent gradient."""
    unet, params, latents, ctx = towers

    def loss(p, z):
        eps = unet.apply(p, z, jnp.asarray(300.0), ctx)
        return jnp.sum(eps ** 2)

    g_ref = jax.grad(loss, argnums=1)(params, latents)

    mesh = make_tp_mesh(8)
    tp_params = shard_guidance_params(params, mesh)
    g_tp = jax.jit(jax.grad(loss, argnums=1))(tp_params, latents)
    np.testing.assert_allclose(
        np.asarray(g_tp), np.asarray(g_ref), rtol=5e-5, atol=5e-5)


def test_tp_specs_divisibility_fallback():
    """Indivisible dims must fall back to replication, never error."""
    mesh = make_tp_mesh(8)
    params = {"odd": {"kernel": jnp.zeros((7, 13))},
              "bias": jnp.zeros((13,))}
    sh = tp_param_shardings(params, mesh)
    assert all(all(ax is None for ax in s.spec)
               for s in jax.tree.leaves(
                   sh, is_leaf=lambda x: hasattr(x, "spec")))
