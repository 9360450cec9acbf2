"""Adan optimizer semantics (reference: optimizer.py:23-325 + the
trainer's AMP GradScaler skip behavior, utils.py:309,983-986)."""

import jax
import jax.numpy as jnp
import numpy as np

from makeit3d_tpu.config import Config
from makeit3d_tpu.training.optimizer import make_lr_schedule, make_optimizer


def _setup(optim="adan"):
    cfg = Config(guidance="none", optim=optim)
    opt = make_optimizer(cfg, make_lr_schedule(cfg))
    params = {
        "hash_table": jnp.ones((4, 8, 2)) * 0.5,
        "dense": {"kernel": jnp.ones((3, 3))},
    }
    return cfg, opt, params, opt.init(params)


def test_adan_step_moves_params():
    _, opt, params, state = _setup()
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new)):
        assert float(jnp.sum(jnp.abs(a - b))) > 0


def test_nonfinite_grads_are_skipped():
    """GradScaler parity: a NaN/inf gradient step must be a no-op and the
    next finite step must work."""
    _, opt, params, state = _setup()
    bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    updates, state = opt.update(bad, state, params)
    for u in jax.tree.leaves(updates):
        np.testing.assert_allclose(np.asarray(u), 0.0)
    good = jax.tree.map(jnp.ones_like, params)
    updates, state = opt.update(good, state, params)
    assert all(float(jnp.sum(jnp.abs(u))) > 0 for u in jax.tree.leaves(updates))
    assert all(np.all(np.isfinite(u)) for u in jax.tree.leaves(updates))


def test_hash_table_lr_is_10x():
    """Encoder params train at 10x lr (reference: network_tcnn.py:195-205)."""
    _, opt, params, state = _setup()
    grads = jax.tree.map(jnp.ones_like, params)
    # clip bound: use small grads to avoid global-norm clipping skew
    grads = jax.tree.map(lambda g: g * 1e-3, grads)
    updates, _ = opt.update(grads, state, params)
    u_hash = float(jnp.mean(jnp.abs(updates["hash_table"])))
    u_dense = float(jnp.mean(jnp.abs(updates["dense"]["kernel"])))
    np.testing.assert_allclose(u_hash / u_dense, 10.0, rtol=1e-3)


def test_grad_norm_clipping_bounds_updates():
    """max_grad_norm=5: huge grads must produce the same update as
    rescaled-to-norm-5 grads (reference: optimizer.py:110-129)."""
    _, opt, params, state = _setup()
    g1 = jax.tree.map(lambda p: jnp.full_like(p, 1e6), params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(g1))))
    g2 = jax.tree.map(lambda g: g * (5.0 / gnorm), g1)
    u1, _ = opt.update(g1, state, params)
    u2, _ = opt.update(g2, opt.init(params), params)
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_adam_fallback():
    _, opt, params, state = _setup(optim="adam")
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    assert all(np.all(np.isfinite(u)) for u in jax.tree.leaves(updates))
