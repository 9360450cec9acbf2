"""Parity tests for the fused ReLU-MLP Pallas kernel (interpret mode on
CPU) against its pure-jnp twin and against jax autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.ops.pallas.fused_mlp import (
    OUT_PAD, fused_relu_mlp, relu_mlp_reference,
)

DIN, H, NH = 128, 64, 3
M = 64


def make_params(key):
    ks = jax.random.split(key, 6)
    w0 = jax.random.normal(ks[0], (DIN, H)) * 0.2
    b0 = jax.random.normal(ks[1], (H,)) * 0.1
    wh = jax.random.normal(ks[2], (NH, H, H)) * 0.2
    bh = jax.random.normal(ks[3], (NH, H)) * 0.1
    wo = jax.random.normal(ks[4], (H, OUT_PAD)) * 0.2
    bo = jax.random.normal(ks[5], (OUT_PAD,)) * 0.1
    return w0, b0, wh, bh, wo, bo


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    e = jax.random.normal(jax.random.PRNGKey(1), (M, DIN))
    return params, e


def test_forward_parity(setup):
    params, e = setup
    out_k, ge_k = fused_relu_mlp(*params, e, with_grad=True,
                                 compute_dtype=jnp.float32)
    out_r, ge_r = relu_mlp_reference(*params, e, with_grad=True)
    np.testing.assert_allclose(out_k, out_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ge_k, ge_r, rtol=1e-5, atol=1e-5)


def test_forward_parity_nograd(setup):
    params, e = setup
    (out_k,) = fused_relu_mlp(*params, e, with_grad=False,
                              compute_dtype=jnp.float32)
    (out_r,) = relu_mlp_reference(*params, e, with_grad=False)
    np.testing.assert_allclose(out_k, out_r, rtol=1e-5, atol=1e-5)


def test_ge_matches_autodiff(setup):
    """The in-kernel gradient chain == jax.vjp of the forward."""
    params, e = setup

    def out0(e):
        (out,) = relu_mlp_reference(*params, e, with_grad=False)
        return jnp.sum(out[:, 0])

    ge_auto = jax.grad(out0)(e)
    _, ge_k = fused_relu_mlp(*params, e, with_grad=True,
                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(ge_k, ge_auto, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_grad", [False, True])
def test_param_grads_match_autodiff(setup, with_grad):
    """Hand-derived backward (incl. the double-backprop terms through
    the gradient chain) == jax autodiff of the reference twin."""
    params, e = setup
    key = jax.random.PRNGKey(2)
    c_out = jax.random.normal(key, (M, OUT_PAD))
    c_ge = jax.random.normal(jax.random.fold_in(key, 1), (M, DIN))

    def loss_kernel(*p):
        outs = fused_relu_mlp(*p, e, with_grad=with_grad,
                              compute_dtype=jnp.float32)
        l = jnp.sum(outs[0] * c_out)
        if with_grad:
            l = l + jnp.sum(outs[1] * c_ge)
        return l

    def loss_ref(*p):
        outs = relu_mlp_reference(*p, e, with_grad=with_grad)
        l = jnp.sum(outs[0] * c_out)
        if with_grad:
            l = l + jnp.sum(outs[1] * c_ge)
        return l

    gk = jax.grad(loss_kernel, argnums=tuple(range(6)))(*params)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*params)
    names = ["w0", "b0", "wh", "bh", "wo", "bo"]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-4,
            err_msg=f"param grad mismatch: {n} (with_grad={with_grad})")


def test_multi_tile_accumulation(setup):
    """Weight grads accumulate correctly across >1 grid tiles."""
    params, _ = setup
    e = jax.random.normal(jax.random.PRNGKey(3), (4 * 16, DIN))
    c_out = jax.random.normal(jax.random.PRNGKey(4), (4 * 16, OUT_PAD))

    def loss_kernel(*p):
        (out,) = fused_relu_mlp(*p, e, with_grad=False, tile=16,
                                compute_dtype=jnp.float32)
        return jnp.sum(out * c_out)

    def loss_ref(*p):
        (out,) = relu_mlp_reference(*p, e, with_grad=False)
        return jnp.sum(out * c_out)

    gk = jax.grad(loss_kernel, argnums=(0, 2, 4))(*params)
    gr = jax.grad(loss_ref, argnums=(0, 2, 4))(*params)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
