"""Pallas composite (hand-derived VJP, raymarching.cu:655-667 form) vs the
XLA closed-form composite and its autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.ops.composite import composite_rays
from makeit3d_tpu.ops.pallas.composite import composite_rays_pallas


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    N, S = 512, 96
    sigmas = jnp.asarray(rng.uniform(0, 30, (N, S)).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (N, S, 3)).astype(np.float32))
    dts = jnp.asarray(rng.uniform(0.001, 0.02, (N, S)).astype(np.float32))
    rdts = jnp.asarray(rng.uniform(0.001, 0.05, (N, S)).astype(np.float32))
    valid = np.ones((N, S), bool)
    valid[: N // 2, 60:] = False      # tail-invalid prefix masks
    valid[N // 4] = False             # a fully-empty ray
    valid = jnp.asarray(valid)
    dts = jnp.where(valid, dts, 0.0)
    rdts = jnp.where(valid, rdts, 0.0)
    return sigmas, rgbs, dts, rdts, valid


def test_forward_matches_xla(data):
    sigmas, rgbs, dts, rdts, valid = data
    ref = composite_rays(sigmas, rgbs, dts, rdts, valid, T_thresh=1e-4)
    ws, depth, image = composite_rays_pallas(sigmas, rgbs, dts, rdts, valid,
                                             1e-4, 256)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ref.weights_sum),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(image), np.asarray(ref.image),
                               rtol=1e-5, atol=1e-6)
    assert float(ws.max()) > 0.9  # dense sigmas saturate


def test_hand_derived_backward_matches_autodiff(data):
    sigmas, rgbs, dts, rdts, valid = data
    g_ws = jnp.asarray(np.random.default_rng(1).normal(size=(512,)),
                       jnp.float32)
    g_d = jnp.asarray(np.random.default_rng(2).normal(size=(512,)),
                      jnp.float32)
    g_img = jnp.asarray(np.random.default_rng(3).normal(size=(512, 3)),
                        jnp.float32)

    def loss_xla(s, r):
        out = composite_rays(s, r, dts, rdts, valid, T_thresh=1e-4)
        return (jnp.sum(out.weights_sum * g_ws) + jnp.sum(out.depth * g_d)
                + jnp.sum(out.image * g_img))

    def loss_pal(s, r):
        ws, depth, image = composite_rays_pallas(s, r, dts, rdts, valid,
                                                 1e-4, 256)
        return (jnp.sum(ws * g_ws) + jnp.sum(depth * g_d)
                + jnp.sum(image * g_img))

    gs_x, gr_x = jax.grad(loss_xla, argnums=(0, 1))(sigmas, rgbs)
    gs_p, gr_p = jax.grad(loss_pal, argnums=(0, 1))(sigmas, rgbs)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(gs_p).max()) > 0
