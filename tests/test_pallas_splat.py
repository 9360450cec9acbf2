"""Pallas point-splat kernel vs the XLA tile path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.ops.point_raster import render_points


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    N = 2000
    points = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    feats = rng.uniform(0, 1, (N, 7)).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0  # camera at z=-2 looking +z
    H = W = 64
    f = 80.0
    Kmat = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return (jnp.asarray(points), jnp.asarray(feats), jnp.asarray(w2c),
            jnp.asarray(Kmat), H, W)


def test_pallas_matches_xla_forward(scene):
    points, feats, w2c, Kmat, H, W = scene
    bg = jnp.asarray(np.linspace(0, 1, 7), jnp.float32)
    out_x = render_points(points, feats, w2c, Kmat, H, W, bg_features=bg,
                          use_pallas=False)
    out_p = render_points(points, feats, w2c, Kmat, H, W, bg_features=bg,
                          use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_p.alpha),
                               np.asarray(out_x.alpha), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=1e-4)
    # something actually rendered
    assert float(out_x.alpha.max()) > 0.5


def test_pallas_matches_xla_feature_grads(scene):
    points, feats, w2c, Kmat, H, W = scene
    bg = jnp.zeros((7,))
    gimg = jnp.asarray(
        np.random.default_rng(1).normal(size=(H, W, 7)), jnp.float32
    )

    def loss(f, pallas):
        out = render_points(points, f, w2c, Kmat, H, W, bg_features=bg,
                            use_pallas=pallas)
        return jnp.sum(out.image * gimg)

    g_x = jax.grad(lambda f: loss(f, False))(feats)
    g_p = jax.grad(lambda f: loss(f, True))(feats)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(g_p).max()) > 0
