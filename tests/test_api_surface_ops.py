"""API-surface kernels: sph_from_ray, SDF compositing, SH encoding.

These mirror reference kernels that sit off the main path but are part of
the kernel API surface (raymarching/src/bindings.cpp:5-23 exposes them;
encoding.py:56-70 dispatches to the stable-dreamfusion encoders).
"""

import jax
import jax.numpy as jnp
import numpy as np

from makeit3d_tpu.ops.composite import composite_rays, composite_sdf_rays
from makeit3d_tpu.ops.encoding import SHEncoder, get_encoder
from makeit3d_tpu.ops.marching import sph_from_ray


def test_sph_from_ray_geometry():
    # ray from origin along +y hits the sphere pole: theta=0 -> coord -1
    o = jnp.zeros((3, 3))
    d = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    c = np.asarray(sph_from_ray(o, d, radius=2.0))
    np.testing.assert_allclose(c[0], [-1.0, 0.0], atol=1e-6)
    # +x: equator theta=pi/2 -> 0; phi=atan2(0,x)=0
    np.testing.assert_allclose(c[1], [0.0, 0.0], atol=1e-6)
    # +z: phi = pi/2 -> 0.5
    np.testing.assert_allclose(c[2], [0.0, 0.5], atol=1e-6)


def test_sph_from_ray_point_on_sphere():
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(16, 3)) * 0.3)
    d = rng.normal(size=(16, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    radius = 1.7
    # reconstruct the intersection point from (theta, phi) and check radius
    c = sph_from_ray(o, d, radius)
    theta = (c[:, 0] + 1.0) * np.pi / 2
    phi = c[:, 1] * np.pi
    p = np.stack(
        [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)],
        axis=-1,
    ) * radius
    # p must lie on the ray: (p - o) parallel to d
    po = p - np.asarray(o)
    po /= np.linalg.norm(po, axis=-1, keepdims=True)
    dots = np.sum(po * np.asarray(d), axis=-1)
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def _serial_sdf_composite(alphas, rgbs, real_dts, valid, T_thresh):
    """Oracle: direct translation of the CUDA loop
    (raymarching.cu:743-770)."""
    N, S = alphas.shape
    ws = np.zeros(N)
    depth = np.zeros(N)
    image = np.zeros((N, rgbs.shape[-1]))
    for n in range(N):
        T, t = 1.0, 0.0
        for s in range(S):
            if not valid[n, s]:
                continue
            a = alphas[n, s]
            w = a * T
            image[n] += w * rgbs[n, s]
            t += real_dts[n, s]
            depth[n] += w * t
            ws[n] += w
            T *= 1.0 - a
            if T < T_thresh:
                break
    return ws, depth, image


def test_composite_sdf_matches_serial_oracle():
    rng = np.random.default_rng(1)
    N, S = 8, 16
    alphas = rng.uniform(0, 0.5, (N, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    rdts = rng.uniform(0.01, 0.1, (N, S)).astype(np.float32)
    valid = np.ones((N, S), bool)
    valid[:, 12:] = False  # tail-invalid like the marcher's prefix masks
    out = composite_sdf_rays(
        jnp.asarray(alphas), jnp.asarray(rgbs), jnp.asarray(rdts),
        jnp.asarray(rdts), jnp.asarray(valid), T_thresh=1e-4,
    )
    ws, depth, image = _serial_sdf_composite(alphas, rgbs, rdts, valid, 1e-4)
    np.testing.assert_allclose(np.asarray(out.weights_sum), ws, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.image), image, rtol=1e-5, atol=1e-6)


def test_composite_sdf_gradients_finite():
    key = jax.random.PRNGKey(0)
    alphas = jax.random.uniform(key, (4, 8), minval=0.0, maxval=0.9)
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 3))
    dts = jnp.full((4, 8), 0.05)
    valid = jnp.ones((4, 8), bool)

    def loss(a, r):
        out = composite_sdf_rays(a, r, dts, dts, valid)
        return jnp.sum(out.image) + jnp.sum(out.depth)

    ga, gr = jax.grad(loss, argnums=(0, 1))(alphas, rgbs)
    assert np.isfinite(np.asarray(ga)).all()
    assert np.isfinite(np.asarray(gr)).all()
    # early-terminated (T < thresh) samples must get zero alpha-gradient
    a2 = jnp.ones((1, 8)) * 0.9999
    g2 = jax.grad(lambda a: jnp.sum(
        composite_sdf_rays(a, jnp.ones((1, 8, 3)), dts[:1], dts[:1],
                           jnp.ones((1, 8), bool)).image
    ))(a2)
    assert float(jnp.abs(g2[0, -1])) < 1e-6


def test_sh_encoder_orthonormal_on_sphere():
    """Real SH up to degree 4 must be orthonormal under the sphere measure
    (Monte-Carlo check) — this pins all 16 polynomial constants."""
    rng = np.random.default_rng(2)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    enc = SHEncoder(degree=4)
    Y = np.asarray(enc(jnp.asarray(d)))  # [M, 16]
    gram = (Y.T @ Y) / d.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_get_encoder_dispatch():
    enc, dim = get_encoder("sphere_harmonics", degree=3)
    assert dim == 9
    out = enc(jnp.asarray([[0.0, 0.0, 1.0]]))
    assert out.shape == (1, 9)
