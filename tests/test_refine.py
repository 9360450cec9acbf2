"""Refine-stage tests: point-cloud construction from fabricated coarse
artifacts and the optimization step (rasterize -> UNet -> losses)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.cameras import circle_poses, ViewSampler
from makeit3d_tpu.config import Config


def make_mvimg(tmp_path, n_views=5, H=64, W=64):
    """Fabricate a coarse-stage orbit artifact set: a disk of constant
    depth on every view."""
    import cv2

    d = str(tmp_path / "mvimg")
    os.makedirs(d, exist_ok=True)
    poses = []
    for i in range(n_views):
        phi = -60 + i * 30.0
        _, _, p = circle_poses(radius=1.0, theta=90.0, phi=phi)
        poses.append(p[0])
        yy, xx = np.mgrid[0:H, 0:W]
        disk = ((xx - W / 2) ** 2 + (yy - H / 2) ** 2) < (H * 0.3) ** 2
        depth = np.where(disk, 0.8, 0.0)
        cv2.imwrite(os.path.join(d, f"df_{i:04d}_depth.png"),
                    (depth * 1000).astype(np.uint16))
        cv2.imwrite(os.path.join(d, f"df_{i:04d}_mask.png"),
                    (disk * 255).astype(np.uint8))
        cv2.imwrite(os.path.join(d, f"df_{i:04d}_rgb.png"),
                    np.full((H, W, 3), 180, np.uint8))
    np.save(os.path.join(d, "df_poses.npy"), np.stack(poses))
    return d


def test_zbuffer_and_backproject_roundtrip():
    from makeit3d_tpu.training.point_cloud import (
        backproject_depth, project, zbuffer_visible,
    )

    H = W = 64
    focal = 0.5 * H / np.tan(np.deg2rad(10))
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    _, _, poses = circle_poses(radius=1.0, theta=90.0, phi=0.0)
    c2w = poses[0]
    depth = np.full((H, W), 0.9)
    mask = np.ones((H, W))
    pts = backproject_depth(depth, mask, c2w, K)
    assert pts.shape == (H * W, 3)
    # reproject: depth must round-trip
    xy, z = project(pts, K, np.linalg.inv(c2w)[:3, :4])
    np.testing.assert_allclose(z[:, 0], 0.9, rtol=1e-5)
    # all points visible (one per pixel)
    vis = zbuffer_visible(pts, np.linalg.inv(c2w), H, W, K)
    assert vis.mean() > 0.99

    # duplicate the cloud pushed back: the far copy must be culled
    far = pts + (pts - c2w[:3, 3]) * 0.5
    both = np.concatenate([pts, far])
    vis = zbuffer_visible(both, np.linalg.inv(c2w), H, W, K)
    assert vis[: len(pts)].mean() > 0.99
    assert vis[len(pts):].mean() < 0.01


def test_build_point_cloud_from_artifacts(tmp_path):
    from makeit3d_tpu.training.point_cloud import build_point_cloud
    from makeit3d_tpu.training.refine import RefineStage, intrinsics

    H = W = 64
    d = make_mvimg(tmp_path, H=H, W=W)
    cfg = Config(H=H, W=W, workspace=str(tmp_path))
    stage = RefineStage(cfg, workspace=str(tmp_path))
    K = intrinsics(cfg.fov, H, W)
    gt = np.full((H, W, 3), 0.7)
    v_cano, c_cano, v_novel, c_novel = build_point_cloud(
        d, gt, H, W, K, stage.render_mask_fn(H, W, K)
    )
    assert len(v_cano) > 50
    assert c_cano.shape == (len(v_cano), 3)
    assert np.isfinite(v_cano).all() and np.isfinite(v_novel).all()
    # canonical points lie roughly in the unit box
    assert np.abs(v_cano).max() < 1.5


def test_refine_step_updates_params(tmp_path):
    from makeit3d_tpu.training.refine import RefineStage

    cfg = Config(H=64, W=64, workspace=str(tmp_path))
    stage = RefineStage(cfg, workspace=str(tmp_path))
    rng = np.random.default_rng(0)
    v_cano = rng.uniform(-0.3, 0.3, (200, 3))
    c_cano = rng.uniform(0, 1, (200, 3))
    v_novel = rng.uniform(-0.3, 0.3, (100, 3))
    c_novel = rng.uniform(0, 1, (100, 3))
    params, optimizer, opt_state, anchors = stage.init_state(
        v_cano, c_cano, v_novel, c_novel
    )
    step_front, fwd = stage.build_step(optimizer, True, 64, 64, cfg.fov)

    _, _, poses = circle_poses(radius=1.0, theta=90.0, phi=0.0)
    w2c = jnp.asarray(np.linalg.inv(poses[0]), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    mask = jnp.ones((64, 64))
    p2, _, metrics, pred = step_front(
        params, opt_state, w2c, jax.random.PRNGKey(0), gt, mask,
        None, None, anchors, {},
    )
    assert np.isfinite(float(metrics["loss"]))
    assert pred.shape == (64, 64, 3)
    delta = sum(float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)))
    assert delta > 0


def test_contextual_loss_basic():
    from makeit3d_tpu.models.vgg import ContextualLoss, contextual_loss

    # the CX math: identical feature sets beat mismatched ones
    fa = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 16))
    fb = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16))
    same = float(contextual_loss(fa, fa))
    diff = float(contextual_loss(fa, fb))
    assert np.isfinite(same) and np.isfinite(diff)
    assert same < diff

    # the VGG-wrapped loss: finite value and gradient (random VGG init;
    # real weights load via Config.vgg_weights)
    cx = ContextualLoss()
    a = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(3), (64, 64, 3))
    assert np.isfinite(float(cx(a, b)))
    g = jax.grad(lambda x: cx(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_refine_unet_shapes():
    from makeit3d_tpu.models.unet_refine import RefineUNet

    unet = RefineUNet(num_input_channels=19)
    key = jax.random.PRNGKey(0)
    pyr = [jnp.zeros((64, 64, 19)), jnp.zeros((32, 32, 19)),
           jnp.zeros((16, 16, 19))]
    params = unet.init(key, pyr)["params"]
    out = unet.apply({"params": params}, pyr)
    assert out.shape == (64, 64, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
