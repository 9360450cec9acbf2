"""Standalone DPT tools: segmentation model/palette and the depth-warp
visualizer's camera/resampling math.

Parity oracles: torch F.grid_sample / F.affine_grid for resampling,
cv2.getPerspectiveTransform for homographies (the exact functions the
reference calls in DPT/warp_utils.py), and hand math for rotations.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makeit3d_tpu.utils.transforms3d import (
    FoVPerspectiveCamera,
    euler_angles_to_matrix,
    get_perspective_transform,
    grid_sample,
    identity_grid,
    perspective_transform,
    warp_matrix,
)


def test_euler_angles_to_matrix_axes():
    # 90 deg about Z maps x->y (pytorch3d convention, column action)
    Rz = np.asarray(euler_angles_to_matrix(jnp.asarray([0.0, 0.0, math.pi / 2])))
    np.testing.assert_allclose(Rz @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    Rx = np.asarray(euler_angles_to_matrix(jnp.asarray([math.pi / 2, 0.0, 0.0])))
    np.testing.assert_allclose(Rx @ np.array([0, 1.0, 0]), [0, 0, 1], atol=1e-6)
    # composition order: XYZ = Rx @ Ry @ Rz
    a = jnp.asarray([0.3, -0.2, 0.7])
    R = np.asarray(euler_angles_to_matrix(a))
    Rsep = (
        np.asarray(euler_angles_to_matrix(jnp.asarray([0.3, 0.0, 0.0])))
        @ np.asarray(euler_angles_to_matrix(jnp.asarray([0.0, -0.2, 0.0])))
        @ np.asarray(euler_angles_to_matrix(jnp.asarray([0.0, 0.0, 0.7])))
    )
    np.testing.assert_allclose(R, Rsep, atol=1e-6)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(rng, mode, padding, align):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img = rng.standard_normal((9, 13, 3)).astype(np.float32)
    grid = (rng.random((7, 11, 2)).astype(np.float32) * 2.4 - 1.2)

    ours = np.asarray(
        grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode,
                    padding_mode=padding, align_corners=align)
    )
    t = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode=mode, padding_mode=padding, align_corners=align,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, t, atol=2e-5)


def test_identity_grid_matches_affine_grid():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    for align in (False, True):
        ours = np.asarray(identity_grid(5, 8, align_corners=align))
        theta = torch.tensor([[[1.0, 0, 0], [0, 1.0, 0]]])
        ref = F.affine_grid(theta, [1, 1, 5, 8], align_corners=align)[0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_homography_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")

    src = rng.random((4, 2)).astype(np.float32) * 100
    dst = src + rng.random((4, 2)).astype(np.float32) * 10
    ours = get_perspective_transform(src, dst)
    ref = cv2.getPerspectiveTransform(src, dst)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # warp_matrix maps the image corners onto the projected quad
    M, side = warp_matrix(64, 48, theta=10.0, phi=5.0, gamma=-7.0,
                          scale=1.0, fV=50.0)
    corners = np.array([[0.0, 48.0], [64.0, 48.0], [64.0, 0.0], [0.0, 0.0]])
    corners = corners + [64 / 2 - 32, 48 / 2 - 24]  # pin = pts + [W/2, H/2]
    out = perspective_transform(corners, M)
    assert np.isfinite(out).all() and 0 < side


def test_fov_camera_projection_center_and_depth():
    cam = FoVPerspectiveCamera(0.2, 2.0, aspect_ratio=1.0, fov_degrees=90.0)
    # on-axis point projects to NDC origin; x = z*tan(45) lands at x_ndc=1
    p = cam.transform_points(jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(p)[0, :2], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p)[1, 0], 1.0, atol=1e-5)
    # z_ndc hits 0 at near and 1 at far (pytorch3d convention)
    zn = cam.transform_points(jnp.asarray([[0.0, 0.0, 0.2], [0.0, 0.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(zn)[:, 2], [0.0, 1.0], atol=1e-5)
    # R/T move the camera: translating T=+x shifts projections +x
    cam_t = FoVPerspectiveCamera(0.2, 2.0, 1.0, 90.0, T=jnp.asarray([0.5, 0, 0]))
    pt = cam_t.transform_points(jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(pt)[0, 0], 0.5, atol=1e-5)


def test_warp_identity_pose_is_near_identity(rng):
    """Zero rotation/translation: flow is zero, so the warp reduces to the
    reference's identity resample (affine_grid align=False sampled with
    align=True) — verify against torch doing exactly that."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from makeit3d_tpu.tools.warp_depth import anim_warp_3d

    img = rng.random((16, 20, 3)).astype(np.float32)
    depth = (rng.random((16, 20)).astype(np.float32) + 0.5)

    warped, z = anim_warp_3d(img, depth, {})
    eps = 1.0 / 512 - 1e-4
    grid = F.affine_grid(torch.tensor([[[1.0, 0, 0], [0, 1.0, 0]]]),
                         [1, 1, 16, 20], align_corners=False)
    ref = F.grid_sample(
        torch.from_numpy(img + eps).permute(2, 0, 1)[None], grid,
        mode="bicubic", padding_mode="zeros", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(warped), ref, atol=3e-5)
    # unmoved camera: projected depth is monotone in input depth
    z = np.asarray(z)
    assert z.shape == depth.shape and np.isfinite(z).all()


def test_warp_rotation_shifts_content():
    from makeit3d_tpu.tools.warp_depth import anim_warp_3d, orbit_trajectory

    img = np.zeros((32, 32, 3), np.float32)
    img[12:20, 12:20] = 1.0
    depth = np.full((32, 32), 1.0, np.float32)
    traj = orbit_trajectory(8)
    warped, _ = anim_warp_3d(img, depth, traj[2])
    w = np.asarray(warped)
    assert np.isfinite(w).all()
    # content moved: the warped bright patch centroid differs from input
    def centroid(a):
        m = a[..., 0]
        ys, xs = np.mgrid[: m.shape[0], : m.shape[1]]
        s = m.sum() + 1e-8
        return (ys * m).sum() / s, (xs * m).sum() / s

    c0, c1 = centroid(img), centroid(w)
    assert abs(c0[0] - c1[0]) + abs(c0[1] - c1[1]) > 0.3


def test_warp_depth_fun_shapes():
    from makeit3d_tpu.tools.warp_depth import warp_depth_fun

    depth = np.full((24, 24), 1.0, np.float32)
    out = warp_depth_fun(depth, theta=math.pi / 2, phi=math.radians(20.0))
    out = np.asarray(out)
    assert out.shape == (24, 24) and np.isfinite(out).all()


# ---------------------------------------------------------------------------
# segmentation model + palette
# ---------------------------------------------------------------------------


def test_seg_model_forward_and_bn():
    from makeit3d_tpu.models.dpt import DPTConfig, DPTSegmentationModel

    cfg = DPTConfig.tiny()
    model = DPTSegmentationModel(cfg, num_classes=7)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # BN layers exist in the fusion stage (seg variant only)
    fusion = params["neck"]["fusion_stage.layers_0"]["residual_layer2"]
    assert "bn1" in fusion and set(fusion["bn1"]) == {
        "scale", "bias", "mean", "var"}
    logits = model.apply({"params": params}, x)
    # fused map is half input res; the head's 2x upsample restores full res
    assert logits.shape == (1, cfg.image_size, cfg.image_size, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_frozen_batchnorm_matches_torch(rng):
    torch = pytest.importorskip("torch")

    from makeit3d_tpu.models.dpt import FrozenBatchNorm

    x = rng.standard_normal((2, 4, 4, 6)).astype(np.float32)
    bn = FrozenBatchNorm(6)
    params = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = {
        "scale": jnp.asarray(rng.random(6, dtype=np.float32) + 0.5),
        "bias": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
        "mean": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
        "var": jnp.asarray(rng.random(6, dtype=np.float32) + 0.1),
    }
    ours = np.asarray(bn.apply({"params": params}, jnp.asarray(x)))

    tbn = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        tbn.running_mean.copy_(torch.from_numpy(np.asarray(params["mean"])))
        tbn.running_var.copy_(torch.from_numpy(np.asarray(params["var"])))
        ref = tbn(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_seg_weight_port_roundtrip(rng):
    """running_mean/var keys land in FrozenBatchNorm mean/var slots."""
    from makeit3d_tpu.models.dpt import DPTConfig, DPTSegmentationModel, port_hf_dpt

    cfg = DPTConfig.tiny()
    model = DPTSegmentationModel(cfg, num_classes=3)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )["params"]
    f = cfg.fusion_hidden_size
    mean = rng.standard_normal(f).astype(np.float32)
    var = (rng.random(f) + 0.1).astype(np.float32)
    sd = {
        "neck.fusion_stage.layers.0.residual_layer2.bn1.running_mean": mean,
        "neck.fusion_stage.layers.0.residual_layer2.bn1.running_var": var,
    }
    ported = port_hf_dpt(sd, params)
    got = ported["neck"]["fusion_stage.layers_0"]["residual_layer2"]["bn1"]
    np.testing.assert_allclose(np.asarray(got["mean"]), mean)
    np.testing.assert_allclose(np.asarray(got["var"]), var)


def test_palette_and_overlay(tmp_path, rng):
    from makeit3d_tpu.utils.palette import (
        ADE20K_PALETTE,
        colorize_labels,
        voc_palette,
        write_segm_img,
    )

    assert len(ADE20K_PALETTE) == 151 * 3
    pal = voc_palette(21)
    # VOC classics: background black, class1 maroon, class2 green
    np.testing.assert_array_equal(pal[0], [0, 0, 0])
    np.testing.assert_array_equal(pal[1], [128, 0, 0])
    np.testing.assert_array_equal(pal[2], [0, 128, 0])

    labels = rng.integers(0, 150, size=(8, 8))
    colors = colorize_labels(labels, "ade20k")
    assert colors.shape == (8, 8, 3) and colors.dtype == np.uint8

    img = rng.random((8, 8, 3)).astype(np.float32)
    out = write_segm_img(str(tmp_path / "seg"), img, labels)
    import cv2

    assert cv2.imread(out) is not None
