"""Point-cloud construction for the refine stage.

Host/numpy geometry pipeline equivalent to nerf/refine_utils.py:
  - back-project rendered orbit depths into world points (depth2point,
    refine_utils.py:129-152),
  - visibility culling: the reference's serial per-pixel z-buffer loop
    (z_buffer, refine_utils.py:167-208) becomes a vectorized
    segment-min over pixel buckets,
  - multi-view fusion with occlusion tests against the canonical cloud
    (multidepth2point_mask, refine_utils.py:61-127),
  - Canny-edge culling of depth discontinuities (load_views,
    refine_utils.py:335-409).

These run once per asset between the coarse and refine stages; they are
host code by design (the hot refine loop is the rasterizer + UNet).
"""

from __future__ import annotations

import glob
import os

import numpy as np


def project(xyz: np.ndarray, K: np.ndarray, RT: np.ndarray):
    """World -> (pixel xy, camera z). reference: refine_utils.py:154-158."""
    cam = xyz @ RT[:, :3].T + RT[:, 3:].T
    proj = cam @ K.T
    return proj[:, :2] / proj[:, 2:], proj[:, 2:]


def backproject_depth(depth: np.ndarray, mask: np.ndarray, c2w: np.ndarray,
                      K: np.ndarray) -> np.ndarray:
    """Depth map -> world points at masked pixels
    (reference: refine_utils.py:129-139)."""
    H, W = depth.shape
    x, y = np.meshgrid(np.arange(W), np.arange(H))
    pix = np.stack([x.reshape(-1), y.reshape(-1),
                    np.ones(H * W)], axis=0)  # [3, HW]
    rays = (np.linalg.inv(K) @ pix).T  # [HW, 3]
    pts_cam = rays * depth.reshape(-1, 1)
    pts_cam = pts_cam[np.asarray(mask).reshape(-1) == 1]
    return pts_cam @ c2w[:3, :3].T + c2w[:3, 3]


def zbuffer_visible(points: np.ndarray, w2c: np.ndarray, H: int, W: int,
                    K: np.ndarray, tol: float = None) -> np.ndarray:
    """Visibility mask: a point survives if it is within 1/H of the
    nearest point landing on its pixel (vectorized segment-min; the
    reference walks points serially, refine_utils.py:167-208)."""
    if tol is None:
        tol = 1.0 / H
    xy, z = project(points, K, w2c[:3, :4])
    z = z[:, 0]
    xi = np.round(xy[:, 0]).astype(np.int64)
    yi = np.round(xy[:, 1]).astype(np.int64)
    in_frame = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    pix = np.where(in_frame, yi * W + xi, H * W)
    zmin = np.full(H * W + 1, np.inf)
    np.minimum.at(zmin, pix, np.where(in_frame, z, np.inf))
    visible = in_frame & ((z - zmin[pix]) <= tol)
    return visible


def sample_colors(img: np.ndarray, xy: np.ndarray, H: int) -> np.ndarray:
    """Bilinear color sampling at projected pixel coords (the
    reference's grid_sample round-trip, refine_utils.py:111-114).
    img: [H, W, 3]; xy in pixel units."""
    Hh, Ww = img.shape[:2]
    # torch grid_sample(align_corners=False) with grid = xy / H * 2 - 1
    gx = xy[:, 0] / H * 2.0 - 1.0
    gy = xy[:, 1] / H * 2.0 - 1.0
    fx = ((gx + 1.0) * Ww - 1.0) / 2.0
    fy = ((gy + 1.0) * Hh - 1.0) / 2.0
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = fx - x0
    wy = fy - y0

    def at(yy, xx):
        valid = (yy >= 0) & (yy < Hh) & (xx >= 0) & (xx < Ww)
        yy = np.clip(yy, 0, Hh - 1)
        xx = np.clip(xx, 0, Ww - 1)
        return img[yy, xx] * valid[:, None]

    return ((1 - wx)[:, None] * (1 - wy)[:, None] * at(y0, x0)
            + wx[:, None] * (1 - wy)[:, None] * at(y0, x0 + 1)
            + (1 - wx)[:, None] * wy[:, None] * at(y0 + 1, x0)
            + wx[:, None] * wy[:, None] * at(y0 + 1, x0 + 1))


def edge_culled_mask(depth: np.ndarray, mask: np.ndarray,
                     canny_lo: int, canny_hi: int,
                     erode_iters: int = 1) -> np.ndarray:
    """Erode the alpha mask, then cut depth-discontinuity edges
    (reference: refine_utils.py:346-360, 383-395)."""
    import cv2

    kernel = np.ones((11, 11), np.uint8)
    m = cv2.erode(mask.astype(np.float64), kernel, iterations=erode_iters)
    m = m == 1
    # NOTE: np.uint8(depth*255) wraps modulo 256 for metric depth > ~1.0,
    # adding sawtooth rings to the Canny input. This reproduces the
    # reference EXACTLY (refine_utils.py:352-353 does the same cast on
    # metric depth); the 11x11 dilation makes the over-culling mild and
    # the published results absorbed it, so we keep parity.
    blur = np.uint8(depth * m * 255.0)
    edges = cv2.Canny(blur, canny_lo, canny_hi)
    edges = cv2.dilate(edges, kernel, iterations=1) == 255
    return np.logical_and(m, ~edges)


def depth_to_colored_points(depth, mask, c2w, gt_rgb, H, W, K):
    """Canonical-view cloud: back-project + z-buffer cull + colorize
    (reference: depth2point, refine_utils.py:129-152)."""
    v = backproject_depth(depth, mask, c2w, K)
    w2c = np.linalg.inv(c2w)
    vis = zbuffer_visible(v, w2c, H, W, K)
    v = v[vis]
    xy, _ = project(v, K, w2c[:3, :4])
    colors = sample_colors(gt_rgb, xy, H)
    return v, colors


def fuse_novel_views(
    all_depth, all_mask, all_rgb, K, all_c2w,
    cano_points, cano_colors, cano_c2w, cano_depth,
    H, W, render_mask_fn, npoint: int = 1_000_000, rng=None,
):
    """Multi-view fusion with occlusion culling against the canonical
    cloud (reference: multidepth2point_mask, refine_utils.py:61-127).

    render_mask_fn(points, w2c) -> [H, W] coverage of the canonical
    cloud from that view (the reference renders a white point cloud
    through the rasterizer, :78-84).
    """
    import cv2

    rng = rng or np.random.default_rng(0)
    cano_w2c = np.linalg.inv(cano_c2w)
    v_list, c_list = [], []
    kernel = np.ones((15, 15), np.uint8)
    for i in range(all_depth.shape[0]):
        w2c = np.linalg.inv(all_c2w[i])
        covered = render_mask_fn(cano_points, w2c)  # [H, W] in [0,1]
        covered = cv2.erode(covered.astype(np.float64), kernel, iterations=1)
        covered = covered > 0.9
        keep = np.logical_and(all_mask[i], ~covered)

        v = backproject_depth(all_depth[i], keep, all_c2w[i], K)
        # depth-consistency test against the canonical view
        # (reference: :100-107): drop points that project onto the
        # canonical depth surface
        xy, zc = project(v, K, cano_w2c[:3, :4])
        d_cano = sample_colors(cano_depth[..., None], xy, H)[:, 0]
        occluded = ((zc[:, 0] - d_cano) <= (1.0 / H)) & (
            (zc[:, 0] - d_cano) >= -0.2
        )
        v = v[~occluded]

        vis = zbuffer_visible(v, w2c, H, W, K)
        v = v[vis]
        xy, _ = project(v, K, w2c[:3, :4])
        colors = sample_colors(all_rgb[i], xy, H)
        v_list.append(v)
        c_list.append(colors)

    v = np.concatenate(v_list) if v_list else np.zeros((0, 3))
    c = np.concatenate(c_list) if c_list else np.zeros((0, 3))
    if len(v) > npoint:
        sel = rng.permutation(len(v))[:npoint]
        v, c = v[sel], c[sel]
    return v, c


def load_views_from_dir(load_dir: str):
    """Read the coarse stage's mvimg artifacts (reference:
    utils.py:760-776: sorted *_depth/_mask/_rgb.png + *_poses.npy)."""
    import cv2
    import imageio.v2 as imageio

    poses = np.load(sorted(glob.glob(os.path.join(load_dir, "*poses.npy")))[0])
    depth_files = sorted(glob.glob(os.path.join(load_dir, "*depth.png")))
    mask_files = sorted(glob.glob(os.path.join(load_dir, "*mask.png")))
    rgb_files = sorted(glob.glob(os.path.join(load_dir, "*rgb.png")))
    depths = [cv2.imread(f, cv2.IMREAD_UNCHANGED) / 1000.0 for f in depth_files]
    masks = [cv2.imread(f, cv2.IMREAD_UNCHANGED) / 255.0 for f in mask_files]
    rgbs = [imageio.imread(f) / 255.0 for f in rgb_files]
    return poses, depths, masks, rgbs


def build_point_cloud(load_dir: str, gt_rgb: np.ndarray, H: int, W: int,
                      K: np.ndarray, render_mask_fn):
    """Full load_views equivalent (reference: refine_utils.py:335-409):
    canonical view -> cloud; other views fill uncovered regions."""
    import cv2

    poses, depths, masks, rgbs = load_views_from_dir(load_dir)
    ind = (len(poses) - 1) // 2
    cano_c2w = poses[ind]

    d = cv2.resize(depths[ind], (W, H))
    # the reference keeps the eroded mask without the edge cut for the
    # canonical view (refine_utils.py:360 is commented out upstream);
    # follow that
    kernel = np.ones((11, 11), np.uint8)
    m_cano = cv2.erode(cv2.resize(masks[ind], (W, H)), kernel, iterations=2) == 1
    v_cano, c_cano = depth_to_colored_points(
        d, m_cano, cano_c2w, cv2.resize(gt_rgb, (W, H)), H, W, K
    )

    all_depth, all_mask, all_rgb, all_c2w = [], [], [], []
    for i in range(len(poses)):
        if i == ind:
            continue
        di = cv2.resize(depths[i], (W, H))
        mi = cv2.resize(masks[i], (W, H))
        mi = edge_culled_mask(di, mi, 10, 10, erode_iters=1)
        all_depth.append(di)
        all_mask.append(mi)
        all_rgb.append(cv2.resize(np.asarray(rgbs[i], np.float64)[..., :3],
                                  (W, H)))
        all_c2w.append(poses[i])

    v_novel, c_novel = fuse_novel_views(
        np.stack(all_depth), np.stack(all_mask), np.stack(all_rgb),
        K, np.stack(all_c2w),
        v_cano, c_cano, cano_c2w, d * m_cano, H, W, render_mask_fn,
    )
    return v_cano, c_cano, v_novel, c_novel
