"""3D depth-warp visualizer (standalone DPT tool).

TPU-native equivalent of the reference's `DPT/warp_depth.py` +
`DPT/warp_utils.py`: estimate monocular depth for one image, then render
an orbit animation by unprojecting every pixel with its depth, moving a
virtual FoV camera, and resampling the image/depth along the induced 2D
flow. The per-frame warp is one jitted JAX program (projection + flow +
bicubic grid_sample); the reference instead chained pytorch3d cameras
with torch grid_sample.

CLI: python -m makeit3d_tpu.tools.warp_depth -i img.png -o outdir -m dpt.pt
"""

from __future__ import annotations

import argparse
import math
import os
from functools import partial
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.transforms3d import (
    FoVPerspectiveCamera,
    euler_angles_to_matrix,
    grid_sample,
    identity_grid,
)

# Disco-diffusion translation scale (reference: warp_utils.py:242)
TRANSLATION_SCALE = 1.0 / 200.0


@partial(jax.jit, static_argnames=("fov_deg", "pad_image"))
def transform_image_3d(
    image: jnp.ndarray,   # [H, W, C] float in [0, 1] (or any range)
    depth: jnp.ndarray,   # [H, W] positive depth
    rot_mat: jnp.ndarray,  # [3, 3]
    translate: jnp.ndarray,  # [3]
    fov_deg: float = 50.0,
    pad_image: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp (image, depth) to the camera pose (rot_mat, translate).

    reference: DPT/warp_utils.py:138-203 transform_image_3d. Every pixel
    (x, y) in [-1, 1]^2 with its depth z forms a world point; the old and
    new FoV cameras project it, and the image is resampled at
    identity_grid - (new_xy - old_xy). Returns (warped image [H, W, C],
    new-camera depth [H, W]).
    """
    H, W = depth.shape
    aspect = float(W) / float(H)
    near, far = 0.2, 2.0

    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.stack(
        [gx.reshape(-1), gy.reshape(-1), depth.reshape(-1)], axis=-1
    )

    cam_old = FoVPerspectiveCamera(near, far, aspect, fov_deg)
    cam_new = FoVPerspectiveCamera(near, far, aspect, fov_deg,
                                   R=rot_mat.T, T=translate)
    old_ndc = cam_old.transform_points(pts)
    new_ndc = cam_new.transform_points(pts)

    offset_xy = (new_ndc[:, :2] - old_ndc[:, :2]).reshape(H, W, 2)
    coords = identity_grid(H, W, align_corners=False) - offset_xy

    # the reference adds a tiny epsilon before sampling (warp_utils.py:182)
    eps = 1.0 / 512 - 1e-4 if pad_image else 0.0
    warped = grid_sample(image + eps, coords, mode="bicubic",
                         padding_mode="zeros", align_corners=True)
    # resample z along the same flow so the depth frame is spatially
    # aligned with the warped RGB (transform_depth_3d's pattern; the
    # un-resampled new_ndc z is indexed by SOURCE pixels)
    new_z = grid_sample(
        new_ndc[:, 2].reshape(H, W, 1), coords, mode="bicubic",
        padding_mode="border", align_corners=True,
    )[..., 0]
    return warped, new_z


@partial(jax.jit, static_argnames=("fov_deg",))
def transform_depth_3d(
    depth: jnp.ndarray, rot_mat: jnp.ndarray, translate: jnp.ndarray,
    fov_deg: float = 100.0,
) -> jnp.ndarray:
    """Warp a depth map to a new camera (reference: warp_utils.py:204-239;
    border padding, wider default FoV)."""
    H, W = depth.shape
    aspect = float(W) / float(H)
    near, far = 0.2, 2.0

    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.stack(
        [gx.reshape(-1), gy.reshape(-1), depth.reshape(-1)], axis=-1
    )
    cam_old = FoVPerspectiveCamera(near, far, aspect, fov_deg)
    cam_new = FoVPerspectiveCamera(near, far, aspect, fov_deg,
                                   R=rot_mat.T, T=translate)
    offset_xy = (
        cam_new.transform_points(pts)[:, :2]
        - cam_old.transform_points(pts)[:, :2]
    ).reshape(H, W, 2)
    coords = identity_grid(H, W, align_corners=False) - offset_xy
    eps = 1.0 / 512 - 1e-4
    out = grid_sample(depth[..., None] + eps, coords, mode="bicubic",
                      padding_mode="border", align_corners=True)
    return out[..., 0]


def _pose_from_rotate_dict(rotate: Dict[str, float]):
    """(Tx..Rz) dict -> (rot_mat, translate). reference:
    warp_utils.py:241-257 anim_warp_3d."""
    translate = jnp.asarray(
        [rotate.get("Tx", 0.0) * TRANSLATION_SCALE,
         rotate.get("Ty", 0.0) * TRANSLATION_SCALE,
         -rotate.get("Tz", 0.0) * TRANSLATION_SCALE], jnp.float32)
    angles = jnp.asarray(
        [math.radians(rotate.get("Rx", 0.0)),
         math.radians(rotate.get("Ry", 0.0)),
         math.radians(rotate.get("Rz", 0.0))], jnp.float32)
    return euler_angles_to_matrix(angles, "XYZ"), translate


def anim_warp_3d(image, depth, rotate: Dict[str, float]):
    rot, t = _pose_from_rotate_dict(rotate)
    return transform_image_3d(jnp.asarray(image, jnp.float32),
                              jnp.asarray(depth, jnp.float32), rot, t)


def anim_warp_depth_3d(depth, rotate: Dict[str, float]):
    rot, t = _pose_from_rotate_dict(rotate)
    return transform_depth_3d(jnp.asarray(depth, jnp.float32), rot, t)


def warp_depth_fun(depth, theta: float, phi: float):
    """Warp a depth map to spherical view angles (radians) — the hook the
    reference exposes for novel-view depth supervision
    (DPT/warp_depth.py:243-263)."""
    rotate = {
        "Rx": theta / math.pi * 180.0 - 90.0,
        "Ry": -(phi / math.pi * 180.0 - 20.0),
    }
    return anim_warp_depth_3d(depth, rotate)


def orbit_trajectory(n_frames: int = 36, amplitude_deg: float = 10.0):
    """The reference's default circular camera wobble
    (DPT/warp_depth.py:140-150)."""
    out = []
    # endpoint=False: t=0 and t=10 are the same pose; a closed orbit
    # must not duplicate its seam frame
    for t in np.linspace(0.0, 10.0, n_frames, endpoint=False):
        out.append({
            "Rx": amplitude_deg * math.cos(2 * math.pi * t / 10.0),
            "Ry": amplitude_deg * math.sin(2 * math.pi * t / 10.0),
        })
    return out


def _normalize01(x: np.ndarray) -> np.ndarray:
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / max(hi - lo, 1e-8)


def run(input_path: str, output_path: str, weights: str,
        n_frames: int = 36, size: int = 512) -> Tuple[str, str]:
    """Depth-estimate one image and write orbit-warp videos
    (reference: DPT/warp_depth.py:34-242 run)."""
    from ..models.dpt import dpt_disparity
    from ..utils.image import load_ref_image
    from ..utils.workspace import write_video

    os.makedirs(output_path, exist_ok=True)
    _, ori = load_ref_image(input_path, size=size)
    rgb = ori[0]  # [H, W, 3] in [0, 1], composited onto white
    disp = dpt_disparity(ori, weights)
    # normalized disparity in [0.5, 1.5] (DPT/warp_depth.py:200)
    depth = _normalize01(disp) + 0.5

    frames, zs = [], []
    for rotate in orbit_trajectory(n_frames):
        img_w, z_w = anim_warp_3d(rgb, depth, rotate)
        frames.append(
            (np.clip(np.asarray(img_w), 0, 1) * 255).astype(np.uint8))
        zs.append(np.asarray(z_w))
    # one global min/max across the orbit — per-frame normalization made
    # constant-depth regions pulse in brightness
    zcat = _normalize01(np.stack(zs))
    depth_frames = [
        (z * 255).astype(np.uint8)[..., None].repeat(3, axis=-1)
        for z in zcat
    ]

    stem = os.path.splitext(os.path.basename(input_path))[0]
    vid = os.path.join(output_path, f"{stem}.mp4")
    dvid = os.path.join(output_path, f"{stem}_depth.mp4")
    write_video(vid, frames, fps=24)
    write_video(dvid, depth_frames, fps=24)
    return vid, dvid


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_path", default="test_img/house.png")
    p.add_argument("-o", "--output_path", default="output_monodepth")
    p.add_argument("-m", "--model_weights", required=True,
                   help="DPT-hybrid depth weights (.pt or HF dir)")
    p.add_argument("--frames", type=int, default=36)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args(argv)
    vid, dvid = run(args.input_path, args.output_path, args.model_weights,
                    n_frames=args.frames, size=args.size)
    print(f"wrote {vid} and {dvid}")


if __name__ == "__main__":
    main()
