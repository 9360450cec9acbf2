"""Compact 3D camera / warp math for the depth-warp visualizer.

TPU-native replacement for the reference's vendored pytorch3d-lite
(`DPT/py3d_tools.py`, 1799 LoC) plus the OpenCV homography helpers in
`DPT/warp_utils.py:25-136`. Only the pieces the warp tool actually uses
are implemented — Euler rotations, the FoV perspective projection
transform (pytorch3d row-vector convention), torch-compatible
grid_sample resampling, and 4-point homography estimation — as pure
jax/numpy functions with static shapes, jit-able end to end.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation about a named axis (pytorch3d _axis_angle_rotation)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        rows = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        rows = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        rows = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"bad axis {axis}")
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(angles, convention: str = "XYZ") -> jnp.ndarray:
    """[..., 3] Euler angles (radians) -> [..., 3, 3] rotation matrix.

    Matches pytorch3d.transforms.euler_angles_to_matrix, used by the
    reference's warp animation (DPT/warp_utils.py:254, 284).
    """
    angles = jnp.asarray(angles, jnp.float32)
    mats = [
        _axis_rotation(axis, angles[..., i])
        for i, axis in enumerate(convention)
    ]
    out = mats[0]
    for m in mats[1:]:
        out = out @ m
    return out


def rotation_matrix_zyx_deg(rotation_angles: Sequence[float]) -> np.ndarray:
    """4x4 homogeneous rotation from [phi_x, gamma_y, theta_z] in degrees.

    Mirrors DPT/warp_utils.py:32-69 getRotationMatrixManual (Rx @ Ry @ Rz).
    Host-side numpy: this feeds homography estimation, not the hot path.
    """
    phi, gamma, theta = [math.radians(a) for a in rotation_angles]
    R = np.eye(4)
    R[:3, :3] = (
        np.asarray(_axis_rotation("X", jnp.float32(phi)))
        @ np.asarray(_axis_rotation("Y", jnp.float32(gamma)))
        @ np.asarray(_axis_rotation("Z", jnp.float32(theta)))
    )
    return R


# ---------------------------------------------------------------------------
# FoV perspective camera (pytorch3d conventions)
# ---------------------------------------------------------------------------


class FoVPerspectiveCamera:
    """Minimal FoVPerspectiveCameras.get_full_projection_transform().

    Row-vector convention: view = world @ R + T, then the perspective
    projection with w = z_view and NDC
      x' = x / (aspect * tan(fov/2) * z),  y' = y / (tan(fov/2) * z),
      z' = far/(far-near) - far*near/((far-near) * z).
    reference usage: DPT/warp_utils.py:150-165, 210-222.
    """

    def __init__(self, near: float, far: float, aspect_ratio: float,
                 fov_degrees: float, R=None, T=None):
        self.near = float(near)
        self.far = float(far)
        self.aspect = float(aspect_ratio)
        self.tan_half = math.tan(math.radians(fov_degrees) / 2.0)
        self.R = jnp.eye(3) if R is None else jnp.asarray(R, jnp.float32)
        self.T = jnp.zeros(3) if T is None else jnp.asarray(T, jnp.float32)

    def transform_points(self, points: jnp.ndarray, eps: float = 1e-8
                         ) -> jnp.ndarray:
        """[N, 3] world points -> [N, 3] NDC points."""
        p = jnp.asarray(points, jnp.float32) @ self.R + self.T
        z = p[:, 2:3]
        z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
        x_ndc = p[:, 0:1] / (self.aspect * self.tan_half * z)
        y_ndc = p[:, 1:2] / (self.tan_half * z)
        fr = self.far / (self.far - self.near)
        z_ndc = fr - self.far * self.near / ((self.far - self.near) * z)
        return jnp.concatenate([x_ndc, y_ndc, z_ndc], axis=-1)


# ---------------------------------------------------------------------------
# grid_sample (torch semantics) + affine identity grid
# ---------------------------------------------------------------------------


def identity_grid(h: int, w: int, align_corners: bool = False) -> jnp.ndarray:
    """[H, W, 2] identity sampling grid in [-1, 1], (x, y) order.

    Matches F.affine_grid(identity, [1,1,h,w], align_corners) as used at
    DPT/warp_utils.py:173-175.
    """
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
        ys = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75):
    """Weights for taps at offsets (-1, 0, 1, 2) from floor(x), given the
    fractional part t in [0, 1)."""
    def k(x):
        ax = jnp.abs(x)
        return jnp.where(
            ax <= 1.0,
            (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
            jnp.where(ax < 2.0, a * (ax**3 - 5 * ax**2 + 8 * ax - 4), 0.0),
        )
    return k(t + 1.0), k(t), k(1.0 - t), k(2.0 - t)


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resample img [H, W, C] at grid [Ho, Wo, 2] ((x, y) in [-1, 1]).

    Torch F.grid_sample semantics (modes bilinear/bicubic, padding
    zeros/border) — the resampling primitive behind the reference's
    warp (DPT/warp_utils.py:179-194).
    """
    H, W, C = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5

    def fetch(ix, iy):
        """Gather with padding handling. ix/iy: int32 [Ho, Wo]."""
        inside = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        cx = jnp.clip(ix, 0, W - 1)
        cy = jnp.clip(iy, 0, H - 1)
        v = img[cy, cx]  # [Ho, Wo, C]
        if padding_mode == "zeros":
            v = jnp.where(inside[..., None], v, 0.0)
        return v

    if mode == "bilinear":
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = (fx - x0)[..., None]
        ty = (fy - y0)[..., None]
        v00 = fetch(x0, y0)
        v01 = fetch(x0 + 1, y0)
        v10 = fetch(x0, y0 + 1)
        v11 = fetch(x0 + 1, y0 + 1)
        top = v00 * (1 - tx) + v01 * tx
        bot = v10 * (1 - tx) + v11 * tx
        return top * (1 - ty) + bot * ty

    if mode == "bicubic":
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        wx = _cubic_kernel(fx - x0)  # 4 x [Ho, Wo]
        wy = _cubic_kernel(fy - y0)
        out = jnp.zeros(grid.shape[:2] + (C,), img.dtype)
        for j in range(4):
            row = jnp.zeros_like(out)
            for i in range(4):
                row = row + wx[i][..., None] * fetch(x0 + i - 1, y0 + j - 1)
            out = out + wy[j][..., None] * row
        return out

    raise ValueError(f"mode {mode}")


# ---------------------------------------------------------------------------
# homography (perspective warp) estimation — cv2-free
# ---------------------------------------------------------------------------


def perspective_transform(points: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Apply a 3x3 or 4x4 projective transform to [N, 2] / [N, 3] points
    with perspective divide (cv2.perspectiveTransform equivalent)."""
    n = M.shape[0]
    p = np.concatenate([points, np.ones((points.shape[0], 1))], axis=-1)
    if p.shape[1] < n:
        p = np.concatenate(
            [points, np.zeros((points.shape[0], n - 1 - points.shape[1])),
             np.ones((points.shape[0], 1))], axis=-1)
    q = p @ M.T
    return q[:, : points.shape[1]] / q[:, -1:]


def get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points to 4 dst points
    (cv2.getPerspectiveTransform equivalent; solves the standard 8x8
    DLT system)."""
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(A, b)
    return np.concatenate([h, [1.0]]).reshape(3, 3)


def warp_matrix(W: int, H: int, theta: float, phi: float, gamma: float,
                scale: float, fV: float) -> Tuple[np.ndarray, float]:
    """Perspective warp homography for an image plane rotated in 3D.

    Port of DPT/warp_utils.py:90-136 warpMatrix: rotate the image quad
    by (phi, gamma, theta) degrees, project with vertical FoV fV, and
    fit the 3x3 homography from the 4 corner correspondences.
    Returns (M33, side_length).
    """
    fVhalf = math.radians(fV / 2.0)
    d = math.hypot(W, H)
    side = scale * d / math.cos(fVhalf)
    h = d / (2.0 * math.sin(fVhalf))
    n = h - d / 2.0
    f = h + d / 2.0

    T = np.eye(4)
    T[2, 3] = -h
    R = rotation_matrix_zyx_deg([phi, gamma, theta])
    P = np.eye(4)
    P[0, 0] = 1.0 / math.tan(fVhalf)
    P[1, 1] = P[0, 0]
    P[2, 2] = -(f + n) / (f - n)
    P[2, 3] = -(2.0 * f * n) / (f - n)
    P[3, 2] = -1.0
    F = P @ T @ R

    pts_in = np.array(
        [[-W / 2.0, H / 2.0, 0.0], [W / 2.0, H / 2.0, 0.0],
         [W / 2.0, -H / 2.0, 0.0], [-W / 2.0, -H / 2.0, 0.0]]
    )
    pts_out = perspective_transform(pts_in, F)
    pin = (pts_in[:, :2] + [W / 2.0, H / 2.0]).astype(np.float32)
    pout = ((pts_out[:, :2] + 1.0) * (0.5 * side)).astype(np.float32)
    return get_perspective_transform(pin, pout), side
