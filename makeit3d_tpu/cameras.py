"""Camera pose sampling and ray generation.

Host-side (numpy) re-implementation of the reference's on-the-fly pose
"dataset" (reference: nerf/provider.py) and ray builder (reference:
nerf/utils.py:50-116). Poses are cheap scalar math, so they stay on host;
rays for a full image are generated as numpy arrays and shipped to device
once per step.

Coordinate conventions follow the reference exactly:
  - y is "up-ish" with an up vector of (0, -1, 0) (provider.py:122)
  - camera center = r * (sinθ sinφ, cosθ, sinθ cosφ)   (provider.py:107-111)
  - pose columns are (right, up, forward), cam2world    (provider.py:132-134)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np


def safe_normalize(x: np.ndarray, eps: float = 1e-20) -> np.ndarray:
    # reference: nerf/utils.py:47-48
    n2 = np.clip(np.sum(x * x, axis=-1, keepdims=True), eps, 1e32)
    return x / np.sqrt(n2)


def view_direction(thetas, phis, overhead_rad: float, front_rad: float) -> np.ndarray:
    """Bucket (theta, phi) into {front, side, back, side, top, bottom}.

    reference: nerf/provider.py:52-69 — including its convention quirk:
    this labels phi ~ 0 as bucket 0 ('front') although the training
    schedule's reference view sits at phi = 180 (fix_poses) and phi ~ 0
    is the is_large 'back' view. The reference inherited the bucketing
    from stable-dreamfusion and never uses it on the training path; it
    only feeds the (optional, off-path) directional text prompts, so we
    reproduce it verbatim.
    """
    thetas = np.atleast_1d(np.asarray(thetas))
    phis = np.atleast_1d(np.asarray(phis))
    res = np.zeros(thetas.shape[0], dtype=np.int64)
    res[phis < front_rad] = 0
    res[(phis >= front_rad) & (phis < np.pi)] = 1
    res[(phis >= np.pi) & (phis < (np.pi + front_rad))] = 2
    res[phis >= (np.pi + front_rad)] = 3
    res[thetas <= overhead_rad] = 4
    res[thetas >= (np.pi - overhead_rad)] = 5
    return res


def _lookat_pose(centers: np.ndarray, targets=0.0, up_noise=0.0) -> np.ndarray:
    """Build cam2world [B, 4, 4] from camera centers looking at targets."""
    size = centers.shape[0]
    forward = safe_normalize(np.asarray(targets) - centers)
    up = np.tile(np.array([[0.0, -1.0, 0.0]], dtype=np.float64), (size, 1))
    right = safe_normalize(np.cross(forward, up))
    up = safe_normalize(np.cross(right, forward) + up_noise)
    poses = np.tile(np.eye(4, dtype=np.float64)[None], (size, 1, 1))
    poses[:, :3, :3] = np.stack((right, up, forward), axis=-1)
    poses[:, :3, 3] = centers
    return poses


def _centers_from_sph(radius, thetas, phis) -> np.ndarray:
    return np.stack(
        [
            radius * np.sin(thetas) * np.sin(phis),
            radius * np.cos(thetas),
            radius * np.sin(thetas) * np.cos(phis),
        ],
        axis=-1,
    )


def rand_poses(
    size: int,
    rng: np.random.Generator,
    radius_range=(1.0, 1.5),
    theta_range=(0.0, 120.0),
    phi_range=(0.0, 360.0),
    return_dirs: bool = False,
    angle_overhead: float = 30.0,
    angle_front: float = 60.0,
    jitter: bool = False,
    uniform_sphere_rate: float = 0.5,
):
    """Random orbit poses (reference: nerf/provider.py:72-141)."""
    theta_range = np.deg2rad(theta_range)
    phi_range = np.deg2rad(phi_range)
    angle_overhead = np.deg2rad(angle_overhead)
    angle_front = np.deg2rad(angle_front)

    radius = rng.random(size) * (radius_range[1] - radius_range[0]) + radius_range[0]

    if rng.random() < uniform_sphere_rate:
        unit = np.stack(
            [
                (rng.random(size) - 0.5) * 2.0,
                rng.random(size),
                (rng.random(size) - 0.5) * 2.0,
            ],
            axis=-1,
        )
        unit = unit / np.linalg.norm(unit, axis=-1, keepdims=True)
        thetas = np.arccos(unit[:, 1])
        phis = np.arctan2(unit[:, 0], unit[:, 2])
        phis[phis < 0] += 2 * np.pi
        centers = unit * radius[:, None]
    else:
        thetas = rng.random(size) * (theta_range[1] - theta_range[0]) + theta_range[0]
        phis = rng.random(size) * (phi_range[1] - phi_range[0]) + phi_range[0]
        centers = _centers_from_sph(radius, thetas, phis)

    targets = np.zeros(3)
    if jitter:
        centers = centers + (rng.random(centers.shape) * 0.2 - 0.1)
        targets = targets + rng.standard_normal(centers.shape) * 0.2
    up_noise = rng.standard_normal((size, 3)) * 0.02 if jitter else 0.0

    poses = _lookat_pose(centers, targets, up_noise)
    dirs = view_direction(thetas, phis, angle_overhead, angle_front) if return_dirs else None
    return poses, dirs


def fix_poses(
    size: int,
    index: int,
    rng: np.random.Generator,
    radius_range=(1.0, 1.5),
    theta_range=(0.0, 100.0),
    phi_range=(0.0, 360.0),
):
    """Training pose schedule: exact front view every 4th step, otherwise a
    phi-weighted novel view (reference: nerf/provider.py:143-214).

    Returns (thetas, phis, poses, is_front, is_large).
    """
    theta_range = np.deg2rad(theta_range)
    phi_range = np.deg2rad(phi_range)

    if index % 4 == 0:
        radius = np.ones(size)
        thetas = np.full(size, (theta_range[1] - theta_range[0]) / 2 + theta_range[0])
        phis = np.full(size, (phi_range[1] - phi_range[0]) / 2 + phi_range[0])
        is_front = True
    else:
        radius = rng.random(size) * (radius_range[1] - radius_range[0]) + radius_range[0]
        if phi_range[1] <= np.deg2rad(240.0) and phi_range[0] >= np.deg2rad(120.0):
            phis = rng.random(size) * (phi_range[1] - phi_range[0]) + phi_range[0]
        else:
            # weighted-phi sampling biased toward lateral/back coverage
            # (reference: provider.py:172-182)
            r = rng.random()
            d = np.deg2rad
            if r > 0.85:
                lo, hi = d(315.0), phi_range[1]
            elif r > 0.7:
                lo, hi = phi_range[0], d(45.0)
            elif r > 0.5:
                lo, hi = d(240.0), d(315.0)
            elif r > 0.3:
                lo, hi = d(45.0), d(120.0)
            else:
                lo, hi = d(120.0), d(240.0)
            phis = rng.random(size) * (hi - lo) + lo
        is_front = False
        thetas = rng.random(size) * (theta_range[1] - theta_range[0]) + theta_range[0]

    # back-view flag, re-derived from phi for every pose
    # (reference: provider.py:189-192)
    phi0 = float(phis.reshape(-1)[0])
    is_large = (0.0 <= phi0 <= np.deg2rad(45.0)) or (
        np.deg2rad(315.0) <= phi0 <= 2 * np.pi
    )

    centers = _centers_from_sph(radius, thetas, phis)
    poses = _lookat_pose(centers)
    return thetas, phis, poses, is_front, is_large


def circle_poses(radius: float = 1.0, theta: float = 60.0, phi: float = 0.0):
    """A single orbit pose (reference: nerf/provider.py:217-241)."""
    theta = np.deg2rad(theta)
    phi = np.deg2rad(phi)
    thetas = np.array([theta])
    phis = np.array([phi])
    centers = _centers_from_sph(radius, thetas, phis)
    poses = _lookat_pose(centers)
    return thetas, phis, poses


def get_rays(
    poses: np.ndarray,
    intrinsics,
    H: int,
    W: int,
    N: int = -1,
    rng: Optional[np.random.Generator] = None,
):
    """Per-pixel rays for given cam2world poses.

    reference: nerf/utils.py:50-116. Returns dict with rays_o/rays_d
    [B, N, 3] and depth_scale [B, N] (1/|unnormalized dir|, used to turn
    z-depth into ray-distance at depth supervision time).
    """
    poses = np.asarray(poses, dtype=np.float64)
    B = poses.shape[0]
    fx, fy, cx, cy = [float(v) for v in intrinsics]

    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    i = i.reshape(1, H * W).repeat(B, 0) + 0.5
    j = j.reshape(1, H * W).repeat(B, 0) + 0.5

    results = {}
    if N > 0:
        N = min(N, H * W)
        if rng is None:
            rng = np.random.default_rng()
        inds = rng.integers(0, H * W, size=N)
        inds = np.tile(inds[None], (B, 1))
        i = np.take_along_axis(i, inds, axis=-1)
        j = np.take_along_axis(j, inds, axis=-1)
        results["inds"] = inds
    else:
        results["inds"] = np.tile(np.arange(H * W)[None], (B, 1))

    zs = np.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = np.stack((xs, ys, zs), axis=-1)
    scale = 1.0 / np.sqrt(np.sum(directions**2, axis=-1))
    directions = safe_normalize(directions)
    rays_d = directions @ np.swapaxes(poses[:, :3, :3], -1, -2)
    rays_o = np.broadcast_to(poses[:, None, :3, 3], rays_d.shape)

    results["rays_o"] = np.ascontiguousarray(rays_o, dtype=np.float32)
    results["rays_d"] = np.ascontiguousarray(rays_d, dtype=np.float32)
    results["depth_scale"] = scale.astype(np.float32)
    return results


def intrinsics_from_fov(fov_deg: float, H: int, W: int) -> np.ndarray:
    """(fx, fy, cx, cy). cx pairs with the x/width pixel index in
    get_rays, so cx = W/2 — NOTE the reference swaps these
    (provider.py:261-262 sets cx=H/2, cy=W/2), a latent bug that only
    manifests for non-square renders; every shipped config is square."""
    focal = H / (2 * math.tan(math.radians(fov_deg) / 2))
    return np.array([focal, focal, W / 2, H / 2], dtype=np.float32)


@dataclasses.dataclass
class ViewBatch:
    """One sampled view: everything the train/eval step consumes."""

    H: int
    W: int
    rays_o: np.ndarray       # [B, H*W, 3]
    rays_d: np.ndarray       # [B, H*W, 3]
    depth_scale: np.ndarray  # [B, H*W]
    is_front: bool
    is_large: bool
    poses: np.ndarray        # [B, 4, 4]
    thetas: np.ndarray
    phis: np.ndarray


class ViewSampler:
    """On-the-fly camera sampler; replaces the reference's DataLoader-based
    NeRFDataset (reference: nerf/provider.py:244-317)."""

    def __init__(self, cfg, type: str = "train", H: int = 256, W: int = 256,
                 size: int = 100, seed: int = 0):
        self.cfg = cfg
        self.type = type
        self.H, self.W = H, W
        self.size = size
        self.training = type in ("train", "all")
        self.gen_mv = type == "gen_mv"
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.size

    def get(self, index: int) -> ViewBatch:
        cfg = self.cfg
        if self.training:
            thetas, phis, poses, is_front, is_large = fix_poses(
                1, index, self.rng,
                radius_range=cfg.radius_range,
                theta_range=cfg.theta_range,
                phi_range=cfg.phi_range,
            )
            if is_front:
                fov = cfg.fov
            else:
                fov = self.rng.random() * (cfg.fovy_range[1] - cfg.fovy_range[0]) + cfg.fovy_range[0]
        elif self.gen_mv:
            # 3 theta rings x (size//3) phi sweeps (reference: provider.py:276-286)
            theta_list = [80.0, 90.0, 100.0]
            length = max(self.size // 3, 1)
            # clamp: for size % 3 != 0 the tail indices stay on the last
            # ring (the reference only ever uses size=33; this keeps any
            # size valid instead of IndexError/ZeroDivisionError)
            ring = min(int(index // length), len(theta_list) - 1)
            frac = (index % length) / max(length - 1, 1)
            phi = frac * (cfg.phi_range[0] - cfg.phi_range[1]) + cfg.phi_range[1]
            thetas, phis, poses = circle_poses(radius=1.0, theta=theta_list[ring], phi=phi)
            is_front, is_large, fov = False, False, cfg.fov
        else:
            phi = (index / self.size) * (cfg.phi_range[1] - cfg.phi_range[0]) + cfg.phi_range[0]
            thetas, phis, poses = circle_poses(radius=1.0, theta=90.0, phi=phi)
            is_front, is_large, fov = False, False, cfg.fov

        intr = intrinsics_from_fov(fov, self.H, self.W)
        rays = get_rays(poses, intr, self.H, self.W, -1)
        return ViewBatch(
            H=self.H, W=self.W,
            rays_o=rays["rays_o"], rays_d=rays["rays_d"],
            depth_scale=rays["depth_scale"],
            is_front=is_front, is_large=is_large,
            poses=poses.astype(np.float32), thetas=thetas, phis=phis,
        )

    def __iter__(self):
        order = self.rng.permutation(self.size) if self.training else np.arange(self.size)
        for idx in order:
            yield self.get(int(idx))
