"""Host-side eval-frame planning shared by Trainer.render_image and
bench.py.

One source of truth for the per-frame regime decision (tiled skip vs
plain scanline) and the tile (dis)assembly, so the bench mirrors
production BY CONSTRUCTION instead of re-implementing it (advisor
round-4 findings: the bench asserted a square max_ray_batch where
production silently fell back to scanlines, and the host slab test
disagreed with the device predicate on behind-camera boxes).

The skip program's device predicate is ops.marching.near_far_from_aabb
followed by `near < far` (models/renderer.py render_eval_chunk_skippable);
`host_aabb_hit` reproduces exactly that math in numpy, including the
min_near clamp that rejects boxes entirely behind the camera.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np


def host_aabb_hit(box, rays_o, rays_d, min_near: float = 0.05):
    """Numpy mirror of ops.marching.near_far_from_aabb's hit test.

    box: [6] (lo_xyz, hi_xyz); rays_*: [N, 3]. Returns hit [N] bool —
    True iff the device-side slab test would produce samples
    (max(near, min_near) < far). A box entirely behind the camera has
    far < min_near and misses, matching the device (advisor r4 #1)."""
    box = np.asarray(box, np.float32)
    o = np.asarray(rays_o, np.float32).reshape(-1, 3)
    d = np.asarray(rays_d, np.float32).reshape(-1, 3)
    eps = 1e-15
    tmin = (box[:3] - o) / (d + eps)
    tmax = (box[3:] - o) / (d + eps)
    near = np.minimum(tmin, tmax).max(-1)
    far = np.maximum(tmin, tmax).min(-1)
    return np.maximum(near, min_near) < far


class TilePlan(NamedTuple):
    """Square-tile frame chunking: [H, W] -> [n_chunks, T*T]."""

    H: int
    W: int
    T: int       # tile side; T*T == chunk size B
    Ht: int      # tiles per column
    Wt: int      # tiles per row

    @property
    def n_chunks(self) -> int:
        return self.Ht * self.Wt

    def tile_up(self, a, comps: int):
        """[H, W, comps] (or flat) -> [n_chunks, T*T, comps], padding the
        frame to a tile multiple with edge-replicated values (replicated
        edge rays keep pad tiles skippable exactly when their source
        tiles are)."""
        H, W, T, Ht, Wt = self.H, self.W, self.T, self.Ht, self.Wt
        g = np.asarray(a, np.float32).reshape(H, W, comps)
        g = np.pad(g, ((0, Ht * T - H), (0, Wt * T - W), (0, 0)),
                   mode="edge")
        return (g.reshape(Ht, T, Wt, T, comps)
                .transpose(0, 2, 1, 3, 4).reshape(self.n_chunks, T * T,
                                                  comps))

    def untile(self, v):
        """[n_chunks, T*T, *comps] -> [H, W, *comps] (drops padding)."""
        H, W, T, Ht, Wt = self.H, self.W, self.T, self.Ht, self.Wt
        comps = v.shape[2:]
        g = (np.asarray(v).reshape(Ht, Wt, T, T, *comps)
             .transpose(0, 2, 1, 3, *range(4, 4 + len(comps))))
        return g.reshape(Ht * T, Wt * T, *comps)[:H, :W]

    def skippable_frac(self, box, rays_o, rays_d,
                       min_near: float = 0.05) -> float:
        """Fraction of tiles whose rays ALL miss `box` (the tiles the
        skip program would lax.cond past)."""
        hit = host_aabb_hit(box, rays_o, rays_d, min_near)
        hit = hit.reshape(self.H, self.W)
        hit_p = np.pad(hit, ((0, self.Ht * self.T - self.H),
                             (0, self.Wt * self.T - self.W)), mode="edge")
        tile_hit = hit_p.reshape(self.Ht, self.T, self.Wt,
                                 self.T).any(axis=(1, 3))
        return float(1.0 - tile_hit.mean())


def plan_tiles(H: int, W: int, B: int) -> Optional[TilePlan]:
    """TilePlan for a frame of H x W with chunk size B, or None when
    square tiling is impossible (non-square B, or frame smaller than a
    tile) — the caller falls back to the plain scanline program, same
    as production render_image."""
    T = int(math.isqrt(B))
    if T * T != B or H < T or W < T:
        return None
    return TilePlan(H=H, W=W, T=T, Ht=-(-H // T), Wt=-(-W // T))


def pack_scanlines(a, comps: int, H: int, W: int, B: int,
                   pad_value: float = 0.0):
    """Plain path: [H, W, comps] (or flat) -> [n_chunks, B, comps] by
    flattening scanline order and zero/const-padding the tail."""
    n_chunks = -(-H * W // B)
    pad = n_chunks * B - H * W
    g = np.asarray(a, np.float32).reshape(H * W, comps)
    g = np.pad(g, ((0, pad), (0, 0)), constant_values=pad_value)
    return g.reshape(n_chunks, B, comps)
