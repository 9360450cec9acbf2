"""Static-shape occupancy ray marching.

TPU-native redesign of the CUDA two-pass atomic-compaction marcher
(reference: raymarching/src/raymarching.cu:311-490 kernel_march_rays_train,
:906-1021 kernel_march_rays). The CUDA kernel walks each ray with a DDA,
skipping empty voxels, and compacts a variable number of samples per ray
into flat buffers via atomicAdd — data-dependent shapes that XLA cannot
compile. Here the same sampling is reformulated with static shapes:

  With the default dt_gamma=0 the step size is the constant
  dt = 2*sqrt(3)/max_steps (raymarching.cu:345), so every candidate sample
  lies on a fixed per-ray lattice  t_k = near + (k + noise) * dt,
  k = 0..K-1.  We probe occupancy at all K lattice points with one
  vectorized gather, then compact the first S occupied points per ray with
  a cumsum + searchsorted (the TPU analogue of the CUDA atomic compaction —
  race-free, sort-free, and fully batched). Rays keep a [N, S] layout with
  a validity mask instead of the CUDA (ray_id, offset, count) index.

The reference caps total samples via the mean_count running average,
dropping overflow rays (raymarching/raymarching.py:210-215); here the cap
is the static S = samples-per-ray budget, which drops the tail of
over-long rays instead — the same accuracy/speed trade, recompilation-free.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .grid import occupancy_lookup

SQRT3 = math.sqrt(3.0)


def near_far_from_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb: jnp.ndarray,
    min_near: float = 0.05,
):
    """Slab-test ray/AABB intersection (reference: raymarching.cu:91-156).

    rays_o, rays_d: [N, 3]; aabb: [6] (xmin,ymin,zmin,xmax,ymax,zmax).
    Returns nears, fars: [N]. Non-hitting rays get near=far=1e9 like the
    CUDA kernel (well, the CUDA near_far kernel clamps near to min_near and
    produces near>far -> no samples; we mirror the cube variant of
    near_far_from_bound at renderer.py:64-74).
    """
    eps = 1e-15
    tmin = (aabb[:3] - rays_o) / (rays_d + eps)
    tmax = (aabb[3:] - rays_o) / (rays_d + eps)
    near = jnp.max(jnp.minimum(tmin, tmax), axis=-1)
    far = jnp.min(jnp.maximum(tmin, tmax), axis=-1)
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, min_near)
    return near, far


def near_far_from_bound(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bound: float,
    type: str = "cube",
    min_near: float = 0.05,
):
    """reference: nerf/renderer.py:52-76. Returns [..., 1] near/far."""
    if type == "sphere":
        radius = jnp.linalg.norm(rays_o, axis=-1, keepdims=True)
        near = radius - bound
        far = radius + bound
        near = jnp.maximum(near, min_near)
        return near, far
    aabb = jnp.asarray([-bound, -bound, -bound, bound, bound, bound], jnp.float32)
    near, far = near_far_from_aabb(
        rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), aabb, min_near
    )
    shape = rays_o.shape[:-1] + (1,)
    return near.reshape(shape), far.reshape(shape)


def sph_from_ray(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float
) -> jnp.ndarray:
    """Ray / background-sphere intersection -> normalized (theta, phi).

    reference: raymarching/src/raymarching.cu:162-209 kernel_sph_from_ray
    (the background-model coordinate lookup; unused on the main path but
    part of the kernel API surface). Solves ||o + t d|| = radius for the
    larger root, then returns [2*theta/pi - 1, phi/pi] with y up.
    rays_o/rays_d: [N, 3] -> [N, 2].
    """
    A = jnp.sum(rays_d * rays_d, axis=-1)
    B = jnp.sum(rays_o * rays_d, axis=-1)
    C = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    disc = jnp.maximum(B * B - A * C, 0.0)
    t = (-B + jnp.sqrt(disc)) / A
    p = rays_o + t[:, None] * rays_d
    theta = jnp.arctan2(jnp.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2), p[:, 1])
    phi = jnp.arctan2(p[:, 2], p[:, 0])
    return jnp.stack(
        [2.0 * theta / math.pi - 1.0, phi / math.pi], axis=-1
    )


def _pool_dilate(occ: jnp.ndarray) -> jnp.ndarray:
    """4x max-pool each cascade level, then dilate by one coarse cell
    (3^3 neighborhood max). The result is a conservative superset: any
    fine-occupied voxel marks its coarse cell AND all neighbors, so a
    coarse probe within one cell of a surface always hits. jnp.roll
    wraps at the boundary — extra (spurious) coarse occupancy only, so
    still conservative."""
    C, H = occ.shape[0], occ.shape[-1]
    Hc = H // 4
    p = occ.reshape(C, Hc, 4, Hc, 4, Hc, 4).max(axis=(2, 4, 6))
    for ax in (1, 2, 3):
        p = jnp.maximum(p, jnp.maximum(
            jnp.roll(p, 1, axis=ax), jnp.roll(p, -1, axis=ax)))
    return p


class MarchedRays(NamedTuple):
    """Fixed-budget marched samples for a batch of rays."""

    xyzs: jnp.ndarray    # [N, S, 3] sample positions (clamped to bound)
    dirs: jnp.ndarray    # [N, S, 3]
    ts: jnp.ndarray      # [N, S]   distance along ray
    dts: jnp.ndarray     # [N, S]   marching delta (constant dt)
    real_dts: jnp.ndarray  # [N, S] t_i - t_{i-1} incl. skipped gaps (depth)
    valid: jnp.ndarray   # [N, S]   bool


def march_rays_boxed(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    box: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    n_samples: int = 96,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
    min_near: float = 0.05,
) -> MarchedRays:
    """Gather-free marching: uniform samples inside the per-ray
    intersection with the occupied-cell AABB.

    The occupancy march's probe gathers are the coarse step's single
    largest cost (~65-90 ms/step at the XLA gather ceiling of ~125M
    rows/s, docs/TPU_NOTES.md — a platform bound, not a fusion gap).
    This mode replaces all of them with ONE slab test per ray against
    `box` (occupied_aabb of the live grid, [6]) and places the S-sample
    budget uniformly in [max(near, box_near), min(far, box_far)] —
    pure arithmetic, zero occupancy lookups. Per-sample dt becomes the
    per-ray segment length (variable, like the reference's pure path
    renderer.py:358-413) instead of the occupancy lattice's constant
    dt; empty pockets INSIDE the box are sampled (and cost field evals
    the compacted march would have skipped spending elsewhere), which
    is the quality trade the march-mode A/B prices.

    Degenerate boxes (empty grid: lo == hi) and missing rays produce
    valid=False rows, composited to pure background.
    """
    N = rays_o.shape[0]
    S = n_samples
    b_near, b_far = near_far_from_aabb(rays_o, rays_d, box, min_near)
    t0 = jnp.maximum(nears, b_near)
    t1 = jnp.minimum(fars, b_far)
    hit = t1 > t0
    seg = jnp.where(hit, (t1 - t0) / S, 0.0)  # [N]
    if perturb:
        assert key is not None
        noise = jax.random.uniform(key, (N, 1))
    else:
        noise = jnp.zeros((N, 1))
    k = jnp.arange(S, dtype=jnp.float32)[None, :]
    t_s = t0[:, None] + (k + noise) * seg[:, None]  # [N, S]
    valid = jnp.broadcast_to(hit[:, None], (N, S))
    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * t_s[..., None]
    bound_arr = jnp.maximum(jnp.abs(box[:3]), jnp.abs(box[3:])).max()
    xyzs = jnp.clip(xyzs, -bound_arr, bound_arr)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))
    dts = jnp.where(valid, seg[:, None], 0.0)
    prev = jnp.concatenate(
        [t0[:, None] + (noise - 1.0) * seg[:, None], t_s[:, :-1]], axis=-1)
    real_dts = jnp.where(valid, t_s - prev, 0.0)
    return MarchedRays(
        xyzs=xyzs, dirs=dirs, ts=t_s, dts=dts, real_dts=real_dts,
        valid=valid,
    )


def march_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    occ: jnp.ndarray,
    bound: float,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    max_steps: int = 512,
    n_samples: int = 96,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
    two_level: Optional[bool] = None,
) -> MarchedRays:
    """Occupancy-compacted marching with static [N, S] output.

    rays_o/rays_d: [N, 3]; occ: [C, H, H, H] uint8; nears/fars: [N].
    two_level: None = auto (on for production-size lattices, see below).
    """
    N = rays_o.shape[0]
    K = max_steps
    S = n_samples
    dt = 2.0 * SQRT3 / max_steps  # dt_min with dt_gamma=0 (raymarching.cu:345)

    if perturb:
        assert key is not None
        noise = jax.random.uniform(key, (N, 1))
    else:
        noise = jnp.zeros((N, 1))

    # --- two-level probe: skip leading empty space before the fine pass.
    # The occupancy gather is the march's HBM floor (~64 ms at 8.4M rows,
    # docs/TPU_NOTES.md): probe K/4 coarse lattice points against a
    # 4x-pooled + 1-cell-dilated grid (conservative superset), find the
    # first coarse hit per ray, and start a HALF-length fine lattice
    # there — 2.1M + 4.2M lookups instead of 8.4M, and every [N, K]
    # downstream op (cumsum/count/take) halves. t_start stays an integer
    # multiple of dt past `near`, so surviving samples land on exactly
    # the lattice points the single-level march would have produced; a
    # ray whose occupied span outruns the K/2 window loses tail samples,
    # the same budget semantics as the S-slot cap. Gated on K >= 256:
    # tiny test configs keep the exhaustive single-level probe.
    if two_level is None:
        two_level = K >= 256
    lattice0 = nears[:, None]
    if two_level and K % 4 == 0 and occ.shape[-1] % 4 == 0:
        Kc, K = K // 4, K // 2
        occ_c = _pool_dilate(occ)
        kc = jnp.arange(Kc, dtype=jnp.float32)[None, :]
        t_c = nears[:, None] + (4.0 * kc + 2.0) * dt  # window centers
        pos_c = rays_o[:, None, :] + rays_d[:, None, :] * t_c[..., None]
        pos_c = jnp.clip(pos_c, -bound, bound)
        mask_c = occupancy_lookup(occ_c, pos_c, bound) & (t_c < fars[:, None])
        first = jnp.argmax(mask_c, axis=-1)  # 0 when no hit
        any_hit = jnp.any(mask_c, axis=-1)
        # back off one coarse window (dilation already covers the spatial
        # neighborhood; the backoff covers the along-ray quantization)
        start = jnp.maximum(first - 1, 0).astype(jnp.float32)[:, None] * (
            4.0 * dt)
        lattice0 = jnp.where(any_hit[:, None],
                             nears[:, None] + start,
                             fars[:, None])  # no hits -> empty window

    k = jnp.arange(K, dtype=jnp.float32)[None, :]  # [1, K]
    t = lattice0 + (k + noise) * dt  # [N, K]
    in_range = t < fars[:, None]

    pos = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    pos = jnp.clip(pos, -bound, bound)
    occ_mask = occupancy_lookup(occ, pos, bound) & in_range  # [N, K]

    # --- compaction: indices of the first S occupied lattice points ---
    cum = jnp.cumsum(occ_mask.astype(jnp.int32), axis=-1)  # [N, K]
    total = cum[:, -1]  # [N]
    want = jnp.arange(1, S + 1, dtype=jnp.int32)  # [S]
    # slot s <- smallest k with cum[k] == s+1. Since cum is nondecreasing
    # this equals searchsorted(cum, s+1, left) == #{k : cum[k] < s+1},
    # computed as a fused compare+reduce over the lattice axis. The
    # count form is 24x faster on TPU than the vmapped searchsorted it
    # replaces (XLA lowers batched searchsorted to a serial while-loop;
    # measured 165 ms vs 7 ms at [16384, 512] -> [16384, 96],
    # scripts/profile_march.py) and the [N, K, S] compare fuses into the
    # reduction without materializing.
    slot_idx = jnp.sum(
        (cum[:, :, None] < want[None, None, :]).astype(jnp.int32), axis=1
    )
    valid = want[None, :] <= total[:, None]  # [N, S]
    # Invalid slots get DISTINCT fallback lattice indices (evenly spread
    # over the ray) instead of all clamping to K-1. Clamping gave every
    # invalid slot of a ray the SAME position; on a realistically sparse
    # grid ~98% of samples then hash-gathered the same few table rows and
    # the encode backward's scatter-add serialized on the collision flood
    # (measured: 0.16 it/s vs 112 it/s dense — a 700x data-dependent
    # cliff). Spread fallbacks keep positions unique; their cotangents
    # are zero either way (composite/orient/smooth all mask on `valid`).
    # max(K//S, 1) + clamp: with S > K a plain arange*(K//S) would put
    # every fallback at index 0 (or past K), reinstating the exact
    # collision flood above.
    fallback = jnp.minimum(
        jnp.arange(S, dtype=jnp.int32) * max(K // S, 1), K - 1
    )[None, :]
    slot_idx = jnp.where(valid, jnp.minimum(slot_idx, K - 1), fallback)

    t_s = jnp.take_along_axis(t, slot_idx, axis=-1)  # [N, S]
    # Invalid slots thus hold real, per-slot-distinct lattice positions:
    # the composite masks their sigmas/weights via `valid` (compaction
    # makes `valid` a prefix mask, so the prev-sample depth chain is
    # unaffected) and the extra field evals are gradient-free.
    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * t_s[..., None]
    xyzs = jnp.clip(xyzs, -bound, bound)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, S, 3))

    # real delta: distance to previous kept sample, used only for depth
    # accumulation. The CUDA kernel records t_after_step - last_t
    # (raymarching.cu:459-461), so the cumulative depth coordinate of
    # sample i is t_i + dt - t0; the (t0 - dt) seed below reproduces that.
    t0 = nears[:, None] + noise * dt
    prev = jnp.concatenate([t0 - dt, t_s[:, :-1]], axis=-1)
    real_dts = jnp.where(valid, t_s - prev, 0.0)
    dts = jnp.where(valid, dt, 0.0)

    return MarchedRays(
        xyzs=xyzs, dirs=dirs, ts=t_s, dts=dts, real_dts=real_dts, valid=valid
    )
