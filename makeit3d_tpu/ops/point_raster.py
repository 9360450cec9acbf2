"""Differentiable point-splat rasterizer with alpha compositing.

TPU-native replacement for pytorch3d's rasterize_points +
compositing.alpha_composite as used by the refine stage (reference:
nerf/refine_utils.py:306-333 render_point). The CUDA rasterizer builds
per-pixel top-K z-buffers with atomics; here:

  1. points project to pixel space (the reference's NDC flip/scale is
     folded in),
  2. each point is binned into every 16x16-pixel tile its radius
     touches — binning is a single sort by (tile, z), so per-tile lists
     come out z-ascending with no atomics,
  3. per tile, every pixel composites over the tile's K-point list in
     z order with the over-operator
         w_k = alpha_k * prod_{j<k} (1 - alpha_j),
     truncated to the first `points_per_pixel` in-radius hits; the
     feature accumulation is a [pixels, K] x [K, C] matmul on the MXU.

Gradients flow to point features (and bg features). Point positions are
treated as non-differentiable, matching the reference's usage (vertices
are frozen during refine, nerf/utils.py:812-813).

alpha(dist) follows the reference exactly:
  alpha = 1 - clamp(0.1 * dist2 / r^2, 1e-3, 1) ** 0.5
(reference: refine_utils.py:320-325, in NDC units).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

TILE = 16


def project_points(
    points: jnp.ndarray,    # [N, 3] world
    world2cam: jnp.ndarray,  # [4, 4]
    K: jnp.ndarray,          # [3, 3] intrinsics
    H: int,
    W: int,
):
    """World -> (pixel xy [N, 2], camera z [N]).

    reference: refine_utils.py:307-315 (including the NDC sign flips,
    which cancel against pytorch3d's screen-space convention: the net
    effect is plain pinhole pixel coordinates).
    """
    cam = points @ world2cam[:3, :3].T + world2cam[:3, 3]
    proj = cam @ K.T
    z = proj[:, 2]
    xy = proj[:, :2] / jnp.where(jnp.abs(z[:, None]) < 1e-8, 1e-8, z[:, None])
    return xy, z


class RasterOut(NamedTuple):
    image: jnp.ndarray   # [H, W, C]
    alpha: jnp.ndarray   # [H, W] total accumulated alpha
    # (point, corner) slots beyond the n_passes * tile_capacity window,
    # summed over tiles — nonzero means the composite is missing far
    # points and the caller should raise n_passes (pytorch3d bins every
    # point: reference refine_utils.py:317-331). Scalar i32.
    dropped: jnp.ndarray


def render_points(
    points: jnp.ndarray,        # [N, 3] world positions (non-diff)
    features: jnp.ndarray,      # [N, C] per-point features (diff)
    world2cam: jnp.ndarray,     # [4, 4]
    K: jnp.ndarray,             # [3, 3]
    H: int,
    W: int,
    radius_px: float = 2.0,
    points_per_pixel: int = 8,
    tile_capacity: int = 256,
    bg_features: Optional[jnp.ndarray] = None,  # [C] (diff)
    tile_chunk: int = 256,  # tiles processed together (memory bound)
    use_pallas: Optional[bool] = None,  # fused Pallas tile kernel; None=auto
    n_passes: int = 1,  # capacity chunks composited per tile (static)
) -> RasterOut:
    # The fused Pallas kernel is ~1.4x faster than the XLA tile path on a
    # v5e (48 vs 69 ms fwd+bwd at 800^2 / 200k points) — default on TPU.
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if H % TILE or W % TILE:
        # render at the padded size, crop back (e.g. the 200px pyramid
        # level of the refine stage)
        Hp = -(-H // TILE) * TILE
        Wp = -(-W // TILE) * TILE
        out = render_points(points, features, world2cam, K, Hp, Wp,
                            radius_px, points_per_pixel, tile_capacity,
                            bg_features, tile_chunk, use_pallas, n_passes)
        return RasterOut(image=out.image[:H, :W], alpha=out.alpha[:H, :W],
                         dropped=out.dropped)
    N, C = features.shape
    ty, tx = H // TILE, W // TILE
    n_tiles = ty * tx
    Kcap = tile_capacity

    xy, z = project_points(points, world2cam, K, H, W)
    xy = jax.lax.stop_gradient(xy)
    z = jax.lax.stop_gradient(z)

    behind = z <= 1e-6
    # --- bin points into tiles (up to 4 tiles per point) ---
    # corner-only binning covers every overlapped tile ONLY while the
    # splat's bounding square spans <= 2 tiles per axis
    assert radius_px <= TILE / 2, (
        f"radius_px {radius_px} > TILE/2 ({TILE // 2}): corner binning "
        "would skip interior tiles; raise TILE or shrink the splat"
    )
    r = radius_px
    corners = jnp.asarray(
        [[-r, -r], [r, -r], [-r, r], [r, r]], jnp.float32
    )  # [4, 2]
    cxy = xy[:, None, :] + corners[None]  # [N, 4, 2]
    tix = jnp.floor(cxy[..., 0] / TILE).astype(jnp.int32)
    tiy = jnp.floor(cxy[..., 1] / TILE).astype(jnp.int32)
    in_frame = (tix >= 0) & (tix < tx) & (tiy >= 0) & (tiy < ty)
    tid = tiy * tx + tix  # [N, 4]
    # dedupe: a corner whose tile equals an earlier corner's tile is void
    same01 = tid[:, 1] == tid[:, 0]
    same2 = (tid[:, 2] == tid[:, 0]) | (tid[:, 2] == tid[:, 1])
    same3 = (
        (tid[:, 3] == tid[:, 0]) | (tid[:, 3] == tid[:, 1]) | (tid[:, 3] == tid[:, 2])
    )
    dup = jnp.stack(
        [jnp.zeros_like(same01), same01, same2, same3], axis=1
    )
    valid = in_frame & ~dup & ~behind[:, None]
    tid = jnp.where(valid, tid, n_tiles)  # overflow bucket

    # sort all (point, corner) slots by (tile, z): per-tile z-ascending runs
    flat_tid = tid.reshape(-1)
    flat_pid = jnp.broadcast_to(
        jnp.arange(N)[:, None], (N, 4)
    ).reshape(-1)
    flat_z = jnp.broadcast_to(z[:, None], (N, 4)).reshape(-1)
    # exact lexicographic (tile, z) order: stable-sort z, then tile
    o1 = jnp.argsort(flat_z)
    o2 = jnp.argsort(flat_tid[o1], stable=True)
    order = o1[o2]
    s_tid = flat_tid[order]
    s_pid = flat_pid[order]

    # per-tile ranges via searchsorted
    starts = jnp.searchsorted(s_tid, jnp.arange(n_tiles), side="left")
    counts = jnp.searchsorted(s_tid, jnp.arange(n_tiles), side="right") - starts
    window = n_passes * Kcap
    dropped = jnp.sum(jnp.maximum(counts - window, 0)).astype(jnp.int32)

    # pixel centers per tile
    px = jnp.arange(TILE, dtype=jnp.float32)
    pyy, pxx = jnp.meshgrid(px, px, indexing="ij")   # [TILE, TILE]
    tile_row = (jnp.arange(n_tiles) // tx) * TILE
    tile_col = (jnp.arange(n_tiles) % tx) * TILE
    # pixel coordinates (x, y) + 0.5 center
    pix_x = tile_col[:, None] + pxx.reshape(-1)[None, :] + 0.5  # [T, P]
    pix_y = tile_row[:, None] + pyy.reshape(-1)[None, :] + 0.5
    P = TILE * TILE

    # NDC-unit radius/dist like the reference: ndc units = 2/H per pixel
    r_ndc2 = (radius_px / H * 2.0) ** 2

    offs = jnp.arange(Kcap)
    cap_counts = jnp.minimum(counts, window)

    def gather_pass(p):
        """Slots [p*Kcap, (p+1)*Kcap) of each tile's z-ascending run."""
        idx = starts[:, None] + p * Kcap + offs[None, :]      # [T, Kcap]
        slot_valid = (p * Kcap + offs)[None, :] < cap_counts[:, None]
        idx = jnp.minimum(idx, s_pid.shape[0] - 1)
        tile_pid = s_pid[idx]                                 # [T, Kcap]
        tile_xy = xy[tile_pid]                                # [T, Kcap, 2]
        tile_feat = jnp.where(slot_valid[..., None],
                              features[tile_pid], 0.0)        # [T, Kcap, C]
        return tile_xy, tile_feat, slot_valid

    def tile_render(txy, tfeat, tvalid, px_x, px_y, logt_c, nhit_c):
        # px: [P], txy: [K, 2]; logt_c/nhit_c: [P] carries from earlier
        # passes (log transmittance, hits so far)
        dx = (px_x[:, None] - txy[None, :, 0]) / H * 2.0
        dy = (px_y[:, None] - txy[None, :, 1]) / H * 2.0
        dist2 = dx * dx + dy * dy                    # [P, K]
        hit = (dist2 <= r_ndc2) & tvalid[None, :]
        d = jnp.clip(0.1 * dist2 / r_ndc2, 1e-3, 1.0)
        alpha = jnp.where(hit, 1.0 - jnp.sqrt(d), 0.0)
        # truncate to the first points_per_pixel hits (z order = list order)
        nhit = nhit_c[:, None] + jnp.cumsum(hit.astype(jnp.float32), axis=1)
        alpha = jnp.where(nhit <= points_per_pixel, alpha, 0.0)
        # over-compositing in z order, continuing the carried transmittance
        t_before = (
            jnp.exp(logt_c)[:, None]
            * jnp.cumprod(1.0 - alpha, axis=1) / jnp.maximum(1.0 - alpha, 1e-8)
        )
        w = alpha * t_before                          # [P, K]
        img = w @ tfeat                               # [P, C] on the MXU
        acc = jnp.sum(w, axis=1)
        logt_o = logt_c + jnp.sum(jnp.log1p(-alpha), axis=1)
        nhit_o = nhit[:, -1]
        return img, acc, logt_o, nhit_o

    def xla_pass(tile_xy, tile_feat, slot_valid, logt_c, nhit_c):
        if n_tiles > tile_chunk:
            # bound live memory: vmap within a chunk, scan across chunks
            n_chunks = -(-n_tiles // tile_chunk)
            pad_t = n_chunks * tile_chunk - n_tiles

            def padt(a):
                return jnp.pad(
                    a, [(0, pad_t)] + [(0, 0)] * (a.ndim - 1)
                ).reshape((n_chunks, tile_chunk) + a.shape[1:])

            imgs, accs, logt_o, nhit_o = jax.lax.map(
                lambda c: jax.vmap(tile_render)(*c),
                (padt(tile_xy), padt(tile_feat), padt(slot_valid),
                 padt(pix_x), padt(pix_y), padt(logt_c), padt(nhit_c)),
            )
            return (imgs.reshape(-1, P, C)[:n_tiles],
                    accs.reshape(-1, P)[:n_tiles],
                    logt_o.reshape(-1, P)[:n_tiles],
                    nhit_o.reshape(-1, P)[:n_tiles])
        return jax.vmap(tile_render)(tile_xy, tile_feat, slot_valid,
                                     pix_x, pix_y, logt_c, nhit_c)

    def one_pass(carry, p):
        img_acc, acc_acc, logt_c, nhit_c = carry
        tile_xy, tile_feat, slot_valid = gather_pass(p)
        if use_pallas:
            from .pallas.splat import splat_tiles

            di, da, logt_c, nhit_c = splat_tiles(
                tile_xy, tile_feat, slot_valid, pix_x, pix_y,
                logt_c, nhit_c, r_ndc2, points_per_pixel, 2.0 / H,
            )
        else:
            di, da, logt_c, nhit_c = xla_pass(
                tile_xy, tile_feat, slot_valid, logt_c, nhit_c)
        return (img_acc + di, acc_acc + da, logt_c, nhit_c), None

    init = (
        jnp.zeros((n_tiles, P, C)),
        jnp.zeros((n_tiles, P)),
        jnp.zeros((n_tiles, P)),   # log transmittance
        jnp.zeros((n_tiles, P)),   # hits so far
    )
    if n_passes == 1:
        (imgs, accs, _, _), _ = one_pass(init, jnp.asarray(0))
    else:
        (imgs, accs, _, _), _ = jax.lax.scan(
            one_pass, init, jnp.arange(n_passes))
    # [T, P, C] -> [H, W, C]
    imgs = imgs.reshape(ty, tx, TILE, TILE, C).transpose(0, 2, 1, 3, 4)
    image = imgs.reshape(H, W, C)
    alpha = accs.reshape(ty, tx, TILE, TILE).transpose(0, 2, 1, 3).reshape(H, W)

    if bg_features is not None:
        image = image + (1.0 - alpha)[..., None] * bg_features
    return RasterOut(image=image, alpha=alpha, dropped=dropped)


def suggest_passes(
    points: "np.ndarray",           # [N, 3] world, host
    world2cams,                     # iterable of [4, 4] host poses
    K: "np.ndarray",                # [3, 3]
    H: int,
    W: int,
    radius_px: float = 2.0,
    tile_capacity: int = 256,
    margin: float = 1.25,
    max_passes: int = 8,
) -> int:
    """Host-side n_passes sizing: the max (point, corner) slots landing
    in any tile across the sample poses, with head-room, divided by the
    capacity. Numpy mirror of the traced binning above — call once at
    refine setup (vertices are frozen during refine, so per-pose loads
    only vary with the camera, reference nerf/utils.py:812-813)."""
    import numpy as np

    Hp = -(-H // TILE) * TILE
    Wp = -(-W // TILE) * TILE
    ty, tx = Hp // TILE, Wp // TILE
    worst = 0
    corners = np.asarray(
        [[-radius_px, -radius_px], [radius_px, -radius_px],
         [-radius_px, radius_px], [radius_px, radius_px]], np.float32)
    for w2c in world2cams:
        w2c = np.asarray(w2c, np.float32)
        cam = points @ w2c[:3, :3].T + w2c[:3, 3]
        proj = cam @ np.asarray(K, np.float32).T
        z = proj[:, 2]
        xy = proj[:, :2] / np.where(np.abs(z[:, None]) < 1e-8, 1e-8,
                                    z[:, None])
        cxy = xy[:, None, :] + corners[None]
        tix = np.floor(cxy[..., 0] / TILE).astype(np.int64)
        tiy = np.floor(cxy[..., 1] / TILE).astype(np.int64)
        ok = (tix >= 0) & (tix < tx) & (tiy >= 0) & (tiy < ty) & (z > 1e-6)[:, None]
        tid = (tiy * tx + tix)[ok]
        if tid.size:
            worst = max(worst, int(np.bincount(tid).max()))
    need = -(-int(worst * margin) // tile_capacity) if worst else 1
    return max(1, min(need, max_passes))
