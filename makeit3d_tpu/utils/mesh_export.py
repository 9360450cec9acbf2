"""Textured mesh export.

Equivalent of NeRFRenderer.export_mesh (reference: nerf/renderer.py:
156-330): chunked density query over a 256^3 grid -> isosurface ->
UV atlas -> albedo texture bake -> nearest-neighbor margin inpaint ->
mesh.obj + mesh.mtl + albedo.png.

The reference unwraps UVs with xatlas and rasterizes the atlas with
nvdiffrast (CUDA). Here the atlas is a uniform per-triangle packing
(two triangles per square cell) whose texel -> surface mapping is
closed-form, so the "rasterization" is a single vectorized barycentric
evaluation — no GPU rasterizer needed and every triangle gets equal
texel density. (Chart-based unwrapping would reduce seams; the packing
is deliberately simple and deterministic.)
"""

from __future__ import annotations

import math
import os
from typing import Callable, Tuple

import numpy as np

from .mcubes import marching_cubes


def extract_mesh(
    density_fn: Callable[[np.ndarray], np.ndarray],
    resolution: int = 256,
    threshold: float = 10.0,
    bound: float = 1.0,
    chunk: int = 1 << 18,
    min_component_frac: float = 0.005,
):
    """Chunked density query + isosurface (reference: renderer.py:167-190).

    density_fn: [N, 3] in [-bound, bound] -> [N] sigma (host numpy in/out).
    Returns verts [V, 3] in WORLD coordinates [-bound, bound], tris [T, 3].

    min_component_frac > 0 removes floater dust before the isosurface:
    connected components of the above-threshold voxel field smaller than
    this fraction of the LARGEST component are zeroed (guidance-free /
    early assets can carry millions of dust triangles that swamp the
    atlas; the reference relies on SDS-converged fields being clean).
    Pass 0 for raw reference behavior.
    """
    lin = np.linspace(-1, 1, resolution, dtype=np.float32) * bound
    grid = np.zeros((resolution,) * 3, np.float32)
    xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
    for head in range(0, len(pts), chunk):
        tail = min(head + chunk, len(pts))
        grid.reshape(-1)[head:tail] = np.asarray(density_fn(pts[head:tail]))
    if min_component_frac > 0:
        try:
            from scipy import ndimage

            labels, n = ndimage.label(grid > threshold)
            if n > 1:
                counts = np.bincount(labels.ravel())
                counts[0] = 0  # background
                keep = counts >= counts.max() * min_component_frac
                keep[0] = False
                dropped = int(n - keep.sum())
                if dropped:
                    grid[~keep[labels]] = 0.0
                    print(f"[mesh] dropped {dropped} dust components "
                          f"(< {min_component_frac:.1%} of largest)")
        except ImportError:
            pass  # raw reference behavior without scipy
    verts, tris = marching_cubes(grid, threshold)
    # back to world coords: the lattice spans [-bound, bound], so the
    # texture bake queries the field at the true surface positions for
    # any bound (previously verts stayed in [-1, 1] and bound != 1 runs
    # exported shrunken geometry with mis-sampled albedo)
    verts = (verts / (resolution - 1.0) * 2.0 - 1.0) * bound
    return verts.astype(np.float32), tris.astype(np.int64), grid


def pack_uv_atlas(n_tris: int, margin: float = 0.12) -> np.ndarray:
    """Per-triangle UV packing: 2 triangles per square cell on a
    ceil(sqrt(T/2)) grid. Returns ft_uv [T, 3, 2] in [0, 1].

    Triangle 2k (lower-left):  (m, m), (1-2m, m), (m, 1-2m) of its cell.
    Triangle 2k+1 (upper-right): mirrored.
    """
    cells = math.ceil(math.sqrt(max(n_tris, 1) / 2))
    cell = 1.0 / cells
    uv = np.zeros((n_tris, 3, 2), np.float32)
    t = np.arange(n_tris)
    ci = (t // 2) % cells
    cj = (t // 2) // cells
    lower = (t % 2) == 0
    m = margin * cell
    ox = ci * cell
    oy = cj * cell
    lo = np.stack(
        [np.stack([ox + m, oy + m], -1),
         np.stack([ox + cell - 2 * m, oy + m], -1),
         np.stack([ox + m, oy + cell - 2 * m], -1)], axis=1)
    hi = np.stack(
        [np.stack([ox + cell - m, oy + cell - m], -1),
         np.stack([ox + 2 * m, oy + cell - m], -1),
         np.stack([ox + cell - m, oy + 2 * m], -1)], axis=1)
    uv[lower] = lo[lower]
    uv[~lower] = hi[~lower]
    return uv


def bake_texture(
    verts: np.ndarray,
    tris: np.ndarray,
    ft_uv: np.ndarray,
    albedo_fn: Callable[[np.ndarray], np.ndarray],
    tex_size: int = 2048,
    chunk: int = 640_000,
):
    """Rasterize the atlas and bake albedo.

    Works for ANY non-overlapping per-face UV layout (the chart atlas or
    the legacy per-triangle grid) via the bucketed vectorized rasterizer
    (uv_unwrap.rasterize_atlas); surface positions batch through
    albedo_fn in 640k-point chunks (reference: renderer.py:249-254).
    """
    from .uv_unwrap import rasterize_atlas

    tri_idx, bary, inside = rasterize_atlas(ft_uv, tex_size)
    tri_idx_c = np.where(inside, tri_idx, 0)
    tv = verts[tris[tri_idx_c]]  # [H, W, 3, 3]
    pos = np.einsum("hwc,hwcs->hws", bary, tv)

    tex = np.zeros((tex_size, tex_size, 3), np.float32)
    flat_pos = pos.reshape(-1, 3)
    flat_in = inside.reshape(-1)
    idx = np.nonzero(flat_in)[0]
    cols = np.zeros((len(idx), 3), np.float32)
    for head in range(0, len(idx), chunk):
        sel = idx[head:head + chunk]
        cols[head:head + chunk] = np.asarray(albedo_fn(flat_pos[sel]))
    tex.reshape(-1, 3)[idx] = cols

    # NN inpaint of atlas margins (reference: renderer.py:271-287, with
    # scipy cKDTree instead of sklearn)
    from scipy.ndimage import binary_dilation, binary_erosion
    from scipy.spatial import cKDTree

    mask = inside
    inpaint_region = binary_dilation(mask, iterations=3) & ~mask
    search_region = mask & ~binary_erosion(mask, iterations=2)
    s_coords = np.stack(np.nonzero(search_region), axis=-1)
    i_coords = np.stack(np.nonzero(inpaint_region), axis=-1)
    if len(s_coords) and len(i_coords):
        tree = cKDTree(s_coords)
        _, nn = tree.query(i_coords, k=1)
        tex[tuple(i_coords.T)] = tex[tuple(s_coords[nn].T)]
    return tex, inside


def write_obj(path_dir: str, name: str, verts: np.ndarray, tris: np.ndarray,
              ft_uv: np.ndarray, texture: np.ndarray):
    """mesh.obj + mesh.mtl + albedo.png (reference: renderer.py:297-328).

    Per-face UVs: vt entries are emitted per (face, corner) with v
    flipped like the reference (vt u, 1-v)."""
    import cv2

    os.makedirs(path_dir, exist_ok=True)
    cv2.imwrite(
        os.path.join(path_dir, f"{name}albedo.png"),
        cv2.cvtColor((np.clip(texture, 0, 1) * 255).astype(np.uint8),
                     cv2.COLOR_RGB2BGR),
    )
    obj = os.path.join(path_dir, f"{name}mesh.obj")
    mtl = os.path.join(path_dir, f"{name}mesh.mtl")
    with open(obj, "w") as fp:
        fp.write(f"mtllib {name}mesh.mtl \n")
        for vv in verts:
            fp.write(f"v {vv[0]} {vv[1]} {vv[2]} \n")
        for tuvs in ft_uv:
            for u, v in tuvs:
                fp.write(f"vt {u} {1 - v} \n")
        fp.write("usemtl mat0 \n")
        for i, tri in enumerate(tris):
            t0, t1, t2 = 3 * i + 1, 3 * i + 2, 3 * i + 3
            fp.write(
                f"f {tri[0] + 1}/{t0} {tri[1] + 1}/{t1} {tri[2] + 1}/{t2} \n"
            )
    with open(mtl, "w") as fp:
        fp.write("newmtl mat0 \n")
        fp.write("Ka 1.000000 1.000000 1.000000 \n")
        fp.write("Kd 1.000000 1.000000 1.000000 \n")
        fp.write("Ks 0.000000 0.000000 0.000000 \n")
        fp.write("Tr 1.000000 \n")
        fp.write("illum 1 \n")
        fp.write("Ns 0.000000 \n")
        fp.write(f"map_Kd {name}albedo.png \n")


def export_textured_mesh(
    density_fn, albedo_fn, save_dir: str, resolution: int = 256,
    threshold: float = 10.0, bound: float = 1.0, tex_size: int = 2048,
    name: str = "", unwrap_mode: str = "charts",
):
    """Full export pipeline (reference: export_mesh, renderer.py:156-330).

    unwrap_mode: "charts" = normal-cone chart atlas (xatlas-equivalent,
    utils/uv_unwrap.py — continuous texture inside each chart); "grid" =
    the per-triangle uniform packing (seam on every edge, but fully
    deterministic and degenerate-proof)."""
    verts, tris, _ = extract_mesh(density_fn, resolution, threshold, bound)
    if len(tris) == 0:
        raise ValueError("empty isosurface; check density threshold")
    if unwrap_mode == "charts":
        from .uv_unwrap import unwrap

        try:
            ft_uv = unwrap(verts, tris, tex_size)
        except RuntimeError as e:
            # a degenerate/noisy isosurface can defeat chart packing;
            # the per-triangle grid is seam-heavy but cannot fail
            print(f"[WARN] chart unwrap failed ({e}); falling back to "
                  "the per-triangle uniform atlas")
            ft_uv = pack_uv_atlas(len(tris))
    else:
        ft_uv = pack_uv_atlas(len(tris))
    tex, _ = bake_texture(verts, tris, ft_uv, albedo_fn, tex_size)
    write_obj(save_dir, name, verts, tris, ft_uv, tex)
    return verts, tris
