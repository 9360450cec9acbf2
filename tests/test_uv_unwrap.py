"""Chart-based UV unwrap (utils/uv_unwrap.py): adjacency, chart growth
invariants, packing disjointness, rasterization correctness, and the
end-to-end bake round-trip through mesh_export.

Reference tier: xatlas unwrap + nvdiffrast atlas raster
(nerf/renderer.py:199-287).
"""

import numpy as np
import pytest

from makeit3d_tpu.utils.uv_unwrap import (
    build_adjacency,
    face_normals,
    flatten_charts,
    grow_charts,
    pack_charts,
    rasterize_atlas,
    unwrap,
)


def icosphere(subdiv: int = 2):
    """Unit icosphere (verts, tris) with 20 * 4**subdiv faces."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    tris = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int64)
    for _ in range(subdiv):
        cache = {}
        vlist = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (vlist[a] + vlist[b]) / 2
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        new = []
        for a, b, c in tris:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(vlist)
        tris = np.asarray(new, np.int64)
    return verts, tris


def test_adjacency_closed_mesh():
    """Every edge of a closed manifold mesh has exactly one neighbor,
    and adjacency is symmetric."""
    verts, tris = icosphere(1)
    adj = build_adjacency(tris)
    assert adj.shape == (len(tris), 3)
    assert (adj >= 0).all()  # closed surface: no boundary edges
    for f in range(len(tris)):
        for g in adj[f]:
            assert f in adj[g]


def test_chart_growth_invariants():
    verts, tris = icosphere(2)
    chart_id, seed_n = grow_charts(verts, tris, cone_deg=60.0)
    assert (chart_id >= 0).all()  # total assignment
    normals = face_normals(verts, tris)
    # every face within its chart's cone
    cos = np.einsum("ts,ts->t", normals, seed_n[chart_id])
    assert (cos >= np.cos(np.radians(60.0)) - 1e-9).all()
    # the sphere cannot be one chart under a 60-degree cone
    assert chart_id.max() >= 3


def test_flatten_no_flips():
    """Planar projection under the cone bound keeps UV winding positive."""
    verts, tris = icosphere(2)
    chart_id, seed_n = grow_charts(verts, tris, cone_deg=60.0)
    uv = flatten_charts(verts, tris, chart_id, seed_n)
    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]
    signed = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    assert (np.abs(signed) > 0).all()
    assert (signed > 0).all() or (signed < 0).all() or True  # orientation
    # 3D winding projected along +seed_normal preserves sign per face
    normals = face_normals(verts, tris)
    cos = np.einsum("ts,ts->t", normals, seed_n[chart_id])
    assert ((signed > 0) == (cos > 0)).all()


def test_pack_charts_in_bounds_and_disjoint():
    verts, tris = icosphere(2)
    ft_uv = unwrap(verts, tris, tex_size=256)
    assert ft_uv.shape == (len(tris), 3, 2)
    assert (ft_uv >= 0).all() and (ft_uv <= 1).all()
    # rasterize and confirm no texel is claimed by two charts (margins):
    # rasterize per chart, intersect claim masks
    chart_id, seed_n = grow_charts(verts, tris, 60.0)
    tri_idx, _, inside = rasterize_atlas(ft_uv, 256)
    owner_chart = np.where(inside, chart_id[np.where(inside, tri_idx, 0)], -1)
    # interior texels map to exactly one chart by construction of the
    # maps; the real disjointness check is geometric: chart bboxes with
    # margins must not intersect
    mins = np.full((chart_id.max() + 1, 2), np.inf)
    maxs = np.full((chart_id.max() + 1, 2), -np.inf)
    fc = np.repeat(chart_id, 3)
    np.minimum.at(mins, fc, ft_uv.reshape(-1, 2))
    np.maximum.at(maxs, fc, ft_uv.reshape(-1, 2))
    n = len(mins)
    for a in range(n):
        for b in range(a + 1, n):
            sep = (mins[a] >= maxs[b]).any() or (mins[b] >= maxs[a]).any()
            assert sep, f"chart bboxes {a} and {b} overlap"


def test_rasterize_reconstructs_uv():
    """A rasterized texel's barycentric combination of its face's UV
    corners lands back on the texel center (within half a texel)."""
    verts, tris = icosphere(1)
    ft_uv = unwrap(verts, tris, tex_size=128)
    tri_idx, bary, inside = rasterize_atlas(ft_uv, 128)
    ys, xs = np.nonzero(inside)
    t = tri_idx[ys, xs]
    w = bary[ys, xs]  # [N, 3]
    uv = np.einsum("nc,ncd->nd", w, ft_uv[t]) * 128
    err = np.abs(uv - np.stack([xs + 0.5, ys + 0.5], -1))
    # clipped-eps edge texels can sit just outside; typical err ~ 0
    assert np.median(err) < 0.1
    assert err.max() < 2.0


def test_coverage_fraction():
    """The atlas should actually use its area. Round chart outlines fill
    ~50-70% of their bboxes and margins are relatively fat at 256px, so
    the floor is modest; at the production 2048px the same mesh packs
    denser (margins amortize)."""
    verts, tris = icosphere(2)
    ft_uv = unwrap(verts, tris, tex_size=256)
    _, _, inside = rasterize_atlas(ft_uv, 256)
    assert inside.mean() > 0.30


def test_bake_round_trip():
    """End-to-end: bake a position-encoded albedo and check texels
    reproduce the surface position used to shade them."""
    from makeit3d_tpu.utils.mesh_export import bake_texture

    verts, tris = icosphere(2)
    ft_uv = unwrap(verts, tris, tex_size=256)

    def albedo_fn(pos):
        return (np.asarray(pos) + 1.0) / 2.0  # position -> color

    tex, inside = bake_texture(verts, tris, ft_uv, albedo_fn, tex_size=256)
    tri_idx, bary, _ = rasterize_atlas(ft_uv, 256)
    ys, xs = np.nonzero(inside)
    t = np.asarray(tri_idx[ys, xs])
    pos = np.einsum("nc,ncs->ns", bary[ys, xs], verts[tris[t]])
    want = (pos + 1.0) / 2.0
    got = tex[ys, xs]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_mode_still_works():
    """The legacy per-triangle packing goes through the same generic
    rasterizer now; the bake must still cover every triangle."""
    from makeit3d_tpu.utils.mesh_export import bake_texture, pack_uv_atlas

    verts, tris = icosphere(1)
    ft_uv = pack_uv_atlas(len(tris))
    tri_idx, _, inside = rasterize_atlas(ft_uv, 256)
    covered = np.unique(tri_idx[inside])
    assert len(covered) == len(tris)

    def albedo_fn(pos):
        return np.full((len(pos), 3), 0.5, np.float32)

    tex, ins = bake_texture(verts, tris, ft_uv, albedo_fn, tex_size=256)
    assert ins.mean() > 0.2
    np.testing.assert_allclose(tex[ins], 0.5, atol=1e-6)


def test_pack_many_tiny_charts_shrinks_margin():
    """A noisy isosurface can have tens of thousands of single-triangle
    charts; at the default 4px margin the fixed per-chart cost alone
    exceeds the atlas (the guidance-free teddy export failure). The
    packer must shrink the margin and still place every chart in
    bounds without overlap of chart rects."""
    from makeit3d_tpu.utils.uv_unwrap import pack_charts

    rng = np.random.default_rng(0)
    n = 30_000
    base = rng.random((n, 1, 2))
    uv = base + rng.random((n, 3, 2)) * 0.003  # tiny triangles
    chart_id = np.arange(n)
    ft = pack_charts(uv, chart_id, n, tex_size=1024, margin_px=4.0)
    assert ft.shape == (n, 3, 2)
    assert ft.min() >= 0.0 and ft.max() <= 1.0
    # chart rects disjoint: quantize each chart's bbox to texels and
    # check total painted area == sum of areas (no double paint)
    px = ft * 1024
    lo = np.floor(px.min(axis=1)).astype(int)
    hi = np.ceil(px.max(axis=1)).astype(int)
    painted = np.zeros((1024, 1024), bool)
    overlap = 0
    for i in range(0, n, 997):  # sampled subset keeps the test fast
        sl = (slice(lo[i, 1], hi[i, 1]), slice(lo[i, 0], hi[i, 0]))
        if painted[sl].any():
            overlap += 1
        painted[sl] = True
    assert overlap == 0
