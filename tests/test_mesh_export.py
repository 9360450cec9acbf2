"""Mesh export tests: marching tetrahedra (native + numpy paths agree,
sphere geometry correct, watertight, outward normals), UV atlas packing,
texture bake, OBJ writing."""

import os

import numpy as np
import pytest

from makeit3d_tpu.utils import mcubes
from makeit3d_tpu.utils.mesh_export import (
    bake_texture,
    export_textured_mesh,
    pack_uv_atlas,
)


def sphere_grid(R=48, radius=0.6):
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    # density high inside the sphere
    return (radius - np.sqrt(x**2 + y**2 + z**2)).astype(np.float32)


def test_marching_tets_sphere_native():
    grid = sphere_grid()
    verts, tris = mcubes.marching_cubes(grid, 0.0)
    assert len(verts) > 500 and len(tris) > 500
    R = grid.shape[0]
    pts = verts / (R - 1) * 2 - 1
    r = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert np.abs(r - 0.6).max() < 0.06

    # watertight: every undirected edge is used by exactly 2 triangles
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # outward orientation: face normals align with radial direction
    p0, p1, p2 = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    c = (p0 + p1 + p2) / 3
    agree = (np.einsum("ij,ij->i", n, c) > 0).mean()
    assert agree > 0.99


def test_numpy_fallback_matches_native():
    grid = sphere_grid(R=24)
    v1, t1 = mcubes._marching_tets_numpy(grid, 0.0)
    lib = mcubes._build_native()
    if lib is None:
        pytest.skip("native lib unavailable")
    v2, t2 = mcubes.marching_cubes(grid, 0.0)
    assert len(v1) == len(v2) and len(t1) == len(t2)
    # same vertex set (order may differ)
    s1 = np.sort(np.round(v1, 4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]),
                 axis=0)
    s2 = np.sort(np.round(v2, 4).view([("x", "f4"), ("y", "f4"), ("z", "f4")]),
                 axis=0)
    assert (s1 == s2).all()


def test_uv_atlas_no_overlap():
    uv = pack_uv_atlas(100)
    assert uv.shape == (100, 3, 2)
    assert uv.min() >= 0 and uv.max() <= 1
    # triangle areas equal and positive
    v0 = uv[:, 1] - uv[:, 0]
    v1 = uv[:, 2] - uv[:, 0]
    areas = 0.5 * np.abs(v0[:, 0] * v1[:, 1] - v0[:, 1] * v1[:, 0])
    assert (areas > 0).all()
    np.testing.assert_allclose(areas, areas[0], rtol=1e-5)


def test_export_textured_mesh(tmp_path):
    def density_fn(pts):
        return 20.0 * (0.5 - np.linalg.norm(pts, axis=-1))

    def albedo_fn(pts):
        # color by octant: checks that baked texels map to real positions
        return (pts > 0).astype(np.float32)

    verts, tris = export_textured_mesh(
        density_fn, albedo_fn, str(tmp_path), resolution=32,
        threshold=0.0, tex_size=256,
    )
    assert os.path.exists(tmp_path / "mesh.obj")
    assert os.path.exists(tmp_path / "mesh.mtl")
    assert os.path.exists(tmp_path / "albedo.png")
    # obj parses: v/vt/f counts consistent
    lines = open(tmp_path / "mesh.obj").read().splitlines()
    nv = sum(1 for l in lines if l.startswith("v "))
    nvt = sum(1 for l in lines if l.startswith("vt "))
    nf = sum(1 for l in lines if l.startswith("f "))
    assert nv == len(verts) and nf == len(tris) and nvt == 3 * len(tris)
    import cv2

    tex = cv2.imread(str(tmp_path / "albedo.png"))
    assert tex.shape == (256, 256, 3)
    assert tex.max() > 100  # non-empty bake


def test_extract_mesh_drops_dust_components():
    """A tiny floater blob far from the main body is removed by the
    connected-component pre-filter; with frac=0 it is kept (raw
    reference behavior)."""
    import numpy as np

    from makeit3d_tpu.utils.mesh_export import extract_mesh

    def density_fn(p):
        main = 50.0 * (np.linalg.norm(p, axis=-1) < 0.4)
        dust = 50.0 * (np.linalg.norm(p - 0.8, axis=-1) < 0.03)
        return main + dust

    v_clean, t_clean, _ = extract_mesh(density_fn, resolution=96,
                                       threshold=10.0)
    v_raw, t_raw, _ = extract_mesh(density_fn, resolution=96,
                                   threshold=10.0, min_component_frac=0.0)
    assert len(t_raw) > len(t_clean) > 0
    # no clean vertex near the dust blob; raw has some
    assert not (np.linalg.norm(v_clean - 0.8, axis=-1) < 0.1).any()
    assert (np.linalg.norm(v_raw - 0.8, axis=-1) < 0.1).any()
