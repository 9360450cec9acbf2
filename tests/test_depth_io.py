"""Depth I/O round trips (reference contract: DPT/util/io.py, main.py:205-206)."""

import numpy as np

from makeit3d_tpu.utils.depth_io import (
    depth_to_uint,
    read_depth,
    read_pfm,
    write_depth,
    write_mask,
    write_pfm,
)


def test_pfm_roundtrip_gray(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(13, 17)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img, scale=1.0)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_roundtrip_color(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.normal(size=(7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "c.pfm")
    write_pfm(p, img)
    back, _ = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_depth_png_roundtrip_matches_reference_encoding(tmp_path):
    rng = np.random.default_rng(2)
    depth = rng.uniform(80, 150, size=(32, 32))  # DPT output range note, main.py:204
    p = str(tmp_path / "d")
    write_depth(p, depth, bits=2)
    back = read_depth(p + ".png")
    # the reference reads png/65535 -> min-max normalized disparity
    expected = (depth - depth.min()) / (depth.max() - depth.min())
    np.testing.assert_allclose(back, expected, atol=1.0 / 65535)


def test_depth_to_uint_constant_input():
    out = depth_to_uint(np.full((4, 4), 3.0), bits=2)
    assert out.dtype == np.uint16
    assert (out == 0).all()


def test_write_mask(tmp_path):
    import cv2

    m = np.zeros((8, 8), bool)
    m[2:5, 3:6] = True
    p = str(tmp_path / "m.png")
    write_mask(p, m)
    back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back > 0, m)
