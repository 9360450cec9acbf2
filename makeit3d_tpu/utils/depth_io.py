"""Depth-map I/O: PFM read/write and 16-bit depth PNG round trips.

TPU-free host utilities mirroring the reference's DPT/util/io.py
(read_pfm :14-61, write_pfm :63-106, write_depth_name :217-244, plus the
mask writer). The reference round-trips the DPT prediction through a
16-bit PNG (main.py:205-206); this module supplies the same contract for
artifact compatibility, though the in-memory pipeline skips the disk
round trip by default (utils.image.normalize_depth applies the identical
min-max normalization directly).
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np


def read_pfm(path: str) -> Tuple[np.ndarray, float]:
    """Read a PFM file -> (data [H,W] or [H,W,3] f32, scale)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip().decode("ascii")
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        m = re.match(r"^(\d+)\s(\d+)\s*$", f.readline().decode("ascii"))
        if not m:
            raise ValueError("malformed PFM header")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
        shape = (height, width, 3) if color else (height, width)
        return np.flipud(data.reshape(shape)), scale


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    """Write [H,W] or [H,W,3] float32 as PFM (bottom-up, little-endian)."""
    image = np.asarray(image, np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
        image = image.reshape(image.shape[0], image.shape[1])
    else:
        raise ValueError("image must be HxW, HxWx1 or HxWx3")
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode("ascii"))
        f.write(f"{-scale}\n".encode("ascii"))  # little-endian
        np.flipud(image).astype("<f4").tofile(f)


def depth_to_uint(depth: np.ndarray, bits: int = 2,
                  absolute_depth: bool = False) -> np.ndarray:
    """Min-max normalize a depth map into the uint8/uint16 range
    (reference: DPT/util/io.py:225-239). bits=2 -> uint16, the encoding
    main.py:205 writes and re-reads as `png / 65535`."""
    depth = np.asarray(depth, np.float64)
    if absolute_depth:
        out = depth
    else:
        max_val = (2 ** (8 * bits)) - 1
        rng = depth.max() - depth.min()
        if rng > np.finfo(np.float64).eps:
            out = max_val * (depth - depth.min()) / rng
        else:
            out = np.zeros_like(depth)
    return out.astype(np.uint8 if bits == 1 else np.uint16)


def write_depth(path: str, depth: np.ndarray, bits: int = 2,
                absolute_depth: bool = False) -> None:
    """Write a depth PNG (8- or 16-bit). path may omit the .png suffix,
    matching the reference's write_depth_name."""
    import cv2

    if not path.endswith(".png"):
        path = path + ".png"
    cv2.imwrite(path, depth_to_uint(depth, bits, absolute_depth))


def read_depth(path: str) -> np.ndarray:
    """Read a depth PNG back to [0, 1] float (reference: main.py:206)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    denom = 65535.0 if img.dtype == np.uint16 else 255.0
    return np.asarray(img, np.float64) / denom


def write_mask(path: str, mask: np.ndarray) -> None:
    """Binary mask -> PNG (reference: DPT/util/io.py mask writer)."""
    import cv2

    if not path.endswith(".png"):
        path = path + ".png"
    cv2.imwrite(path, (np.asarray(mask) > 0).astype(np.uint8) * 255)
