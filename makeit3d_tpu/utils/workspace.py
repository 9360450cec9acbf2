"""Workspace layout, logging, checkpoints and artifact writers.

Mirrors the reference's on-disk contract so downstream tooling keeps
working (reference: nerf/utils.py:332-344 workspace dirs & log file,
:671-744 test artifacts, :1075-1122 checkpoints; main.py:174-178
setting.txt dump).
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np


def default_primary() -> bool:
    """True iff this host is the designated artifact writer.

    Multi-host SPMD runs execute the same program on every host; host 0
    owns the filesystem side effects (logs, scalars, checkpoints,
    renders) and the others compute silently — the rank-gating policy
    is documented in docs/MULTIHOST.md. Single-process runs (the
    reference's only mode, nerf/utils.py:332-344) are always primary."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class Workspace:
    """results/<name>/{train,validation,result,mvimg,refine,checkpoints}."""

    def __init__(self, root: str, name: str = "df", mute: bool = False,
                 primary: Optional[bool] = None):
        self.root = root
        self.name = name
        self.mute = mute
        self.primary = default_primary() if primary is None else primary
        self.ckpt_dir = os.path.join(root, "checkpoints")
        self.train_dir = os.path.join(root, "train")
        self.valid_dir = os.path.join(root, "validation")
        self.result_dir = os.path.join(root, "result")
        self.log_path = os.path.join(root, f"log_{name}.txt")
        self.metrics_path = os.path.join(root, "metrics.jsonl")
        if not self.primary:
            # non-primary hosts make no filesystem writes at all — not
            # even directories (the workspace may live on a shared FS)
            self._log_fp = None
            self._metrics_fp = None
            return
        os.makedirs(root, exist_ok=True)
        for d in (self.ckpt_dir, self.train_dir):
            os.makedirs(d, exist_ok=True)
        self._log_fp = open(self.log_path, "a+")
        self._metrics_fp = open(self.metrics_path, "a+")

    def log(self, *args):
        if not self.primary:
            return
        msg = " ".join(str(a) for a in args)
        if not self.mute:
            print(msg)
        self._log_fp.write(msg + "\n")
        self._log_fp.flush()

    def scalar(self, tag: str, value: float, step: int):
        """tensorboardX equivalent: append-only jsonl scalars
        (reference: utils.py:996-998)."""
        if not self.primary:
            return
        self._metrics_fp.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "ts": time.time()}) + "\n"
        )
        self._metrics_fp.flush()

    def dump_settings(self, cfg):
        if not self.primary:
            return
        with open(os.path.join(self.root, "setting.txt"), "w") as f:
            f.write("------------------ start ------------------\n")
            for k, v in sorted(vars(cfg).items()):
                f.write(f"{k} : {v}\n")
            f.write("------------------- end -------------------")

    def close(self):
        if self._log_fp is not None:
            self._log_fp.close()
        if self._metrics_fp is not None:
            self._metrics_fp.close()


def save_image_u8(path: str, img: np.ndarray):
    """[H, W, 3] or [H, W] float in [0,1] -> 8-bit PNG."""
    import cv2

    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, arr)


def save_depth_u16(path: str, depth: np.ndarray, scale: float = 1000.0):
    """uint16 depth PNG, reference convention depth*1000
    (reference: utils.py:723-730)."""
    import cv2

    arr = (np.asarray(depth) * scale).astype(np.uint16)
    cv2.imwrite(path, arr)


def write_video(path: str, frames: List[np.ndarray], fps: int = 25):
    """mp4 writer (reference: utils.py:735-739 imageio.mimwrite).

    Tries cv2's mp4 encoder, then imageio/ffmpeg; in environments with
    neither codec, falls back to an animated GIF next to the requested
    path so the orbit artifact always exists.
    """
    arr = np.stack(frames, axis=0)
    try:
        import cv2

        h, w = arr.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
        if vw.isOpened():
            for f in arr:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
            if os.path.getsize(path) > 0:
                return
    except Exception:
        pass
    try:
        import imageio

        imageio.mimwrite(path, arr, fps=fps, quality=8, macro_block_size=1)
        return
    except Exception:
        import imageio

        gif = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif, arr, duration=1000 / fps)


# ---------------- checkpoints ----------------

def save_checkpoint(ckpt_dir: str, name: str, state: Dict[str, Any],
                    max_keep: int = 2):
    """Serialize a pytree checkpoint (reference: utils.py:1075-1104).

    Uses flax msgpack for arrays + a json sidecar for scalars.
    """
    from flax import serialization

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{name}.ckpt")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    # rotation — the eval-gated best slot (*_best.ckpt) sits outside the
    # window (reference keeps best.pth out of max_keep_ckpt rotation,
    # utils.py:1106-1122)
    ckpts = sorted(
        p for p in glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
        if not p.endswith("_best.ckpt")
    )
    while len(ckpts) > max_keep:
        os.remove(ckpts.pop(0))
    return path


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "*.ckpt")))
    return ckpts[-1] if ckpts else None
