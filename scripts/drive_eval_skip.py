"""Drive Trainer.render_image (the production eval path) on the real
TPU with a converged sparse-grid checkpoint: asserts the host-side
per-frame regime pick chooses the tiled skip program, times the frame,
and saves the PNG for eyeballing.

Usage: python scripts/drive_eval_skip.py CKPT [res]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ckpt = sys.argv[1]
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(guidance="none", workspace="results/_drive_tmp",
                 backbone=os.environ.get("DRIVE_BACKBONE", "fourier"),
                 # DRIVE_DUST=0.5 = dominant-component eval filter (cull
                 # aliasing junk on guidance-free assets; TPU_NOTES r5)
                 eval_dust_frac=float(os.environ.get("DRIVE_DUST",
                                                     "0.005")),
                 # DRIVE_EVAL_BOXED=1: time the gather-free boxed EVAL
                 # march (Config.eval_march_boxed) on the same frame
                 eval_march_boxed=os.environ.get("DRIVE_EVAL_BOXED") == "1",
                 eval_ref_hit=os.environ.get("DRIVE_REF_HIT") == "1")
    tr = Trainer(cfg, name="drive", use_checkpoint=ckpt)

    view = ViewSampler(cfg, type="test", H=res, W=res, size=8, seed=0).get(0)

    out = tr.render_image(view, bg_color=1.0)  # compile + first frame
    used_skip = bool(tr._last_eval_used_skip)
    t0 = time.time()
    n = 3
    for _ in range(n):
        out = tr.render_image(view, bg_color=1.0)
    dt = (time.time() - t0) / n

    img = np.asarray(out["image"]).reshape(res, res, 3)
    ws = np.asarray(out["weights_sum"]).reshape(res, res)
    png = "results/drive_eval_skip.png"
    try:
        import imageio.v2 as imageio
        imageio.imwrite(png, (np.clip(img, 0, 1) * 255).astype(np.uint8))
    except Exception:
        png = None
    print(json.dumps({
        "ckpt": ckpt, "res": res, "used_skip": used_skip,
        "frame_ms": round(dt * 1000, 1),
        "ws_mean": round(float(ws.mean()), 4),
        "center_ws": round(float(ws[res // 2, res // 2]), 4),
        "corner_ws": round(float(ws[2, 2]), 4),
        "png": png,
    }))


if __name__ == "__main__":
    main()
