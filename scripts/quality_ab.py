"""Backbone quality A/B on the frontal-fit ladder (round-2 verdict item 7).

The TPU flagship substitutes the `fourier` matmul-only field for the
reference's default tiny-cuda-nn hash grid (reference:
nerf/network_tcnn.py:52-65 vs nerf/network.py) because the hash
backward is pinned at the XLA:TPU scatter-add ceiling
(docs/TPU_NOTES.md). That substitution needs a QUALITY datum: fit each
backbone on the reference image's frontal view (BASELINE.json config 1
shape: guidance-free, the front view is data-constrained and every 4th
step; novel views contribute only regularizers) and report

  - PSNR / SSIM of the rendered front view vs the reference composite
    (the reference's own lambda_img L1 target, nerf/utils.py:554-559),
  - Pearson correlation of rendered depth vs the DPT pseudo-depth in
    the object mask (the reference's depth loss, nerf/utils.py:417-433).

Identical config apart from `backbone`. Prints one JSON line per
backbone plus a summary; paste the table into BASELINE.md.

Usage:
  [JAX_PLATFORMS=cpu] python scripts/quality_ab.py [iters] [res] [bb,bb,...]
  defaults: 400 iters, 64^2, fourier,hashgrid,vanilla
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("AB_REF", "/root/reference/demo/teddy.png")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    backbones = (sys.argv[3].split(",") if len(sys.argv) > 3
                 else ["fourier", "hashgrid", "vanilla"])

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import cv2

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.training.trainer import Trainer
    from makeit3d_tpu.utils.image import (
        erode_mask, estimate_depth, load_ref_image, normalize_depth,
    )
    from makeit3d_tpu.utils.metrics import psnr, ssim

    ref_rgba, ori_rgb = load_ref_image(REF)
    ref_mask = erode_mask((ref_rgba[0, :, :, 3] * 255).astype(np.uint8))
    disparity = estimate_depth(ori_rgb, None)
    disparity = cv2.resize(np.asarray(disparity, np.float64), (512, 512))
    ref_depth = normalize_depth(disparity, ref_mask)

    # gt at render res, white bg (eval renders use bg_color=1)
    gt512 = (ref_rgba[0, :, :, :3] * ref_rgba[0, :, :, 3:]
             + 1.0 * (1.0 - ref_rgba[0, :, :, 3:]))
    gt = cv2.resize(gt512.astype(np.float32), (res, res),
                    interpolation=cv2.INTER_AREA)
    gtd = cv2.resize(ref_depth.astype(np.float32), (res, res),
                     interpolation=cv2.INTER_AREA)
    gtm = cv2.resize(ref_mask.astype(np.float32), (res, res),
                     interpolation=cv2.INTER_AREA) > 0.5

    # extra Config overrides, e.g. AB_OVERRIDES='{"smooth_subset":0.25}'
    # AB_TAG suffixes the workspace/row so two configs can coexist.
    # AB_SEEDS='0,1,2' runs each leg per seed and adds a mean +/- spread
    # summary row (round-4 verdict weak #4: a single-seed 400-iter A/B
    # showed a 5.7 dB swing between nominally-nested configs; defaults
    # must clear a seeded spread, not one draw).
    overrides = json.loads(os.environ.get("AB_OVERRIDES", "{}"))
    tag = os.environ.get("AB_TAG", "")
    seeds = [int(s) for s in os.environ.get("AB_SEEDS", "0").split(",")]

    rows = []
    for bb in backbones:
        seed_rows = []
        for seed in seeds:
            ws = os.path.join(
                "results",
                f"ab_{bb}{tag}" + (f"_s{seed}" if seed != 0 else ""))
            cfg = Config(
                guidance="none", backbone=bb, h=res, w=res, H=res, W=res,
                iters=iters, eval_interval=1_000_000,  # no mid-run evals
                workspace=ws, **overrides,
            )
            t0 = time.time()
            trainer = Trainer(cfg, guidance=None, ref_rgba=ref_rgba,
                              ref_depth=ref_depth, ref_mask=ref_mask,
                              workspace=ws, seed=seed,
                              use_checkpoint="scratch")
            trainer.train(max_epochs=-(-iters // 100))
            train_min = (time.time() - t0) / 60.0

            # the exact front pose: train sampler index 0 (front every
            # 4th, reference provider.py:143-214)
            view = ViewSampler(cfg, type="train", H=res, W=res, size=4,
                               seed=0).get(0)
            out = trainer.render_image(view, bg_color=1.0)
            img = np.clip(out["image"], 0.0, 1.0)

            # depth Pearson in the object mask (same formulation as the
            # training loss, losses.masked_pearson_depth, on the render)
            pd, gd = out["depth"][gtm], gtd[gtm]
            if pd.std() > 1e-8 and gd.std() > 1e-8:
                pearson = float(np.corrcoef(pd, gd)[0, 1])
            else:
                pearson = float("nan")

            # junk-density telemetry (round-5: guidance-free assets grew
            # e^15-saturated junk blobs that pinned the occupied box at
            # the full bound — Config.lambda_sigma_cap docstring): raw
            # occupancy fraction + dust-filtered box extent along x
            occ = np.asarray(trainer.grid.occ)
            from makeit3d_tpu.ops.grid import dust_filter_occ

            occ_f, _ = dust_filter_occ(occ, 0.005)
            idx = np.argwhere(occ_f[0] > 0)
            box_ext = (float((idx.max(0) - idx.min(0) + 1).max()
                             / occ.shape[-1]) if idx.size else 0.0)

            row = {
                "backbone": bb + tag,
                "seed": seed,
                "iters": iters,
                "res": res,
                "front_psnr_db": round(psnr(img, gt), 2),
                "front_ssim": round(ssim(img, gt), 4),
                "depth_pearson": round(pearson, 4),
                "occ_frac": round(float((occ > 0).mean()), 4),
                "box_ext_max": round(box_ext, 3),
                "train_minutes": round(train_min, 2),
                "device": str(jax.devices()[0]),
            }
            print(json.dumps(row), flush=True)
            seed_rows.append(row)
        rows.extend(seed_rows)
        if len(seeds) > 1:
            agg = {"backbone": bb + tag, "seeds": seeds}
            for kmet in ("front_psnr_db", "front_ssim", "depth_pearson",
                         "occ_frac", "box_ext_max"):
                vals = np.asarray([r[kmet] for r in seed_rows], np.float64)
                agg[kmet + "_mean"] = round(float(vals.mean()), 3)
                agg[kmet + "_spread"] = round(
                    float(vals.max() - vals.min()), 3)
            print(json.dumps(agg), flush=True)
            rows.append(agg)

    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
