"""Render-fidelity harness (VERDICT round-1 item 5a).

Measures, for a trained checkpoint:
  1. occupancy-path vs pure-path-oracle agreement (PSNR/SSIM) across an
     orbit — the two renderers share the field but nothing else
     (static-lattice marching + fixed budget vs uniform+importance
     sampling), so agreement validates the production path end to end;
  2. (optional) drift vs a previous round's saved orbit PNGs.

Prints one JSON line; paste the numbers into BASELINE.md.

Usage:
  python scripts/fidelity.py CKPT [n_views] [res] [prev_render_dir]
  env FIDELITY_BACKBONE=fourier overrides the field family (default
  hashgrid) — must match the checkpoint's.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ckpt = sys.argv[1]
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    prev_dir = sys.argv[4] if len(sys.argv) > 4 else None

    import jax

    # honor JAX_PLATFORMS=cpu despite the axon sitecustomize override
    # (it calls jax.config.update("jax_platforms", "axon,cpu") on import)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import SHADING_ALBEDO
    from makeit3d_tpu.models.renderer import RenderSettings, render_pure
    from makeit3d_tpu.training.trainer import Trainer
    from makeit3d_tpu.models.vgg import LPIPS
    from makeit3d_tpu.utils.metrics import psnr, ssim

    cfg = Config(guidance="none", workspace="results/_fidelity_tmp",
                 backbone=os.environ.get("FIDELITY_BACKBONE", "hashgrid"),
                 # FIDELITY_EVAL_BOXED=1 prices the boxed EVAL march's
                 # agreement with the pure oracle (Config.eval_march_boxed)
                 eval_march_boxed=os.environ.get(
                     "FIDELITY_EVAL_BOXED") == "1")
    tr = Trainer(cfg, name="fidelity", use_checkpoint=ckpt)
    settings = RenderSettings.from_config(cfg, training=False)
    # perceptual distance column (round-1 verdict item 5: PSNR/LPIPS).
    # VGG_WEIGHTS / LPIPS_LIN_WEIGHTS env point at torch checkpoints;
    # without them this is the paper's uncalibrated lin=1 baseline.
    lpips = LPIPS(vgg_weights=os.environ.get("VGG_WEIGHTS"),
                  lin_weights_path=os.environ.get("LPIPS_LIN_WEIGHTS"))
    lpips_j = jax.jit(lambda a, b: lpips(a, b))

    B = cfg.max_ray_batch

    @jax.jit
    def pure_chunks(params, rays_o, rays_d, key):
        def body(_, inp):
            ro, rd = inp
            out = render_pure(
                tr.field, params, ro, rd, settings, key, training=False,
                shading_mode=SHADING_ALBEDO, ambient_ratio=1.0,
                bg_color=1.0, perturb=False)
            return _, (out["image"], out["weights_sum"])
        return jax.lax.scan(body, None, (rays_o, rays_d))[1]

    sampler = ViewSampler(cfg, type="test", H=res, W=res, size=n_views,
                          seed=0)
    rows = []
    for i in range(n_views):
        view = sampler.get(i)
        occ = tr.render_image(view, bg_color=1.0)

        HW = res * res
        n_chunks = -(-HW // B)
        pad = n_chunks * B - HW
        ro = np.pad(view.rays_o.reshape(-1, 3),
                    ((0, pad), (0, 0))).reshape(n_chunks, B, 3)
        rd = np.pad(view.rays_d.reshape(-1, 3), ((0, pad), (0, 0)),
                    constant_values=1.0).reshape(n_chunks, B, 3)
        img_p, _ = pure_chunks(tr.params, jnp.asarray(ro), jnp.asarray(rd),
                               tr.key)
        img_p = np.asarray(img_p).reshape(-1, 3)[:HW].reshape(res, res, 3)

        a = np.clip(occ["image"], 0, 1)
        b = np.clip(img_p, 0, 1)
        out_dir = os.environ.get("FIDELITY_OUT")
        if out_dir:  # commit-able orbit evidence (round-2 verdict item 6)
            import cv2

            os.makedirs(out_dir, exist_ok=True)
            for name, img in (("occ", a), ("pure", b)):
                cv2.imwrite(os.path.join(out_dir, f"view{i}_{name}.png"),
                            cv2.cvtColor((img * 255).astype(np.uint8),
                                         cv2.COLOR_RGB2BGR))
        rows.append({"view": i, "psnr": round(psnr(a, b), 2),
                     "ssim": round(ssim(a, b), 4),
                     "lpips": round(float(lpips_j(jnp.asarray(a),
                                                  jnp.asarray(b))), 4)})
        print(f"[fidelity] view {i}: occupancy-vs-pure "
              f"PSNR={rows[-1]['psnr']} dB SSIM={rows[-1]['ssim']} "
              f"LPIPS={rows[-1]['lpips']}",
              flush=True)

    out = {
        "metric": "occupancy_vs_pure_psnr_db",
        "value": round(float(np.mean([r["psnr"] for r in rows])), 2),
        "ssim": round(float(np.mean([r["ssim"] for r in rows])), 4),
        "lpips": round(float(np.mean([r["lpips"] for r in rows])), 4),
        "lpips_calibrated": lpips.lin is not None,
        "n_views": n_views,
        "res": res,
        "ckpt": ckpt,
    }
    if os.environ.get("FIDELITY_OUT"):
        with open(os.path.join(os.environ["FIDELITY_OUT"],
                               "fidelity.json"), "w") as f:
            json.dump({**out, "views": rows}, f, indent=1)

    if prev_dir:
        prev = sorted(glob.glob(os.path.join(prev_dir, "*_rgb.png")))
        if prev:
            import cv2

            ps = []
            sampler2 = ViewSampler(cfg, type="test", H=res, W=res,
                                   size=len(prev), seed=0)
            for i, p in enumerate(prev[:n_views]):
                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (res, res)).astype(np.float32) / 255
                cur = np.clip(tr.render_image(sampler2.get(i),
                                              bg_color=1.0)["image"], 0, 1)
                ps.append(psnr(cur, img))
            out["vs_prev_round_psnr_db"] = round(float(np.mean(ps)), 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
