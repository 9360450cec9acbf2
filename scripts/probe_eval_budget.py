"""Quality bound for the eval-frame sample budget (round-3 verdict item 7).

probe_eval_frame.py shows the 800x800 test frame is ~1.5x faster at 96
samples/ray than the production 192 (the eval budget is 2x the train
budget, config.py eval_samples_per_ray). Before flipping the default,
bound the quality cost: render the same frame from a trained snapshot
at S in {192, 128, 96} and report PSNR/SSIM of each cheaper budget
against the S=192 render. The occupancy compaction makes extra slots
pure padding once every occupied lattice point fits, so past that
point the renders should agree to float noise; divergence appears only
where a ray's occupied span overflows the S-slot cap.

Usage: python scripts/probe_eval_budget.py [ckpt]
"""

import dataclasses
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from flax import serialization

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import make_field
    from makeit3d_tpu.models.renderer import RenderSettings, render_occupancy
    from makeit3d_tpu.ops.grid import DensityGrid, init_density_grid
    from makeit3d_tpu.utils.metrics import psnr, ssim

    if len(sys.argv) > 1:
        ckpt = sys.argv[1]
    else:
        paths = sorted(glob.glob("results/*/checkpoints/*.ckpt"),
                       key=os.path.getmtime)
        assert paths, "no trained checkpoint found under results/"
        ckpt = paths[-1]
    with open(ckpt, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    # backbone from the workspace's setting.txt when present
    bb = "fourier"
    setting = os.path.join(os.path.dirname(os.path.dirname(ckpt)),
                           "setting.txt")
    if os.path.exists(setting):
        for line in open(setting):
            if line.startswith("backbone"):
                bb = line.split(":")[1].strip()
    cfg = Config(guidance="none", backbone=bb)
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    params = serialization.from_state_dict(params, raw["params"])
    tmpl = init_density_grid(cfg.cascade, cfg.grid_size)
    grid = DensityGrid(*serialization.from_state_dict(tmpl, raw["grid"]))
    print(f"[probe] ckpt {ckpt} (backbone={bb}, "
          f"step {raw.get('global_step')})", flush=True)

    view = ViewSampler(cfg, type="test", H=800, W=800, size=8, seed=0).get(0)
    n_rays = 800 * 800
    B = 16384
    n_chunks = -(-n_rays // B)
    pad = n_chunks * B - n_rays
    ro = jnp.asarray(np.pad(view.rays_o.reshape(-1, 3).astype(np.float32),
                            ((0, pad), (0, 0))).reshape(n_chunks, B, 3))
    rd = jnp.asarray(np.pad(view.rays_d.reshape(-1, 3).astype(np.float32),
                            ((0, pad), (0, 0)), constant_values=1.0
                            ).reshape(n_chunks, B, 3))
    ds = jnp.asarray(np.pad(view.depth_scale.reshape(-1).astype(np.float32),
                            (0, pad)).reshape(n_chunks, B))

    def render(S):
        es = dataclasses.replace(
            RenderSettings.from_config(cfg, training=False), n_samples=S)

        @jax.jit
        def frame(params, grid, ro, rd, ds, key):
            def body(_, inp):
                o, d, s = inp
                out = render_occupancy(
                    field, params, grid, o, d, es, key, training=False,
                    shading_mode=0, ambient_ratio=1.0, bg_color=1.0,
                    perturb=False, depth_scale=s)
                return _, (out["image"], out["depth"])
            _, outs = jax.lax.scan(body, None, (ro, rd, ds))
            return outs

        img, dep = frame(params, grid, ro, rd, ds, key)
        img = np.asarray(img).reshape(-1, 3)[:n_rays].reshape(800, 800, 3)
        dep = np.asarray(dep).reshape(-1)[:n_rays].reshape(800, 800)
        return np.clip(img, 0.0, 1.0), dep

    ref_img, ref_dep = render(192)
    rows = []
    for S in (128, 96):
        img, dep = render(S)
        rows.append({
            "samples": S,
            "psnr_vs_192": round(psnr(img, ref_img), 2),
            "ssim_vs_192": round(ssim(img, ref_img), 4),
            "depth_mad": round(float(np.abs(dep - ref_dep).mean()), 5),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"ckpt": ckpt, "summary": rows}))


if __name__ == "__main__":
    main()
