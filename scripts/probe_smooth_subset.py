"""Measure smooth_subset's effect on the shaded coarse step (round-3
verdict item 3: the knob was built in round 3 — renderer.py
smooth-loss row subset — but never timed on the TPU).

The shaded step evaluates [x; x_sub+noise] through one chunked field
program (renderer.py "Batch the main eval and the smooth-loss
perturbed eval"); at subset=1.0 that is 2x the rows of the albedo
step, and round-2 forensics put the second chain at ~40% of the shaded
step's cost. This probe times the SHADED program (the only one the
knob touches) at subset in {1.0, 0.5, 0.25}, plus the albedo and front
programs once, then projects the schedule-mixed headline rate
(front 25% / novel-albedo 37.5% / novel-shaded 37.5% — the bench.py
MIX) for each subset.

Quality bound: run scripts/quality_ab.py with
AB_OVERRIDES='{"smooth_subset":0.25}' AB_TAG=_ss25 for the paired
fidelity datum.

All timings chain data-dependently and end with one host fetch.

Usage: python scripts/probe_smooth_subset.py [--quick]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from bench import load_snapshot_grid
    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import (
        make_field, SHADING_ALBEDO, SHADING_LAMBERTIAN,
    )
    from makeit3d_tpu.models.renderer import RenderSettings
    from makeit3d_tpu.ops.grid import init_density_grid
    from makeit3d_tpu.training.optimizer import (
        make_lr_schedule, make_optimizer,
    )
    from makeit3d_tpu.training.trainer import make_step_variant

    quick = "--quick" in sys.argv
    cfg = Config(guidance="none", backbone="fourier")
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)

    grid, snap_path = load_snapshot_grid(cfg)
    if grid is None:
        grid = init_density_grid(cfg.cascade, cfg.grid_size)
        H = cfg.grid_size
        coords = (np.mgrid[0:H, 0:H, 0:H].astype(np.float32) + 0.5) / H * 2 - 1
        sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
        grid = grid._replace(
            occ=jnp.asarray(sphere[None].repeat(cfg.cascade, 0)))
    print(f"[probe] grid={'snapshot:' + str(snap_path) if snap_path else 'sphere'}",
          flush=True)

    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w,
                          size=100, seed=0)
    consts = {
        "ref_rgba": jnp.zeros((512, 512, 4)),
        "ref_depth": jnp.full((512, 512), 0.5),
        "obj_mask": jnp.ones((512, 512)),
        "is_large": jnp.asarray(0.0),
        "diff_phase": jnp.asarray(0.0),
    }

    def batch_for(i, shading, ambient):
        view = sampler.get(i)
        return {
            "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
            "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
            "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
            "shading_mode": jnp.asarray(shading, jnp.int32),
            "ambient_ratio": jnp.asarray(ambient, jnp.float32),
            **consts,
        }

    front_batch = batch_for(0, SHADING_ALBEDO, 1.0)
    novel_batch = batch_for(1, SHADING_ALBEDO, 1.0)
    shaded_batch = batch_for(1, SHADING_LAMBERTIAN, 0.1)

    n_it = 5 if quick else 15

    def time_step(fn, batch):
        p2, o2, m, _ = fn(params, opt_state, grid, key, batch)
        _ = float(np.asarray(m["loss"]))
        t0 = time.time()
        for _i in range(n_it):
            p2, o2, m, _ = fn(p2, o2, grid, key, batch)
        _ = float(np.asarray(m["loss"]))
        return (time.time() - t0) / n_it

    results = []

    def emit(row):
        print(json.dumps(row), flush=True)
        results.append(row)

    settings = RenderSettings.from_config(cfg, training=True)
    t_front = time_step(
        make_step_variant(cfg, field, optimizer, settings, None,
                          is_front=True, shaded=False, with_sds=False),
        front_batch)
    emit({"program": "front_albedo", "ms": round(t_front * 1000, 1)})
    t_albedo = time_step(
        make_step_variant(cfg, field, optimizer, settings, None,
                          is_front=False, shaded=False, with_sds=False),
        novel_batch)
    emit({"program": "novel_albedo", "ms": round(t_albedo * 1000, 1)})

    MIX = {"front": 0.25, "albedo": 0.375, "shaded": 0.375}
    for ss in ([1.0, 0.25] if quick else [1.0, 0.5, 0.25]):
        s2 = dataclasses.replace(settings, smooth_subset=ss)
        t_shaded = time_step(
            make_step_variant(cfg, field, optimizer, s2, None,
                              is_front=False, shaded=True, with_sds=False),
            shaded_batch)
        mixed = (MIX["front"] * t_front + MIX["albedo"] * t_albedo
                 + MIX["shaded"] * t_shaded)
        emit({"program": "novel_shaded", "smooth_subset": ss,
              "ms": round(t_shaded * 1000, 1),
              "projected_mix_iters_per_sec": round(1.0 / mixed, 2)})

    # deferred-shading leg (round-4: the structural lever the coarse
    # close-out identified — normal chain at N surface points instead of
    # N*S samples; Config.deferred_shading)
    s_def = dataclasses.replace(settings, deferred_shading=True)
    t_def = time_step(
        make_step_variant(cfg, field, optimizer, s_def, None,
                          is_front=False, shaded=True, with_sds=False),
        shaded_batch)
    mixed = (MIX["front"] * t_front + MIX["albedo"] * t_albedo
             + MIX["shaded"] * t_def)
    emit({"program": "novel_shaded_deferred",
          "ms": round(t_def * 1000, 1),
          "projected_mix_iters_per_sec": round(1.0 / mixed, 2)})

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
