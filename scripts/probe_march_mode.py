"""Price the gather-free boxed march against the occupancy march
(round 5).

The coarse step's largest cost is the occupancy march's probe gathers
(~65-90 ms/step at the XLA gather ceiling — a platform bound, 8
formulations tried, docs/TPU_NOTES.md). `march_mode="boxed"`
(ops/marching.march_rays_boxed) replaces every occupancy lookup with
one slab test per ray against the occupied AABB and a uniform
in-segment sample lattice: zero gathers, at the cost of spending
sample budget on empty space inside the box. This probe times the
three schedule programs (front/albedo/shaded-deferred) in BOTH modes
on the trained-snapshot grid and projects the mixed headline rate.

Quality bound: AB_OVERRIDES='{"albedo_iters":100,"march_mode":"boxed"}'
AB_SEEDS=0,1,2 python scripts/quality_ab.py 400 64 fourier — compare
against the round-5 deferred base leg (18.96 ± 0.86 dB,
results/log_ab_r5_shaded.txt).

All timings chain data-dependently and end with one host fetch.

Usage: python scripts/probe_march_mode.py [--quick]
"""

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
    base = Config(guidance="none", backbone="fourier")
    field = make_field(base)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    optimizer = make_optimizer(base, make_lr_schedule(base))
    opt_state = optimizer.init(params)

    grid, snap_path = load_snapshot_grid(base)
    if grid is None:
        grid = init_density_grid(base.cascade, base.grid_size)
        H = base.grid_size
        coords = (np.mgrid[0:H, 0:H, 0:H].astype(np.float32) + 0.5) / H * 2 - 1
        sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
        grid = grid._replace(
            occ=jnp.asarray(sphere[None].repeat(base.cascade, 0)))
    print(f"[probe] grid="
          f"{'snapshot:' + str(snap_path) if snap_path else 'sphere'}",
          flush=True)

    sampler = ViewSampler(base, type="train", H=base.h, W=base.w,
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

    for mode in ("occupancy", "boxed"):
        cfg = base.replace(march_mode=mode)
        settings = RenderSettings.from_config(cfg, training=True)
        t_front = time_step(
            make_step_variant(cfg, field, optimizer, settings, None,
                              is_front=True, shaded=False, with_sds=False),
            front_batch)
        t_albedo = time_step(
            make_step_variant(cfg, field, optimizer, settings, None,
                              is_front=False, shaded=False, with_sds=False),
            novel_batch)
        t_shaded = time_step(
            make_step_variant(cfg, field, optimizer, settings, None,
                              is_front=False, shaded=True, with_sds=False),
            shaded_batch)
        mix = 0.25 * t_front + 0.375 * t_albedo + 0.375 * t_shaded
        emit({"march_mode": mode,
              "front_ms": round(t_front * 1000, 1),
              "albedo_ms": round(t_albedo * 1000, 1),
              "shaded_ms": round(t_shaded * 1000, 1),
              "mixed_ms": round(mix * 1000, 1),
              "projected_mixed_it_per_s": round(1.0 / mix, 2)})

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
