"""Standalone multi-asset throughput datum (BASELINE config 5 anchor).

The bench's multi-asset leg kept starving behind the SDS/refine phases
(tower init + relay cost eat the budget; RESOURCE_EXHAUSTED once the
refine executables' captured constants pile up). This probe measures the
same thing in a clean process: A=2 assets' coarse albedo steps vmapped
into one program on the single chip — the per-chip building block of the
8-asset v4-8 sharding (parallel/mesh.shard_multi_asset_step is
correctness-covered on the virtual mesh; this is the measured anchor).

Host-fetch timed. Usage: python scripts/probe_multi_asset.py
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
    from makeit3d_tpu.models.field import make_field, SHADING_ALBEDO
    from makeit3d_tpu.models.renderer import RenderSettings
    from makeit3d_tpu.ops.grid import init_density_grid
    from makeit3d_tpu.training.optimizer import (
        make_lr_schedule, make_optimizer,
    )
    from makeit3d_tpu.training.trainer import make_step_variant

    cfg = Config(guidance="none", backbone="fourier")
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)
    grid, snap = load_snapshot_grid(cfg)
    if grid is None:
        grid = init_density_grid(cfg.cascade, cfg.grid_size)
    settings = RenderSettings.from_config(cfg, training=True)
    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w,
                          size=100, seed=0)
    view = sampler.get(1)
    batch = {
        "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
        "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
        "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
        "shading_mode": jnp.asarray(SHADING_ALBEDO, jnp.int32),
        "ambient_ratio": jnp.asarray(1.0, jnp.float32),
        "ref_rgba": jnp.zeros((512, 512, 4)),
        "ref_depth": jnp.full((512, 512), 0.5),
        "obj_mask": jnp.ones((512, 512)),
        "is_large": jnp.asarray(0.0),
        "diff_phase": jnp.asarray(0.0),
    }
    fn = make_step_variant(cfg, field, optimizer, settings, None,
                           is_front=False, shaded=False, with_sds=False)
    # single-asset baseline
    p, o, m, _ = fn(params, opt_state, grid, key, batch)
    _ = float(np.asarray(m["loss"]))
    n = 10
    t0 = time.time()
    for _i in range(n):
        p, o, m, _ = fn(p, o, grid, key, batch)
    _ = float(np.asarray(m["loss"]))
    single = n / (time.time() - t0)

    rows = [{"assets": 1, "steps_per_sec": round(single, 3),
             "grid": snap or "init"}]
    print(json.dumps(rows[0]), flush=True)
    for A in (2, 4):
        p_stack = jax.tree.map(lambda x: jnp.stack([x] * A), params)
        o_stack = jax.tree.map(lambda x: jnp.stack([x] * A), opt_state)
        g_stack = jax.tree.map(lambda x: jnp.stack([x] * A), grid)
        b_stack = jax.tree.map(lambda x: jnp.stack([x] * A), batch)
        k_stack = jax.random.split(key, A)
        vstep = jax.jit(jax.vmap(lambda p_, o_, g_, k_, b_: fn(
            p_, o_, g_, k_, b_)))
        p_stack, o_stack, vm, _ = vstep(p_stack, o_stack, g_stack,
                                        k_stack, b_stack)
        _ = float(np.asarray(vm["loss"]).sum())
        t0 = time.time()
        for _i in range(n):
            p_stack, o_stack, vm, _ = vstep(p_stack, o_stack, g_stack,
                                            k_stack, b_stack)
        _ = float(np.asarray(vm["loss"]).sum())
        rate = n * A / (time.time() - t0)
        row = {"assets": A, "steps_per_sec": round(rate, 3),
               "per_asset_vs_single": round(rate / A / single, 3)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
