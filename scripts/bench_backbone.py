"""Honest per-backbone train-step timing on the current backend.

Times the production step programs (make_step_variant) with a HOST
FETCH of the loss per measured step — through the axon relay,
jax.block_until_ready can acknowledge before the computation actually
finishes (measured: a chained 8192^3-matmul loop "completed" at 33x the
chip's peak FLOP/s), so fetch-based timing is the only trustworthy
wall-clock. One fetch per TIMED BLOCK keeps pipelining realistic: we
chain n steps data-dependently and fetch the last loss.

Usage: python scripts/bench_backbone.py BACKBONE [h] [n_steps] [mode]
  mode: albedo | shaded (default)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    backbone = sys.argv[1]
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "shaded"

    import jax
    import jax.numpy as jnp

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

    cfg = Config(h=h, w=h, guidance="none", backbone=backbone)
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"[{backbone}] {n_params / 1e6:.2f}M params, {h}x{h}, {mode}",
          flush=True)
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)
    settings = RenderSettings.from_config(cfg, training=True)

    shaded = mode == "shaded"
    step = make_step_variant(cfg, field, optimizer, settings, None,
                             is_front=False, shaded=shaded, with_sds=False)

    # solid-sphere occupancy (typical trained-asset footprint)
    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    G = cfg.grid_size
    coords = (np.mgrid[0:G, 0:G, 0:G].astype(np.float32) + 0.5) / G * 2 - 1
    sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
    grid = grid._replace(occ=jnp.asarray(sphere[None].repeat(cfg.cascade, 0)))

    sampler = ViewSampler(cfg, type="train", H=h, W=h, size=16, seed=0)
    view = sampler.get(1)
    shading = SHADING_LAMBERTIAN if shaded else SHADING_ALBEDO
    batch = {
        "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
        "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
        "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
        "shading_mode": jnp.asarray(shading, jnp.int32),
        "ambient_ratio": jnp.asarray(0.1 if shaded else 1.0, jnp.float32),
        "ref_rgba": jnp.zeros((512, 512, 4)),
        "ref_depth": jnp.full((512, 512), 0.5),
        "obj_mask": jnp.ones((512, 512)),
        "is_large": jnp.asarray(0.0),
        "diff_phase": jnp.asarray(0.0),
    }

    t0 = time.time()
    params, opt_state, metrics, _ = step(params, opt_state, grid, key, batch)
    warm_loss = float(np.asarray(metrics["loss"]))  # forces completion
    print(f"[{backbone}] compile+first step {time.time() - t0:.1f}s "
          f"loss={warm_loss:.4f}", flush=True)

    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, metrics, _ = step(params, opt_state, grid,
                                             key, batch)
    final = float(np.asarray(metrics["loss"]))  # ONE fetch ends the chain
    dt = time.time() - t0
    print(f"[{backbone}] {n_steps} steps in {dt:.2f}s -> "
          f"{n_steps / dt:.2f} it/s ({dt / n_steps * 1000:.0f} ms/step), "
          f"loss={final:.4f}", flush=True)


if __name__ == "__main__":
    main()
