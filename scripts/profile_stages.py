"""Stage-level timing of one train step's components on the TPU.

Isolates: march_stage, field fwd (center rows), full render_occupancy
forward, loss forward, and the grad step — each as its own jitted
program, timed by host fetch (block_until_ready is unreliable through
the axon relay; see docs/TPU_NOTES.md).

Usage: python scripts/profile_stages.py [backbone] [h]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    first = jax_fetch(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax_fetch(out)
    dt = (time.time() - t0) / n
    print(f"  {label:<28s} {dt * 1000:8.1f} ms", flush=True)
    return dt


def jax_fetch(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf).ravel()[0]


def main():
    backbone = sys.argv[1] if len(sys.argv) > 1 else "fourier"
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import (
        make_field, SHADING_LAMBERTIAN, apply_field,
    )
    from makeit3d_tpu.models.renderer import (
        RenderSettings, march_stage, render_occupancy,
    )
    from makeit3d_tpu.ops.grid import init_density_grid
    from makeit3d_tpu.training.trainer import build_loss_fn
    from makeit3d_tpu.training.optimizer import (
        make_lr_schedule, make_optimizer,
    )

    cfg = Config(h=h, w=h, guidance="none", backbone=backbone)
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    settings = RenderSettings.from_config(cfg, training=True)
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)

    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    G = cfg.grid_size
    coords = (np.mgrid[0:G, 0:G, 0:G].astype(np.float32) + 0.5) / G * 2 - 1
    sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
    grid = grid._replace(occ=jnp.asarray(sphere[None].repeat(cfg.cascade, 0)))

    sampler = ViewSampler(cfg, type="train", H=h, W=h, size=16, seed=0)
    view = sampler.get(1)
    rays_o = jnp.asarray(view.rays_o.reshape(-1, 3))
    rays_d = jnp.asarray(view.rays_d.reshape(-1, 3))
    batch = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
        "shading_mode": jnp.asarray(SHADING_LAMBERTIAN, jnp.int32),
        "ambient_ratio": jnp.asarray(0.1, jnp.float32),
        "ref_rgba": jnp.zeros((512, 512, 4)),
        "ref_depth": jnp.full((512, 512), 0.5),
        "obj_mask": jnp.ones((512, 512)),
        "is_large": jnp.asarray(0.0),
        "diff_phase": jnp.asarray(0.0),
    }
    print(f"[{backbone}] {h}x{h}, {settings.n_samples} samples/ray")

    # scalar-reduced so the timing excludes host transfer of the
    # marched buffers (the relay moves ~30-100 MB/s; xyzs alone is 19MB)
    march_s = jax.jit(lambda g, k: march_stage(
        g, rays_o, rays_d, settings, k, perturb=True).xyzs.sum())
    timeit("march_stage (scalar out)", march_s, grid, key)
    march = jax.jit(lambda g, k: march_stage(g, rays_o, rays_d, settings,
                                             k, perturb=True))
    m = march(grid, key)
    flat_x = m.xyzs.reshape(-1, 3)
    flat_d = jnp.broadcast_to(rays_d[:, None, :],
                              m.xyzs.shape).reshape(-1, 3)
    print(f"  samples: {flat_x.shape[0]}")

    fwd = jax.jit(lambda p, x, d: apply_field(field, p, x, d,
                                              shaded=False)[0].sum())
    timeit("field fwd (albedo, flat)", fwd, params, flat_x, flat_d)

    fwd_sh = jax.jit(lambda p, x, d: apply_field(
        field, p, x, d, ratio=0.1,
        shading_mode=SHADING_LAMBERTIAN)[0].sum())
    timeit("field fwd (shaded, flat)", fwd_sh, params, flat_x, flat_d)

    def render(p, k):
        out = render_occupancy(
            field, p, grid, rays_o, rays_d, settings, k, training=True,
            shading_mode=batch["shading_mode"],
            ambient_ratio=batch["ambient_ratio"],
            bg_color=jnp.ones(3), perturb=True,
            depth_scale=batch["depth_scale"], shaded=True)
        return out["image"].sum()

    timeit("render_occupancy fwd", jax.jit(render), params, key)
    timeit("render grad", jax.jit(jax.grad(render)), params, key)

    loss_fn = build_loss_fn(cfg, field, settings, None, is_front=False,
                            shaded=True)
    lf = jax.jit(lambda p, k: loss_fn(p, grid, k, batch)[0])
    timeit("loss fwd", lf, params, key)
    gf = jax.jit(jax.grad(lambda p, k: loss_fn(p, grid, k, batch)[0]))
    timeit("loss grad", gf, params, key)

    def full(p, o, k):
        g = jax.grad(lambda pp: loss_fn(pp, grid, k, batch)[0])(p)
        up, o = optimizer.update(g, o, p)
        return jax.tree.map(lambda a, b: a + b, p, up), o

    timeit("loss grad + adan", jax.jit(full), params, opt_state, key)


if __name__ == "__main__":
    main()
