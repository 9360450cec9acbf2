"""Stage-level decomposition of the fourier train step on the real chip.

Times each stage of the production occupancy step as its OWN jitted
program with fetch-based timing (scripts/bench_backbone.py rationale:
block_until_ready is not a completion barrier through the axon relay),
so we can see where the 128^2 step's wall-clock actually goes:

  march        lattice gen + occupancy probe + cumsum/searchsorted compaction
  field_fwd    chunked field eval (sigma/albedo, no normals) on S samples
  field_shaded field eval incl. analytic-normal vjp
  field_bwd    grad of a scalar loss through the chunked field eval
  composite    Pallas transmittance composite fwd
  albedo_step  full production albedo step (loss+Adan)
  shaded_step  full production shaded step

Each stage is timed by chaining n iterations data-dependently and
fetching one scalar at the end. Usage:
  python scripts/profile_step.py [h] [n_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, n, fetch):
    # warm up / compile
    out = fn(0)
    _ = float(np.asarray(fetch(out)))
    t0 = time.time()
    for i in range(n):
        out = fn(i + 1)
    _ = float(np.asarray(fetch(out)))
    dt = (time.time() - t0) / n
    print(f"  {name:14s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import (
        SHADING_ALBEDO, SHADING_LAMBERTIAN, apply_field_chunked, make_field,
    )
    from makeit3d_tpu.models.renderer import RenderSettings, march_stage
    from makeit3d_tpu.ops.grid import init_density_grid
    from makeit3d_tpu.training.optimizer import (
        make_lr_schedule, make_optimizer,
    )
    from makeit3d_tpu.training.trainer import make_step_variant

    cfg = Config(h=h, w=h, guidance="none", backbone="fourier")
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)
    settings = RenderSettings.from_config(cfg, training=True)

    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    G = cfg.grid_size
    coords = (np.mgrid[0:G, 0:G, 0:G].astype(np.float32) + 0.5) / G * 2 - 1
    sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
    grid = grid._replace(occ=jnp.asarray(sphere[None].repeat(cfg.cascade, 0)))

    sampler = ViewSampler(cfg, type="train", H=h, W=h, size=16, seed=0)
    view = sampler.get(1)
    rays_o = jnp.asarray(view.rays_o.reshape(-1, 3))
    rays_d = jnp.asarray(view.rays_d.reshape(-1, 3))
    N = rays_o.shape[0]
    S = settings.n_samples
    print(f"[profile] h={h} N={N} S={S} samples={N * S / 1e6:.2f}M "
          f"hidden={cfg.mlp_hidden} layers={cfg.mlp_layers}", flush=True)

    # --- stage: march ---
    @jax.jit
    def do_march(key):
        m = march_stage(grid, rays_o, rays_d, settings, key)
        return m

    def march_i(i):
        return do_march(jax.random.fold_in(key, i))

    timed("march", march_i, n, lambda m: jnp.sum(m.ts))

    m0 = do_march(key)
    flat_x = m0.xyzs.reshape(-1, 3)
    flat_d = m0.dirs.reshape(-1, 3)
    light_d = jnp.asarray([0.0, 0.0, 1.0])

    # --- stage: field forward, albedo (no normal probes) ---
    @jax.jit
    def field_fwd(px, scale):
        sig, rgb, _ = apply_field_chunked(
            field, params, px * scale, flat_d, light_d=light_d,
            ratio=1.0, shading_mode=SHADING_ALBEDO,
            chunk=settings.field_chunk, shaded=False)
        return jnp.sum(sig) + jnp.sum(rgb)

    timed("field_fwd", lambda i: field_fwd(flat_x, 1.0 + 1e-6 * i), n,
          lambda x: x)

    # --- stage: field forward, shaded (analytic normals via vjp) ---
    @jax.jit
    def field_shaded(px, scale):
        sig, rgb, nrm = apply_field_chunked(
            field, params, px * scale, flat_d, light_d=light_d,
            ratio=0.1, shading_mode=SHADING_LAMBERTIAN,
            chunk=settings.field_chunk, shaded=True)
        return jnp.sum(sig) + jnp.sum(rgb) + jnp.sum(nrm)

    timed("field_shaded", lambda i: field_shaded(flat_x, 1.0 + 1e-6 * i), n,
          lambda x: x)

    # --- stage: field fwd+bwd (albedo) ---
    @jax.jit
    def field_bwd(p, px):
        def loss(p):
            sig, rgb, _ = apply_field_chunked(
                field, p, px, flat_d, light_d=light_d,
                ratio=1.0, shading_mode=SHADING_ALBEDO,
                chunk=settings.field_chunk, shaded=False)
            return jnp.sum(sig**2) + jnp.sum(rgb**2)

        l, g = jax.value_and_grad(loss)(p)
        return l, g

    def fb(i):
        l, g = field_bwd(params, flat_x * (1.0 + 1e-6 * i))
        return l

    timed("field_bwd", fb, n, lambda x: x)

    # --- stage: composite (Pallas) fwd — TPU only (interpret mode off
    # TPU is far too slow to time) ---
    if jax.default_backend() == "tpu":
        sig0 = jnp.abs(jax.random.normal(key, (N, S)))
        rgb0 = jax.nn.sigmoid(jax.random.normal(key, (N, S, 3)))

        from makeit3d_tpu.ops.pallas.composite import composite_rays_pallas

        @jax.jit
        def comp(sig):
            ws, d, im = composite_rays_pallas(
                sig, rgb0, m0.dts, m0.real_dts, m0.valid,
                settings.T_thresh, 256)
            return jnp.sum(ws) + jnp.sum(d) + jnp.sum(im)

        timed("composite", lambda i: comp(sig0 + 1e-6 * i), n, lambda x: x)

    # --- full production steps ---
    def consts(shaded):
        return {
            "ref_rgba": jnp.zeros((512, 512, 4)),
            "ref_depth": jnp.full((512, 512), 0.5),
            "obj_mask": jnp.ones((512, 512)),
            "is_large": jnp.asarray(0.0),
            "diff_phase": jnp.asarray(0.0),
            "rays_o": rays_o, "rays_d": rays_d,
            "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
            "shading_mode": jnp.asarray(
                SHADING_LAMBERTIAN if shaded else SHADING_ALBEDO, jnp.int32),
            "ambient_ratio": jnp.asarray(0.1 if shaded else 1.0),
        }

    for shaded, nm in ((False, "albedo_step"), (True, "shaded_step")):
        step = make_step_variant(cfg, field, optimizer, settings, None,
                                 is_front=False, shaded=shaded,
                                 with_sds=False)
        batch = consts(shaded)
        state = {"p": params, "o": opt_state}

        def run(i, state=state, step=step, batch=batch):
            p, o, metrics, _ = step(state["p"], state["o"], grid,
                                    jax.random.fold_in(key, i), batch)
            state["p"], state["o"] = p, o
            return metrics["loss"]

        timed(nm, run, n, lambda x: x)


if __name__ == "__main__":
    main()
