"""Profile the 800x800 eval/test frame (round-3 verdict item 7).

BENCH_r03 recorded eval_frame_800_ms=5951 at the production settings
(max_ray_batch=4096 -> 157 scanned chunks, eval_samples_per_ray=192).
This probe times the same scanned program under a (chunk size x sample
budget) grid, plus a march-only and field-only decomposition at the
best chunk size, to find where the 6 s goes and what the cheap wins
are (bigger chunks amortize scan/pipeline overhead; the eval budget of
192 samples/ray is 2x the train budget and may be overkill vs the
compositor's early-termination mask).

All timings end with one host fetch (block_until_ready is not a
barrier through the axon relay; docs/TPU_NOTES.md).

Usage: python scripts/probe_eval_frame.py [--quick]
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
    from makeit3d_tpu.models.field import make_field
    from makeit3d_tpu.models.renderer import RenderSettings, render_occupancy
    from makeit3d_tpu.ops.grid import init_density_grid
    from makeit3d_tpu.ops.marching import march_rays, near_far_from_aabb

    quick = "--quick" in sys.argv
    cfg = Config(guidance="none", backbone="fourier")
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))

    # grid: trained snapshot when available (realistic occupancy), else
    # a solid sphere (same policy as bench.py)
    grid, snap_path = load_snapshot_grid(cfg)
    if grid is not None:
        print(f"[probe] grid from {snap_path}", flush=True)
    else:
        grid = init_density_grid(cfg.cascade, cfg.grid_size)
        H = cfg.grid_size
        coords = (np.mgrid[0:H, 0:H, 0:H].astype(np.float32) + 0.5) / H * 2 - 1
        sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
        grid = grid._replace(
            occ=jnp.asarray(sphere[None].repeat(cfg.cascade, 0)))

    view = ViewSampler(cfg, type="test", H=800, W=800, size=8, seed=0).get(0)
    n_rays = 800 * 800
    rays_o = view.rays_o.reshape(-1, 3).astype(np.float32)
    rays_d = view.rays_d.reshape(-1, 3).astype(np.float32)
    dsc = view.depth_scale.reshape(-1).astype(np.float32)

    def make_inputs(B):
        n_chunks = -(-n_rays // B)
        pad = n_chunks * B - n_rays
        ro = jnp.asarray(np.pad(rays_o, ((0, pad), (0, 0))
                                ).reshape(n_chunks, B, 3))
        rd = jnp.asarray(np.pad(rays_d, ((0, pad), (0, 0)),
                                constant_values=1.0).reshape(n_chunks, B, 3))
        ds = jnp.asarray(np.pad(dsc, (0, pad)).reshape(n_chunks, B))
        return ro, rd, ds

    def frame_fn(es):
        @jax.jit
        def eval_frame(params, grid, ro, rd, ds, key):
            def body(_, inp):
                o, d, s = inp
                out = render_occupancy(
                    field, params, grid, o, d, es, key, training=False,
                    shading_mode=0, ambient_ratio=1.0, bg_color=1.0,
                    perturb=False, depth_scale=s)
                return _, (out["image"], out["depth"])
            _, outs = jax.lax.scan(body, None, (ro, rd, ds))
            return outs
        return eval_frame

    def timeit(fn, args, n=3):
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _i in range(n):
            out = fn(*args)
            _ = np.asarray(jax.tree.leaves(out)[0])
        return (time.time() - t0) / n

    results = []
    combos = [(4096, 192), (16384, 192), (65536, 192),
              (16384, 128), (16384, 96), (65536, 96), (4096, 96)]
    if quick:
        combos = combos[:2]
    import dataclasses
    for B, S in combos:
        es = dataclasses.replace(
            RenderSettings.from_config(cfg, training=False), n_samples=S)
        ro, rd, ds = make_inputs(B)
        try:
            dt = timeit(frame_fn(es), (params, grid, ro, rd, ds, key))
            row = {"chunk": B, "samples": S,
                   "frame_ms": round(dt * 1000, 1)}
        except Exception as e:
            row = {"chunk": B, "samples": S,
                   "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
        results.append(row)

    # decomposition: march-only at the production shape and at the
    # probe's best (chunk, samples) combo
    import dataclasses as _dc
    aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
    for B, S in ([(4096, 192)] if quick else [(4096, 192), (16384, 96)]):
        es = _dc.replace(RenderSettings.from_config(cfg, training=False),
                         n_samples=S)
        ro, rd, ds = make_inputs(B)

        @jax.jit
        def march_only(grid, ro, rd, key):
            def body(_, inp):
                o, d = inp
                nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
                m = march_rays(o, d, grid.occ, cfg.bound, nears, fars,
                               max_steps=es.max_steps,
                               n_samples=es.n_samples,
                               perturb=False, key=key)
                return _, (m.dts.sum(), m.xyzs.sum())
            _, outs = jax.lax.scan(body, None, (ro, rd))
            return outs

        dt = timeit(march_only, (grid, ro, rd, key))
        row = {"stage": "march_only", "chunk": B, "samples": S,
               "frame_ms": round(dt * 1000, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
