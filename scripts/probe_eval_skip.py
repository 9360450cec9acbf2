"""Time the occupied-AABB tile skip on the 800x800 eval frame (TPU).

Compares, from a trained snapshot's occupancy grid:
  - plain:   scanline chunks, no skip (the r03 production shape)
  - tiled:   sqrt(B)-sided pixel tiles + lax.cond skip vs the occupied
             AABB (the r04 production shape, trainer.render_image)
at the production eval budget (192 samples) and the probed cheaper
budgets. Timings include the host tile (re)assembly and one D2H fetch
(the per-PNG cost of the production test loop). Also reports the
skippable-tile fraction for the frame (host-side predicate count).

Usage: python scripts/probe_eval_skip.py [ckpt]
"""

import dataclasses
import glob
import json
import os
import sys
import time

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
    from makeit3d_tpu.models.renderer import (
        RenderSettings, render_eval_chunk_skippable, render_occupancy,
    )
    from makeit3d_tpu.ops.grid import (
        DensityGrid, init_density_grid, occupied_aabb,
    )
    from makeit3d_tpu.ops.marching import near_far_from_aabb

    if len(sys.argv) > 1:
        ckpt = sys.argv[1]
    else:
        paths = sorted(glob.glob("results/*/checkpoints/*.ckpt"),
                       key=os.path.getmtime)
        assert paths, "no trained checkpoint found under results/"
        ckpt = paths[-1]
    with open(ckpt, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
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
    occ_frac = float(np.asarray(grid.occ).mean())
    print(f"[probe] ckpt {ckpt} (backbone={bb}, occ={occ_frac:.3f})",
          flush=True)

    view = ViewSampler(cfg, type="test", H=800, W=800, size=8, seed=0).get(0)
    H = W = 800
    B = cfg.max_ray_batch
    T = int(np.sqrt(B))
    assert T * T == B

    def timeit(fn, n=3):
        out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _i in range(n):
            out = fn()
            _ = np.asarray(jax.tree.leaves(out)[0])
        return (time.time() - t0) / n

    # --- plain scanline frame (r03 shape) ---
    def plain_frame(S):
        es = dataclasses.replace(
            RenderSettings.from_config(cfg, training=False), n_samples=S)
        n_rays = H * W
        n_chunks = -(-n_rays // B)
        pad = n_chunks * B - n_rays
        ro = jnp.asarray(np.pad(view.rays_o.reshape(-1, 3).astype(np.float32),
                                ((0, pad), (0, 0))).reshape(n_chunks, B, 3))
        rd = jnp.asarray(np.pad(view.rays_d.reshape(-1, 3).astype(np.float32),
                                ((0, pad), (0, 0)), constant_values=1.0
                                ).reshape(n_chunks, B, 3))
        ds = jnp.asarray(np.pad(view.depth_scale.reshape(-1).astype(
            np.float32), (0, pad)).reshape(n_chunks, B))

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

        def run():
            img, _ = frame(params, grid, ro, rd, ds, key)
            return np.asarray(img).reshape(-1, 3)[:H * W]
        return run

    # --- tiled + skip frame (r04 shape, mirrors trainer.render_image) ---
    def tiled_frame(S):
        es = dataclasses.replace(
            RenderSettings.from_config(cfg, training=False), n_samples=S)
        Ht, Wt = -(-H // T), -(-W // T)
        n_chunks = Ht * Wt
        pad_hw = ((0, Ht * T - H), (0, Wt * T - W))

        def tile_up(a, comps):
            g = np.asarray(a, np.float32).reshape(H, W, comps)
            g = np.pad(g, pad_hw + ((0, 0),), mode="edge")
            return (g.reshape(Ht, T, Wt, T, comps)
                    .transpose(0, 2, 1, 3, 4).reshape(n_chunks, B, comps))

        @jax.jit
        def frame(params, grid, ro, rd, ds, key):
            aabb_occ = occupied_aabb(grid.occ, es.bound)

            def body(_, inp):
                o, d, s = inp
                out = render_eval_chunk_skippable(
                    field, params, grid, o, d, es, key, bg_color=1.0,
                    depth_scale=s, aabb_occ=aabb_occ)
                return _, (out["image"], out["depth"])
            _, outs = jax.lax.scan(body, None, (ro, rd, ds))
            return outs

        def run():
            ro = jnp.asarray(tile_up(view.rays_o, 3))
            rd = jnp.asarray(tile_up(view.rays_d, 3))
            ds = jnp.asarray(tile_up(view.depth_scale, 1)[..., 0])
            img, _ = frame(params, grid, ro, rd, ds, key)
            return (np.asarray(img).reshape(Ht, Wt, T, T, 3)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(Ht * T, Wt * T, 3)[:H, :W])
        return run

    # skippable fraction (host-side, once)
    aabb = occupied_aabb(grid.occ, cfg.bound)
    ro_f = jnp.asarray(view.rays_o.reshape(-1, 3).astype(np.float32))
    rd_f = jnp.asarray(view.rays_d.reshape(-1, 3).astype(np.float32))
    nears, fars = near_far_from_aabb(ro_f, rd_f, aabb, cfg.min_near)
    hit = np.asarray(nears < fars).reshape(H, W)
    Ht, Wt = -(-H // T), -(-W // T)
    hit_p = np.pad(hit, ((0, Ht * T - H), (0, Wt * T - W)), mode="edge")
    tile_hit = hit_p.reshape(Ht, T, Wt, T).any(axis=(1, 3))
    frac_skipped = 1.0 - float(tile_hit.mean())
    print(json.dumps({"aabb": np.asarray(aabb).round(3).tolist(),
                      "tile_frac_skipped": round(frac_skipped, 3)}),
          flush=True)

    results = []
    legs = [("plain", plain_frame, 192), ("tiled_skip", tiled_frame, 192),
            ("tiled_skip", tiled_frame, 128), ("tiled_skip", tiled_frame, 96)]
    for name, maker, S in legs:
        dt = timeit(maker(S))
        row = {"leg": name, "samples": S, "frame_ms": round(dt * 1000, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)

    # parity: tiled+skip vs plain at 192
    img_p = plain_frame(192)().reshape(H, W, 3)
    img_t = tiled_frame(192)()
    mad = float(np.abs(img_p - img_t).max())
    print(json.dumps({"parity_max_abs_diff": round(mad, 6),
                      "summary": results,
                      "tile_frac_skipped": round(frac_skipped, 3)}))


if __name__ == "__main__":
    main()
