"""Coarse-step roofline close-out (round-3 verdict item 3, "or" branch).

The question on record since round 2: is the coarse train step at
~4.5 it/s (mixed schedule, 128^2, fourier flagship) compute-bound or
HBM-bound — i.e. is there headroom left, or is ~4.5-4.9 the v5e-1
ceiling for this program?

CAVEAT (measured, round 4): XLA's compile().cost_analysis() counts a
lax.scan body ONCE, not trip-count times — the chunked field eval runs
under scan, so the ss=1.0 and ss=0.25 shaded programs report identical
FLOPs (653.5 vs 653.2 G) while the v5e runs them 26% apart (419.8 vs
311.7 ms). The numbers this script prints are therefore lower bounds
useful only for the non-scanned parts; the recorded close-out in
docs/TPU_NOTES.md uses analytic accounting instead.

Method: XLA's own cost model. compile() the exact step executables the
Trainer runs (same factory, same shapes; the persistent cache makes
this free on a warm tree) and read cost_analysis() — flops and
bytes-accessed per executable — then place each program against the
v5e-1 rooflines:

    t_flops = flops / 197e12 (bf16 MXU peak)
    t_hbm   = bytes / 8.19e11 (HBM bandwidth)

A program whose measured ms sits near max(t_flops, t_hbm) is at the
roofline; which of the two dominates says what (if anything) to attack
next. Measured ms come from scripts/probe_smooth_subset.py (same
shapes, same grid source).

Usage: python scripts/probe_coarse_roofline.py
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_FLOPS = 197e12
V5E_HBM_BPS = 8.19e11


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
    settings = RenderSettings.from_config(cfg, training=True)

    grid, snap = load_snapshot_grid(cfg)
    if grid is None:
        grid = init_density_grid(cfg.cascade, cfg.grid_size)
    print(f"[probe] grid={'snapshot' if snap else 'fresh'}", flush=True)

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
        "diff_phase": jnp.asarray(1.0),
    }

    legs = [("front_albedo", dict(is_front=True, shaded=False), 1.0),
            ("novel_albedo", dict(is_front=False, shaded=False), 1.0),
            ("novel_shaded_ss1.0", dict(is_front=False, shaded=True), 1.0),
            ("novel_shaded_ss0.25", dict(is_front=False, shaded=True), 0.25)]
    rows = []
    for name, kw, ss in legs:
        lcfg = dataclasses.replace(cfg, smooth_subset=ss)
        lset = RenderSettings.from_config(lcfg, training=True)
        step = make_step_variant(lcfg, field, optimizer, lset, None,
                                 with_sds=False, **kw)
        # step factories return jitted callables; lower the underlying
        # jit for the cost model without executing it
        lowered = step.lower(params, opt_state, grid, key, batch)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        rbytes = float(ca.get("bytes accessed", 0.0))
        row = {
            "program": name,
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(rbytes / 1e9, 3),
            "t_flops_ms": round(flops / V5E_PEAK_FLOPS * 1e3, 2),
            "t_hbm_ms": round(rbytes / V5E_HBM_BPS * 1e3, 2),
            "arith_intensity": round(flops / max(rbytes, 1.0), 1),
        }
        row["bound"] = ("hbm" if row["t_hbm_ms"] > row["t_flops_ms"]
                        else "flops")
        print(json.dumps(row), flush=True)
        rows.append(row)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
