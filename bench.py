"""Benchmark: coarse-stage training throughput on the real TPU.

Workload = the reference's hot loop at its published settings (128x128
rays/step, hash-grid field, finite-difference normals + smoothness
probes, occupancy marching, full loss stack minus the frozen diffusion
prior, Adan update) — reference README.md:71-74 trains 5000 such iters.

Prints ONE JSON line. vs_baseline normalizes against the driver's
north-star budget (full coarse stage inside the 15-minute asset budget:
5000 iters / 9 min => 9.26 iter/s); >1.0 means the coarse loop is faster
than the budget requires.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import (
        make_field, SHADING_ALBEDO, SHADING_LAMBERTIAN, SHADING_TEXTURELESS,
    )
    from makeit3d_tpu.models.renderer import RenderSettings
    from makeit3d_tpu.ops.grid import init_density_grid, update_density_grid
    from makeit3d_tpu.training.optimizer import make_lr_schedule, make_optimizer
    from makeit3d_tpu.training.trainer import build_train_step

    cfg = Config(guidance="none")  # reference defaults: 128x128, S budget 96
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)
    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    settings = RenderSettings.from_config(cfg, training=True)

    update_grid = jax.jit(
        lambda p, g, k: update_density_grid(
            g, lambda x: field.apply(p, x, method="density")["sigma"],
            k, cfg.bound, cfg.density_thresh,
        )
    )
    # the Trainer's three static program variants (front is always albedo;
    # novel steps past albedo_iters sample 50% albedo / 10% textureless /
    # 40% lambertian — reference utils.py:470-483)
    steps = {
        (front, shaded): jax.jit(build_train_step(
            cfg, field, optimizer, settings, None, is_front=front,
            shaded=shaded))
        for front, shaded in ((True, False), (False, False), (False, True))
    }

    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=100, seed=0)
    rng = np.random.default_rng(0)

    # constant reference buffers uploaded ONCE (the Trainer does the same;
    # re-uploading 6 MB per step makes the loop tunnel-bandwidth-bound)
    consts = {
        "ref_rgba": jnp.zeros((512, 512, 4)),
        "ref_depth": jnp.full((512, 512), 0.5),
        "obj_mask": jnp.ones((512, 512)),
        "is_large": jnp.asarray(0.0),
        "diff_phase": jnp.asarray(0.0),
    }

    def make_batch(i):
        view = sampler.get(i)
        if view.is_front:
            shading, ambient = SHADING_ALBEDO, 1.0
        else:
            r = rng.random()
            if r > 0.5:
                shading, ambient = SHADING_ALBEDO, 1.0
            elif r > 0.4:
                shading, ambient = SHADING_TEXTURELESS, 0.1
            else:
                shading, ambient = SHADING_LAMBERTIAN, 0.1
        fn = steps[(view.is_front, shading != SHADING_ALBEDO)]
        return fn, {
            "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
            "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
            "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
            "shading_mode": jnp.asarray(shading, jnp.int32),
            "ambient_ratio": jnp.asarray(ambient, jnp.float32),
            **consts,
        }

    # Realistic asset occupancy: a fresh field is ~0.5% occupied and rays
    # collect almost no samples, which flatters the numbers. Override with
    # a solid sphere of radius 0.6 (typical trained-asset footprint) so
    # object rays saturate their full per-ray sample budget.
    H = cfg.grid_size
    coords = (np.mgrid[0:H, 0:H, 0:H].astype(np.float32) + 0.5) / H * 2 - 1
    sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
    grid = grid._replace(occ=jnp.asarray(sphere[None].repeat(cfg.cascade, 0)))

    # warmup / compile all three program variants explicitly
    _ = update_grid(params, grid, key)  # compiled; cadence cost timed below
    _, front_batch = make_batch(0)   # i % 4 == 0 -> front view
    _, novel_batch = make_batch(1)
    for (front, shaded), fn in steps.items():
        batch = front_batch if front else novel_batch
        params, opt_state, metrics, _ = fn(params, opt_state, grid, key, batch)
    jax.block_until_ready(metrics["loss"])
    rng = np.random.default_rng(0)  # reset the shading-mix stream

    # timed run, including the every-16-step grid refresh like training
    n_steps = 40
    t0 = time.time()
    for i in range(n_steps):
        if i % cfg.update_extra_interval == 0:
            # cadence cost is timed, but occupancy stays the synthetic
            # sphere so the marching workload remains asset-realistic
            _ = update_grid(params, grid, key)
        fn, batch = make_batch(i)
        params, opt_state, metrics, _ = fn(params, opt_state, grid, key, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0

    iters_per_sec = n_steps / dt
    rays_per_sec = iters_per_sec * cfg.h * cfg.w
    target = 5000.0 / (9 * 60)  # coarse stage inside the 15-min asset budget

    # --- SDS phase: novel-view step with the full-size SD 2.0 stack ---
    # (randomly initialized towers — zero-egress environment — but the
    # real architecture, so the FLOPs and memory traffic are honest).
    # "SDS iters/sec" is the tracked metric in BASELINE.json.
    sds_iters_per_sec = None
    try:
        if os.environ.get("BENCH_SKIP_SDS") == "1":
            raise RuntimeError("BENCH_SKIP_SDS=1")
        if dt > 120.0:
            # the relay is in a degraded window (healthy: <2s for 40
            # steps); the big-UNet compile would eat the bench budget
            raise RuntimeError(f"coarse phase took {dt:.0f}s, skipping")
        from makeit3d_tpu.guidance.sd import StableDiffusionGuidance

        guidance = StableDiffusionGuidance(sd_version="2.0")
        text_z = guidance.get_text_embeds(["a teddy bear"], [""])
        text_pooled = guidance.clip_text_embeds("a teddy bear")
        sds_step = jax.jit(build_train_step(
            cfg, field, optimizer, settings, guidance, is_front=False,
            shaded=False))
        _, batch = make_batch(1)
        batch = {**batch, "diff_phase": jnp.asarray(1.0),
                 "text_z": text_z, "text_z_clip": text_pooled,
                 "gparams": guidance.params}
        params2, opt2, metrics, _ = sds_step(params, opt_state, grid, key,
                                             batch)
        jax.block_until_ready(metrics["loss"])
        n_sds = 10
        t0 = time.time()
        for i in range(n_sds):
            params2, opt2, metrics, _ = sds_step(params2, opt2, grid, key,
                                                 batch)
        jax.block_until_ready(metrics["loss"])
        sds_iters_per_sec = round(n_sds / (time.time() - t0), 3)
    except Exception as e:  # never fail the bench line on the SDS phase
        print(f"[bench] SDS phase skipped: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "coarse_train_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / target, 3),
        "rays_per_sec": round(rays_per_sec, 1),
        "sds_iters_per_sec": sds_iters_per_sec,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
