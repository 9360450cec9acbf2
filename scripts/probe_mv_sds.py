"""Measure the multi-view SDS step vs single-view on the TPU.

Round-3 verdict item 5: BENCH_r03 recorded sds_mv_views_per_sec=1.888
at B=4 vs sds_iters_per_sec=3.01 single-view — the batched step lost
~37% view throughput despite B-fold bigger matmuls. The suspected cost
was the blanket jax.checkpoint around each view's forward (the full
2x-UNet CFG forward is rematerialized in the backward even though no
gradient flows through it — eps_hat is stop-gradient'd, reference
nerf/sd.py:138-151 computes it under no_grad).

The fix under test: guidance/sd.py tags its stop-grad constants with
checkpoint_name("sds_const") and make_multiview_step remats with
save_only_these_names("sds_const"), so the recompute graph keeps the
latent-grad residual and drops the UNet pair.

This probe times, on the real chip with bf16 towers (the production
--fp16 setting):
  - single-view SDS step (make_step_variant, with_sds=True) -> it/s
  - mv step B in {2, 4} with the named-policy remat -> views/s
  - mv step B in {2, 4} with remat=False (no checkpoint at all): if a
    small-B no-remat step fits HBM it should recover the single-view
    per-view rate, making the right default "remat only when B is
    large enough to need it".

All timings chain steps data-dependently and end with one host fetch
(block_until_ready is not a barrier through the axon relay).

Usage: python scripts/probe_mv_sds.py [--quick]
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
    from makeit3d_tpu.guidance.sd import StableDiffusionGuidance
    from makeit3d_tpu.models.field import make_field, SHADING_ALBEDO
    from makeit3d_tpu.models.renderer import RenderSettings
    from makeit3d_tpu.ops.grid import init_density_grid
    from makeit3d_tpu.training.optimizer import (
        make_lr_schedule, make_optimizer,
    )
    from makeit3d_tpu.training.trainer import (
        make_multiview_step, make_step_variant,
    )

    quick = "--quick" in sys.argv
    # MV_MARCH_MODE=occupancy tests whether the boxed program's liveness
    # is what pushes the B>=2 mv step past HBM (round-5: mv fit at B=4
    # no-remat in r4 under occupancy; OOMs at B=2 under boxed)
    cfg = Config(guidance="none", backbone="fourier",
                 march_mode=os.environ.get("MV_MARCH_MODE", "boxed"))
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)
    settings = RenderSettings.from_config(cfg, training=True)

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

    guidance = StableDiffusionGuidance(sd_version="2.0", dtype=jnp.bfloat16)
    text_z = guidance.get_text_embeds(["a teddy bear"], [""])
    text_pooled = guidance.clip_text_embeds("a teddy bear")

    consts = {
        "ref_rgba": jnp.zeros((512, 512, 4)),
        "ref_depth": jnp.full((512, 512), 0.5),
        "obj_mask": jnp.ones((512, 512)),
        "is_large": jnp.asarray(0.0),
        "diff_phase": jnp.asarray(1.0),
    }
    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w,
                          size=100, seed=0)

    results = []

    def emit(row):
        print(json.dumps(row), flush=True)
        results.append(row)

    # --- single-view SDS baseline ---
    view = sampler.get(1)
    sv_batch = {
        "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
        "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
        "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
        "shading_mode": jnp.asarray(SHADING_ALBEDO, jnp.int32),
        "ambient_ratio": jnp.asarray(1.0, jnp.float32),
        **consts,
        "text_z": text_z, "text_z_clip": text_pooled,
        "gparams": guidance.params,
    }
    sv_step = make_step_variant(cfg, field, optimizer, settings, guidance,
                                is_front=False, shaded=False, with_sds=True)
    p2, o2, m, _ = sv_step(params, opt_state, grid, key, sv_batch)
    _ = float(np.asarray(m["loss"]))
    n_it = 4 if quick else 10
    t0 = time.time()
    for _i in range(n_it):
        p2, o2, m, _ = sv_step(p2, o2, grid, key, sv_batch)
    _ = float(np.asarray(m["loss"]))
    emit({"case": "single_view", "iters_per_sec":
          round(n_it / (time.time() - t0), 3)})

    # --- multi-view: named-policy remat (the fix) vs blanket remat ---
    def run_mv(B, remat_policy):
        mv_step = make_multiview_step(
            cfg, field, optimizer, settings, guidance,
            shaded=False, with_sds=True,
            remat=(None if remat_policy == "named" else False),
            salt=hash(remat_policy) % 1000)
        vs = [sampler.get(1 + j) for j in range(B + 2)]
        vs = [v for v in vs if not v.is_front][:B]
        batch = {
            **consts,
            "rays_o": jnp.stack(
                [jnp.asarray(v.rays_o.reshape(-1, 3)) for v in vs]),
            "rays_d": jnp.stack(
                [jnp.asarray(v.rays_d.reshape(-1, 3)) for v in vs]),
            "depth_scale": jnp.stack(
                [jnp.asarray(v.depth_scale.reshape(-1)) for v in vs]),
            "is_large": jnp.asarray(
                [1.0 if v.is_large else 0.0 for v in vs]),
            "shading_mode": jnp.asarray(SHADING_ALBEDO, jnp.int32),
            "ambient_ratio": jnp.asarray(1.0, jnp.float32),
            "diff_phase": jnp.asarray(1.0),
            "text_z": jnp.stack([text_z] * len(vs)),
            "text_z_clip": jnp.stack([text_pooled] * len(vs)),
            "gparams": guidance.params,
        }
        p2, o2, m, _ = mv_step(params, opt_state, grid, key, batch)
        _ = float(np.asarray(m["loss"]))
        n_it2 = 3 if quick else 6
        t0 = time.time()
        for _i in range(n_it2):
            p2, o2, m, _ = mv_step(p2, o2, grid, key, batch)
        _ = float(np.asarray(m["loss"]))
        return round(n_it2 * len(vs) / (time.time() - t0), 3)

    legs = [(4, "named"), (2, "named"), (2, "noremat"), (4, "noremat")]
    if quick:
        legs = [(4, "named"), (2, "noremat")]
    if os.environ.get("PROBE_MV_LEGS"):  # e.g. "2:noremat,4:noremat"
        legs = [(int(b), p) for b, p in
                (s.split(":") for s in
                 os.environ["PROBE_MV_LEGS"].split(","))]
    for B, pol in legs:
        try:
            emit({"case": f"mv_B{B}_{pol}" if pol != "named"
                  else f"mv_B{B}_named_policy",
                  "views_per_sec": run_mv(B, pol)})
        except Exception as e:
            emit({"case": f"mv_B{B}_{pol}",
                  "error": f"{type(e).__name__}: {e}"})
            time.sleep(20.0)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
