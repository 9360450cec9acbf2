"""Benchmark: coarse-stage training throughput on the real TPU.

Workload = the reference's hot loop at its published settings (128x128
rays/step, finite-difference/analytic normals + smoothness term,
occupancy marching, full loss stack minus the frozen diffusion prior,
Adan update) — reference README.md:71-74 trains 5000 such iters. The
headline runs the TPU flagship `fourier` backbone (MXU-aligned MLP
field; matmul-only backward — the hash backbone is bounded by the
XLA:TPU scatter-add ceiling of ~20M rows/s and is reported separately;
docs/TPU_NOTES.md "scatter ceiling").

Prints ONE JSON line. vs_baseline normalizes against the driver's
north-star budget (full coarse stage inside the 15-minute asset budget:
5000 iters / 9 min => 9.26 iter/s); >1.0 means the coarse loop is faster
than the budget requires.

TIMING METHODOLOGY: through the axon relay, jax.block_until_ready can
acknowledge before the device finishes (round-1's 250-308 it/s rows
were phantom dispatch rates measured that way). All timings here chain
steps data-dependently and end with ONE host fetch of a scalar, which
is the only trustworthy completion barrier (docs/TPU_NOTES.md).

Measurement conditions (recorded in the JSON so the line is
self-describing):
- grid_source: "trained_snapshot" when a trained checkpoint's occupancy
  grid is found under results/*/checkpoints (the real marching
  workload), else the synthetic solid sphere.
- The step programs are the PRODUCTION programs: built through
  make_step_variant, exactly as the Trainer builds them.
"""

import functools
import glob
import json
import math
import os
import time

import numpy as np

# v5e peak: 197 TFLOP/s bf16 / 394 TOPS int8 (public spec). The MFU
# figure uses the bf16 peak; the default field runs its MLP matmuls in
# f32, so this is a conservative (lower-bound) utilization number.
V5E_PEAK_FLOPS = 197e12


def load_snapshot_grid(cfg):
    """Occupancy grid from the newest trained checkpoint, if any."""
    from flax import serialization

    from makeit3d_tpu.ops.grid import DensityGrid, init_density_grid

    paths = sorted(glob.glob("results/*/checkpoints/*.ckpt"),
                   key=os.path.getmtime)
    tmpl = init_density_grid(cfg.cascade, cfg.grid_size)
    # Prefer the MOST-TRAINED grid, not the most recent file: a smoke or
    # verify workspace written minutes ago (1 epoch, near-init grid) must
    # not displace a converged asset as the bench's occupancy regime
    # (round-5 fix: BENCH_r05's first run picked verify_r5_cpu over the
    # 2000-step teddy_r5 on mtime alone).
    best = (None, None, -1)
    for path in reversed(paths):
        try:
            with open(path, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            step = int(raw.get("global_step", 0))
            if step <= best[2]:
                continue
            grid = DensityGrid(
                *serialization.from_state_dict(tmpl, raw["grid"]))
            if grid.occ.shape == tmpl.occ.shape:
                best = (grid, path, step)
        except Exception:
            continue
    return best[0], best[1]


def measure_flops(fn, params, opt_state, grid, key, batch):
    """Compiled-executable FLOP count for one train step (both programs
    of the encode split when active). None if the backend's cost model
    is unavailable."""

    def flops_of(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    try:
        if hasattr(fn, "grad_program"):
            g = fn.grad_program.lower(params, grid, key, batch).compile()
            gparams, dfeats, positions, _, _ = fn.grad_program(
                params, grid, key, batch)
            # scatter runs K times per step over fixed-size row slices
            # (training/split_step.py); count it K times
            import jax.numpy as jnp

            slice_rows = fn.scatter_slice_rows
            K = -(-positions.shape[0] // slice_rows)
            gtab = jnp.zeros(fn.gtab_shape, jnp.float32)
            pos_s = jnp.zeros((slice_rows, 3))
            df_s = jnp.zeros((slice_rows, dfeats.shape[1]), dfeats.dtype)
            s = fn.scatter_program.lower(gtab, pos_s, df_s).compile()
            u = fn.update_program.lower(
                params, opt_state, gparams, gtab).compile()
            return flops_of(g) + K * flops_of(s) + flops_of(u)
        return flops_of(
            fn.lower(params, opt_state, grid, key, batch).compile())
    except Exception:
        return None


import threading

_emit_lock = threading.Lock()
_emitted = [False]


def add_note(report: dict, msg: str):
    report["note"] = "; ".join(
        ([report["note"]] if report.get("note") else []) + [msg])


def emit(report: dict, status: str = "ok"):
    """Print the bench JSON line exactly once (the deadline timer and the
    normal end-of-run path race; advisor round-2 finding)."""
    with _emit_lock:
        if _emitted[0]:
            return
        _emitted[0] = True
        report.setdefault("metric", "coarse_train_iters_per_sec")
        report.setdefault("value", None)
        report.setdefault("unit", "iter/s")
        report.setdefault("vs_baseline", None)
        report["status"] = status
        print(json.dumps(report), flush=True)


def _arm_deadline(report: dict, seconds: float):
    """Guarantee the driver a JSON line even when the relay never comes
    back: a blocked device fetch cannot be interrupted from Python, so a
    daemon timer prints whatever was measured so far and hard-exits.
    (2026-08-18: a degraded window where a 1k x 1k matmul compile+fetch
    took 72 s swallowed an entire 25-minute bench run without output.)
    Every phase writes its result (or an in-progress/skip marker) into
    `report` BEFORE moving on, so the deadline line carries all completed
    phases (round-2 verdict item 1b)."""

    def fire():
        add_note(report, f"deadline {seconds:.0f}s hit: phases after the "
                         f"last recorded one did not finish")
        emit(report, status="deadline")
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache (round-2 verdict item 1a): the big
    # SDS-tower compiles through a degraded relay window ate the whole
    # r02 bench budget. With the cache, any compile is paid once EVER —
    # a re-run in a healthy window (or after a worker respawn) reloads
    # the executable from disk instead of recompiling.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        print(f"[bench] compile cache unavailable: {e}")

    bench_t0 = time.time()
    budget_s = float(os.environ.get("BENCH_DEADLINE_S", "1500"))

    def remaining():
        return budget_s - (time.time() - bench_t0)

    def mark(label):
        # phase-boundary telemetry: where the budget actually goes
        # (round-5: hash/mv/multi-asset starved even with a warm cache)
        print(f"[bench] t={time.time() - bench_t0:.0f}s {label}", flush=True)

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import (
        make_field, SHADING_ALBEDO, SHADING_LAMBERTIAN, SHADING_TEXTURELESS,
    )
    from makeit3d_tpu.models.renderer import RenderSettings
    from makeit3d_tpu.ops.grid import init_density_grid, update_density_grid
    from makeit3d_tpu.training.optimizer import make_lr_schedule, make_optimizer
    from makeit3d_tpu.training.trainer import make_step_variant

    report = {}
    deadline = _arm_deadline(report, budget_s)

    # reference workload shape: 128x128 rays, S budget 96; flagship field
    cfg = Config(guidance="none", backbone="fourier")
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    opt_state = optimizer.init(params)
    settings = RenderSettings.from_config(cfg, training=True)

    update_grid = jax.jit(
        lambda p, g, k: update_density_grid(
            g, lambda x: field.apply(p, x, method="density")["sigma"],
            k, cfg.bound, cfg.density_thresh,
        )
    )
    # The Trainer's static program variants, built through the SAME
    # factory the Trainer uses (front is always albedo; novel steps past
    # albedo_iters sample 50% albedo / 10% textureless / 40% lambertian
    # — reference utils.py:470-483). On TPU the shaded variant is the
    # two-program encode split (training/split_step.py).
    steps = {
        (front, shaded): make_step_variant(
            cfg, field, optimizer, settings, None, is_front=front,
            shaded=shaded, with_sds=False)
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

    # Marching workload: prefer the occupancy grid of an actual trained
    # asset (the regime training really runs); fall back to a solid
    # sphere of radius 0.6 (typical trained-asset footprint) so object
    # rays saturate their full per-ray sample budget either way.
    grid, snap_path = load_snapshot_grid(cfg)
    if grid is not None:
        grid_source = f"trained_snapshot:{snap_path}"
    else:
        grid = init_density_grid(cfg.cascade, cfg.grid_size)
        H = cfg.grid_size
        coords = (np.mgrid[0:H, 0:H, 0:H].astype(np.float32) + 0.5) / H * 2 - 1
        sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
        grid = grid._replace(
            occ=jnp.asarray(sphere[None].repeat(cfg.cascade, 0)))
        grid_source = "synthetic_sphere"

    # warmup / compile all three program variants explicitly
    _ = update_grid(params, grid, key)  # compiled; cadence cost timed below
    _, front_batch = make_batch(0)   # i % 4 == 0 -> front view
    _, novel_batch = make_batch(1)
    for (front, shaded), fn in steps.items():
        batch = front_batch if front else novel_batch
        params, opt_state, metrics, _ = fn(params, opt_state, grid, key, batch)
    _ = float(np.asarray(metrics["loss"]))  # fetch = true completion
    rng = np.random.default_rng(0)  # reset the shading-mix stream

    # Per-variant compiled FLOPs + the fused-MLP Pallas kernel's analytic
    # count (XLA's cost model sees the custom call as ~0 FLOPs; per row,
    # fwd = 2*(DIN*H + (L-2)*H*H + H*OUT_PAD), the fwd+in-kernel grad
    # chain ~2x fwd and the hand-derived training backward ~5x fwd —
    # derivation: scripts/bench_fused_mlp.py; the shaded step pushes 2x
    # rows: main + batched smooth eval). MFU is weighted by the actual
    # schedule mix — front every 4th step, novel draws 50% albedo / 10%
    # textureless / 40% lambertian (reference utils.py:470-483) — not by
    # the most expensive program (round-2 verdict weak #2).
    def pallas_flops(shaded):
        if not (cfg.backbone == "fourier" and cfg.mlp_hidden % 128 == 0):
            return 0.0
        from makeit3d_tpu.ops.pallas.fused_mlp import OUT_PAD

        H_, L_ = cfg.mlp_hidden, cfg.mlp_layers
        fwd_row = 2 * (128 * H_ + (L_ - 2) * H_ * H_ + H_ * OUT_PAD)
        rows = cfg.h * cfg.w * cfg.train_samples_per_ray
        if shaded and cfg.deferred_shading:
            # deferred: albedo program over the lattice (fwd 1x +
            # training bwd 5x) + the ray-level normal chain at
            # [x_surf; x_surf+noise] = 2N rows ((fwd+grad) 2x + bwd 5x)
            return (rows * fwd_row * 6
                    + 2 * cfg.h * cfg.w * fwd_row * 7)
        if shaded:
            return rows * 2 * fwd_row * 7  # (fwd+grad chain) 2x + bwd 5x
        return rows * fwd_row * 6          # fwd 1x + training bwd 5x

    flops_var = {}
    for (front, shaded), fn in steps.items():
        f = measure_flops(fn, params, opt_state, grid, key,
                          front_batch if front else novel_batch)
        flops_var[(front, shaded)] = (
            None if f is None else f + pallas_flops(shaded))
    flops_step = flops_var[(False, True)]  # hot program pair (reported)
    MIX = {(True, False): 0.25, (False, False): 0.375, (False, True): 0.375}
    flops_mix = (None if any(v is None for v in flops_var.values())
                 else sum(MIX[k] * v for k, v in flops_var.items()))

    # timed run, including the every-16-step grid refresh like training;
    # steps chain data-dependently (params/opt_state), ONE fetch at end
    n_steps = 40
    t0 = time.time()
    for i in range(n_steps):
        if i % cfg.update_extra_interval == 0:
            # cadence cost is timed; occupancy stays the snapshot/sphere
            # so the marching workload remains asset-realistic
            _ = update_grid(params, grid, key)
        fn, batch = make_batch(i)
        params, opt_state, metrics, _ = fn(params, opt_state, grid, key, batch)
    _ = float(np.asarray(metrics["loss"]))
    dt = time.time() - t0

    iters_per_sec = n_steps / dt
    rays_per_sec = iters_per_sec * cfg.h * cfg.w
    target = 5000.0 / (9 * 60)  # coarse stage inside the 15-min asset budget
    # schedule-mix-weighted MFU (honest); mfu_hot_program kept for
    # round-over-round comparability with r02's (flattering) definition
    mfu = (round(flops_mix * iters_per_sec / V5E_PEAK_FLOPS, 4)
           if flops_mix else None)
    mfu_hot = (round(flops_step * iters_per_sec / V5E_PEAK_FLOPS, 4)
               if flops_step else None)
    report.update({
        "metric": "coarse_train_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / target, 3),
        "rays_per_sec": round(rays_per_sec, 1),
        "mfu": mfu,
        "mfu_hot_program": mfu_hot,
        "grid_source": grid_source,
    })
    mark("coarse done")

    # ==== TRACKED PHASES ====================================================
    # The driver tracks five metrics: coarse (above), sds, eval_frame,
    # refine, minutes_per_asset. Each gets a guaranteed floor AHEAD of
    # all discretionary work (round-4 verdict item 1: the hash phase ran
    # second and the mv add-on ran inside the SDS ladder, so eval+refine
    # starved two rounds running and minutes_per_asset never composed).
    # Order: sds -> eval (1 frame) -> refine (3 steps) -> composition;
    # hash A/B, mv-SDS and other discretionary phases run LAST with
    # whatever budget remains.

    # --- SDS phase: novel-view step with the full-size SD 2.0 stack ---
    # (randomly initialized towers — zero-egress environment — but the
    # real architecture, so the FLOPs and memory traffic are honest).
    # "SDS iters/sec" is the tracked metric in BASELINE.json. Resilience
    # mirrors the Trainer: on a worker fault, wait out the respawn and
    # re-roll with a fresh compile salt (new executable); if 128x128
    # keeps faulting, fall back to a 64x64 render (the SD stack still
    # consumes the same 512x512 upsampled image — UNet FLOPs unchanged).
    # placeholders land in the report NOW: a deadline firing mid-compile
    # still carries the phase marker instead of dropping the keys
    report.update({
        "sds_iters_per_sec": None,
        "sds_mfu": None,
        "sds_mv_views_per_sec": None,
        "sds_note": "in progress",
    })
    guidance_obj = g_text_z = g_text_pooled = None
    sds_cfg_used = sds_attn_used = None
    run_sds_mv = None
    try:
        if os.environ.get("BENCH_SKIP_SDS") == "1":
            raise RuntimeError("BENCH_SKIP_SDS=1")
        if dt > 120.0:
            # the relay is in a degraded window (healthy: <2s for 40
            # steps); the big-UNet compile would eat the bench budget
            raise RuntimeError(f"coarse phase took {dt:.0f}s, skipping")
        from makeit3d_tpu.guidance.sd import StableDiffusionGuidance

        # bf16 towers = the --fp16 production setting (the reference's
        # AMP analogue); measured 89 vs 105 ms/SDS-step against f32
        guidance = StableDiffusionGuidance(sd_version="2.0",
                                           dtype=jnp.bfloat16)
        text_z = guidance.get_text_embeds(["a teddy bear"], [""])
        text_pooled = guidance.clip_text_embeds("a teddy bear")
        # exported for the refine phase (full guided refine step)
        guidance_obj, g_text_z, g_text_pooled = guidance, text_z, text_pooled

        def flash_attn_flops():
            """Analytic FLOPs of attention calls that dispatch to the
            Pallas flash kernel inside one SDS step — XLA's cost model
            sees the custom call as ~0 FLOPs (same treatment as
            pallas_flops above). Candidate call sites and their head
            dims (models/sd/layers.py): the SD2 UNet self-attentions at
            the 64^2 latent (N=4096, 2+3 layers, C=320, d=64) and 32^2
            (N=1024, 2+3 layers, C=640, d=64) under the CFG batch of 2,
            forward-only (eps_hat is stop-gradient'd); and the VAE
            encoder mid-block attention (N=4096, C=512, single head
            d=512, B=1), fwd + ~2x bwd (it sits in the SDS grad path).
            _flash_eligible decides per-site (d>=128 gate: the UNet's
            d=64 shapes measured slower on the kernel). Each attention
            costs 4*B*N^2*C FLOPs (QK^T + AV)."""
            from makeit3d_tpu.models.sd.layers import _flash_eligible

            total = 0.0
            for layers, N, C, d, B, passes in (
                (5, 4096, 320, 64, 2, 1.0),    # UNet 64^2, fwd
                (5, 1024, 640, 64, 2, 1.0),    # UNet 32^2, fwd
                (1, 4096, 512, 512, 1, 3.0),   # VAE mid, fwd + bwd
            ):
                if _flash_eligible(N, N, d):
                    total += layers * passes * 4.0 * B * N * N * C
            return total

        def run_sds(sds_cfg, salt):
            sds_settings = RenderSettings.from_config(sds_cfg, training=True)
            sds_step = make_step_variant(
                sds_cfg, field, optimizer, sds_settings, guidance,
                is_front=False, shaded=False, with_sds=True, salt=salt)
            s_sampler = ViewSampler(sds_cfg, type="train", H=sds_cfg.h,
                                    W=sds_cfg.w, size=100, seed=0)
            view = s_sampler.get(1)
            batch = {
                "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
                "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
                "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
                "shading_mode": jnp.asarray(SHADING_ALBEDO, jnp.int32),
                "ambient_ratio": jnp.asarray(1.0, jnp.float32),
                **consts,
                "diff_phase": jnp.asarray(1.0),
                "text_z": text_z, "text_z_clip": text_pooled,
                "gparams": guidance.params,
            }
            p2, o2, m, _ = sds_step(params, opt_state, grid, key, batch)
            _ = float(np.asarray(m["loss"]))  # fetch = true completion
            fl = measure_flops(sds_step, params, opt_state, grid, key, batch)
            if fl is not None:
                fl += flash_attn_flops()
            n_sds = 10
            t0 = time.time()
            for _i in range(n_sds):
                p2, o2, m, _ = sds_step(p2, o2, grid, key, batch)
            _ = float(np.asarray(m["loss"]))
            ips = n_sds / (time.time() - t0)
            return ips, fl

        def run_sds_mv(sds_cfg, B=4):
            """Multi-view batched SDS: B novel views through one vmapped
            step (make_multiview_step) — B-fold bigger UNet/VAE matmuls
            per dispatch. Reported as views/sec for comparison with the
            single-view iters/sec."""
            from makeit3d_tpu.training.trainer import (
                MV_VIEW_KEYS, make_multiview_step,
            )

            sds_settings = RenderSettings.from_config(sds_cfg, training=True)
            mv_step = make_multiview_step(
                sds_cfg, field, optimizer, sds_settings, guidance,
                shaded=False, with_sds=True)
            s_sampler = ViewSampler(sds_cfg, type="train", H=sds_cfg.h,
                                    W=sds_cfg.w, size=100, seed=0)
            vs = [s_sampler.get(1 + j) for j in range(B)]
            vs = [v for v in vs if not v.is_front][:B]
            batch = {
                # **consts FIRST: it carries scalar is_large/diff_phase
                # defaults that must not clobber the batched entries below
                # (a trailing **consts silently re-scalared is_large and
                # broke the vmap in_axes: "rank should be at least 1")
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
            n_it = 5
            t0 = time.time()
            for _i in range(n_it):
                p2, o2, m, _ = mv_step(p2, o2, grid, key, batch)
            _ = float(np.asarray(m["loss"]))
            return n_it * len(vs) / (time.time() - t0)

        # attempt ladder: auto attention (flash kernel on eligible
        # shapes) first; einsum-forced second so a Mosaic regression can
        # never cost the tracked metric; 64^2 render last
        from makeit3d_tpu.models.sd.layers import set_attention_impl

        attempts = [(cfg, 0, "auto"), (cfg, 1, "einsum"),
                    (Config(guidance="none", backbone="fourier",
                            h=64, w=64), 2, "einsum")]
        last_err = None
        for sds_cfg, salt, attn_impl in attempts:
            try:
                set_attention_impl(attn_impl)
                ips, fl = run_sds(sds_cfg, salt)
                if attn_impl != "auto":
                    add_note(report, f"sds attention impl: {attn_impl}")
                # the tracked metric lands in the report the moment it
                # exists — the mv add-on below must not hold it hostage
                report["sds_iters_per_sec"] = round(ips, 3)
                mark("sds done")
                if fl:
                    report["sds_mfu"] = round(
                        fl * ips / V5E_PEAK_FLOPS, 4)
                report["sds_note"] = (
                    f"measured at {sds_cfg.h}x{sds_cfg.w} render"
                    if sds_cfg.h != cfg.h else None)
                # mv-SDS is a DISCRETIONARY phase now — it runs after
                # the tracked phases + composition (round-4: it ran here
                # and starved eval+refine); remember the config it must
                # match for comparability with the single-view number
                sds_cfg_used, sds_attn_used = sds_cfg, attn_impl
                break
            except Exception as e:  # worker fault: respawn + re-roll
                last_err = e
                print(f"[bench] SDS attempt (salt={salt}, h={sds_cfg.h}) "
                      f"failed: {type(e).__name__}; re-rolling", flush=True)
                if remaining() < 240.0:
                    raise RuntimeError(
                        f"budget exhausted re-rolling: {last_err}")
                time.sleep(45.0)
        else:
            raise RuntimeError(f"all SDS attempts failed: {last_err}")
    except Exception as e:  # never fail the bench line on the SDS phase
        print(f"[bench] SDS phase skipped: {type(e).__name__}: {e}")
        if report.get("sds_iters_per_sec") is None:
            report["sds_note"] = f"skipped: {type(e).__name__}: {e}"
    # The attempt ladder leaves the module-global attention impl at the
    # last attempt's value (advisor r3 finding #2): an einsum fallback
    # would silently force einsum on every later trace. Reset to the env
    # default so the phases below dispatch the production policy. (The
    # mv add-on intentionally runs inside the ladder under the same impl
    # as the single-view number it is compared against; a non-auto impl
    # is already recorded in the note.)
    from makeit3d_tpu.models.sd.layers import set_attention_impl as _sai
    _sai(os.environ.get("MAKEIT3D_ATTENTION", "auto"))

    # --- eval/orbit render phase: one 800x800 test frame as ONE scanned
    # program (the Trainer's render_chunks_scan shape — VERDICT round-1
    # item 9: the orbit frame used to be 157 sequential relay dispatches).
    # Mirrors production render_image BY CONSTRUCTION via the shared
    # training/eval_frame.py helpers (advisor r4 #2: the old bench
    # asserted a square max_ray_batch where production silently fell
    # back to scanlines): dust-filtered occupancy, host regime decision
    # (tiled skip vs plain scanline at the 10% skippable-tile gate), and
    # the same host tile (re)assembly. Timed per frame INCLUDING the D2H
    # image fetch, which is what the production test loop pays per
    # written PNG. The dust filter itself runs once per grid generation
    # (production caches it across the 33+ frames of an orbit) so it is
    # paid outside the per-frame timing. ---
    report["eval_frame_800_ms"] = None
    try:
        if os.environ.get("BENCH_SKIP_EVAL") == "1":
            raise RuntimeError("BENCH_SKIP_EVAL=1")
        if dt > 120.0:
            raise RuntimeError("degraded relay window")
        if remaining() < 90.0:
            raise RuntimeError("budget exhausted")
        from makeit3d_tpu.models.renderer import (
            render_eval_chunk_skippable, render_occupancy,
        )
        from makeit3d_tpu.ops.grid import dust_filter_occ, occupied_aabb
        from makeit3d_tpu.training.eval_frame import (
            pack_scanlines, plan_tiles,
        )

        es = RenderSettings.from_config(cfg, training=False)
        t_sampler = ViewSampler(cfg, type="test", H=cfg.H, W=cfg.W,
                                size=8, seed=0)
        view = t_sampler.get(0)
        B = cfg.max_ray_batch
        H, W = cfg.H, cfg.W
        plan = (plan_tiles(H, W, B)
                if (cfg.eval_tile and cfg.eval_aabb_skip) else None)
        grid_eval = grid
        use_skip = False
        if plan is not None:
            occ_f, n_dropped = dust_filter_occ(
                np.asarray(grid.occ), cfg.eval_dust_frac)
            occ_f = jnp.asarray(occ_f)
            box = np.asarray(jax.jit(
                lambda o: occupied_aabb(o, cfg.bound))(occ_f))
            frac = plan.skippable_frac(box, view.rays_o, view.rays_d,
                                       cfg.min_near)
            use_skip = frac >= 0.1
            if use_skip:
                grid_eval = grid._replace(occ=occ_f)
            add_note(report, f"eval skippable_tile_frac={frac:.2f} "
                             f"dust_dropped={n_dropped}")

        @functools.partial(jax.jit, static_argnames=("skip",))
        def eval_frame(params, grid, ro, rd, ds, key, skip):
            if skip:
                aabb_occ = occupied_aabb(grid.occ, es.bound)

                def body(_, inp):
                    o, d, s = inp
                    out = render_eval_chunk_skippable(
                        field, params, grid, o, d, es, key, bg_color=1.0,
                        depth_scale=s, aabb_occ=aabb_occ)
                    return _, (out["image"], out["depth"])
            else:
                def body(_, inp):
                    o, d, s = inp
                    out = render_occupancy(
                        field, params, grid, o, d, es, key,
                        training=False, bg_color=1.0, perturb=False,
                        depth_scale=s)
                    return _, (out["image"], out["depth"])
            _, outs = jax.lax.scan(body, None, (ro, rd, ds))
            return outs

        def run_frame(params, grid, key):
            # production per-frame cost: host tiling, device render,
            # D2H fetch, host untiling
            if use_skip:
                ro = jnp.asarray(plan.tile_up(view.rays_o, 3))
                rd = jnp.asarray(plan.tile_up(view.rays_d, 3))
                ds = jnp.asarray(plan.tile_up(view.depth_scale, 1)[..., 0])
            else:
                ro = jnp.asarray(pack_scanlines(view.rays_o, 3, H, W, B))
                rd = jnp.asarray(pack_scanlines(view.rays_d, 3, H, W, B,
                                                pad_value=1.0))
                ds = jnp.asarray(
                    pack_scanlines(view.depth_scale, 1, H, W, B)[..., 0])
            img, _ = eval_frame(params, grid, ro, rd, ds, key,
                                skip=use_skip)
            if use_skip:
                img = plan.untile(img)
            else:
                img = (np.asarray(img).reshape(-1, 3)[:H * W]
                       .reshape(H, W, 3))
            return img

        _ = run_frame(params, grid_eval, key)  # compile
        n_f = 3 if remaining() > 240.0 else 1
        t0 = time.time()
        for _i in range(n_f):
            _ = run_frame(params, grid_eval, key)
        report["eval_frame_800_ms"] = round(
            (time.time() - t0) / n_f * 1000.0, 1)
        add_note(report, f"eval program={'tiled_skip' if use_skip else 'plain'}")
        mark("eval done")
    except Exception as e:
        print(f"[bench] eval phase skipped: {type(e).__name__}: {e}")

    # --- refine-stage phase: one optimization step of the point-splat +
    # gated-UNet neural renderer at full res. When the SDS towers built
    # above are live, this is the reference's FULL novel-view refine step
    # — SDS(gs=5) + 10*CLIP-img + contextual(VGG CX) + background +
    # anchor losses (nerf/utils.py:875-888); without them it degrades to
    # the splat+UNet+CX subset with a note (round-3 verdict item 4: the
    # r03 number timed a strict subset). ---
    report["refine_iters_per_sec"] = None
    try:
        if os.environ.get("BENCH_SKIP_REFINE") == "1":
            raise RuntimeError("BENCH_SKIP_REFINE=1")
        if dt > 120.0:
            raise RuntimeError("degraded relay window")
        if remaining() < 60.0:
            raise RuntimeError("budget exhausted")
        from makeit3d_tpu.cameras import fix_poses
        from makeit3d_tpu.training.refine import RefineStage

        rcfg = Config(guidance="none")
        stage = RefineStage(rcfg, guidance=guidance_obj, workspace=None,
                            seed=0)
        rng2 = np.random.default_rng(0)
        n_pts = 300_000  # typical fused-cloud scale (point_cloud.py cap 1e6)
        pts = rng2.uniform(-0.5, 0.5, (n_pts, 3)).astype(np.float32)
        cols = rng2.uniform(0, 1, (n_pts, 3)).astype(np.float32)
        n_cano = n_pts // 2
        rparams, ropt, ropt_state, anchors = stage.init_state(
            pts[:n_cano], cols[:n_cano], pts[n_cano:], cols[n_cano:])
        rstep, _fwd = stage.build_step(ropt, is_front=False,
                                       H=rcfg.H, W=rcfg.W, fov=rcfg.fov)
        _, _, w2c_pose, _, _ = fix_poses(
            1, 1, rng2, radius_range=rcfg.radius_range,
            theta_range=rcfg.theta_range, phi_range=rcfg.phi_range)
        w2c = jnp.asarray(np.linalg.inv(w2c_pose[0]), jnp.float32)
        gt = jnp.zeros((rcfg.H, rcfg.W, 3))
        gtm = jnp.ones((rcfg.H, rcfg.W))
        rargs = (w2c, key, gt, gtm, g_text_z, g_text_pooled, anchors,
                 guidance_obj.params if guidance_obj is not None else None)
        rparams, ropt_state, rm, _ = rstep(rparams, ropt_state, *rargs)
        _ = float(np.asarray(rm["loss"]))  # fetch = true completion
        n_r = 5 if remaining() > 300.0 else 3
        t0 = time.time()
        for _i in range(n_r):
            rparams, ropt_state, rm, _ = rstep(rparams, ropt_state, *rargs)
        _ = float(np.asarray(rm["loss"]))
        report["refine_iters_per_sec"] = round(n_r / (time.time() - t0), 3)
        mark("refine done")
        add_note(report, "refine step: full novel-view losses "
                         "(SDS gs=5 + 10*CLIP + CX + bg + anchors)"
                 if guidance_obj is not None else
                 "refine step: splat+UNet+CX subset (no SDS towers)")
        # free the refine stage's HBM (point features + UNet + VGG/CX +
        # optimizer states + jitted closures): left live, the mv/hash/
        # multi-asset phases below RESOURCE_EXHAUST (log_bench_r5_warm3)
        del rparams, ropt_state, ropt, rstep, _fwd, rargs, rm, anchors
        del stage
        import gc

        gc.collect()  # executables capture the point cloud as constants
    except Exception as e:
        print(f"[bench] refine phase skipped: {type(e).__name__}: {e}")

    # --- minutes-per-asset composition (round-3 verdict item 6): the
    # north star is a full coarse+refine asset; compose the measured
    # rates into the single-chip denominator the driver can watch.
    # Arithmetic (BASELINE.md "Targets"): 5000 coarse steps — front every
    # 4th; novel steps past diff_iters=400 carry SDS, so 0.75*(5000-400)
    # = 3450 run at the SDS rate and 1550 at the no-SDS mixed rate —
    # plus 33 mvimg orbit frames at the eval-frame rate, 3000 refine
    # steps, and a 60 s mesh-export allowance. ---
    try:
        c_ips = report.get("value")
        s_ips = report.get("sds_iters_per_sec")
        e_ms = report.get("eval_frame_800_ms")
        r_ips = report.get("refine_iters_per_sec")
        if all((c_ips, s_ips, e_ms, r_ips)):
            n_sds = 0.75 * (5000 - 400)
            secs = ((5000 - n_sds) / c_ips + n_sds / s_ips
                    + 33.0 * e_ms / 1000.0 + 3000.0 / r_ips + 60.0)
            report["minutes_per_asset_single_chip"] = round(secs / 60.0, 2)
    except Exception as e:
        print(f"[bench] asset composition skipped: {e}")

    # ==== DISCRETIONARY PHASES ==============================================
    # Everything below is extra characterization: it runs only with
    # leftover budget and can never starve the tracked surface above.

    # --- multi-view batched SDS: B novel views through one vmapped
    # step — B-fold bigger UNet/VAE matmuls per dispatch. Runs under the
    # same attention impl as the single-view number it is compared
    # against. 4 views of 512^2 SDS towers can exceed the 15.75G HBM —
    # fall back to a 2-view batch before giving up. ---
    if (run_sds_mv is not None and sds_cfg_used is not None
            and report.get("sds_iters_per_sec") is not None):
        from makeit3d_tpu.models.sd.layers import set_attention_impl as _sai2

        for mv_B in (4, 2):
            if remaining() < 150.0:
                add_note(report, "mv skipped: budget")
                break
            try:
                _sai2(sds_attn_used)
                report["sds_mv_views_per_sec"] = round(
                    run_sds_mv(sds_cfg_used, B=mv_B), 3)
                if mv_B != 4:
                    add_note(report, f"mv batch {mv_B}")
                break
            except Exception as e2:
                print(f"[bench] mv-SDS B={mv_B} skipped: "
                      f"{type(e2).__name__}: {e2}")
                time.sleep(20.0)  # let a faulted worker respawn
            finally:
                _sai2(os.environ.get("MAKEIT3D_ATTENTION", "auto"))

    # --- multi-asset throughput datum (BASELINE config 5): 2 assets'
    # coarse albedo steps vmapped into one program on the single chip —
    # the per-chip building block of the 8-asset v4-8 sharding
    # (parallel/mesh.py shard_multi_asset_step is correctness-covered on
    # the virtual mesh; this is the measured single-chip anchor). ---
    try:
        if os.environ.get("BENCH_SKIP_MULTIASSET") == "1":
            raise RuntimeError("BENCH_SKIP_MULTIASSET=1")
        if dt > 120.0 or remaining() < 120.0:
            raise RuntimeError("budget exhausted")
        A = 2
        fn2 = steps[(False, False)]
        p_stack = jax.tree.map(
            lambda x: jnp.stack([x] * A), params)
        o_stack = jax.tree.map(
            lambda x: jnp.stack([x] * A), opt_state)
        g_stack = jax.tree.map(lambda x: jnp.stack([x] * A), grid)
        b_stack = jax.tree.map(
            lambda x: jnp.stack([x] * A), novel_batch)
        k_stack = jax.random.split(key, A)
        vstep = jax.jit(jax.vmap(
            lambda p, o, g, k, b: fn2(p, o, g, k, b)))
        p_stack, o_stack, vm, _ = vstep(p_stack, o_stack, g_stack,
                                        k_stack, b_stack)
        _ = float(np.asarray(vm["loss"]).sum())
        n_v = 5
        t0 = time.time()
        for _i in range(n_v):
            p_stack, o_stack, vm, _ = vstep(p_stack, o_stack, g_stack,
                                            k_stack, b_stack)
        _ = float(np.asarray(vm["loss"]).sum())
        report["multi_asset_2x_steps_per_sec"] = round(
            n_v * A / (time.time() - t0), 3)
        mark("multi-asset done")
    except Exception as e:
        print(f"[bench] multi-asset phase skipped: {type(e).__name__}: {e}")

    deadline.cancel()
    report.update({
        "flops_per_step": flops_step,
        "flops_per_step_mix": flops_mix,
        "backbone": cfg.backbone,
        "timing": "host-fetch barrier (block_until_ready unreliable on relay)",
        "device": str(jax.devices()[0]),
    })
    # --- hash backbone (parity tier), albedo program, BOTH scatter
    # impls in one process against the same grid snapshot (round-4
    # verdict item 4: r02 recorded 0.095 it/s on the XLA path, r04
    # recorded 0.048 on the sorted kernel — same metric, different
    # impls/windows, never reconciled). Reports the winner as the
    # tracked number with both legs in the note. ---
    report["hash_albedo_iters_per_sec"] = None
    try:
        if os.environ.get("BENCH_SKIP_HASH") == "1":
            raise RuntimeError("BENCH_SKIP_HASH=1")
        if dt > 120.0:
            raise RuntimeError("degraded relay window")
        if remaining() < 240.0:
            raise RuntimeError("budget exhausted")
        legs = {}
        for impl in ("sorted", "vjp"):
            if impl != "sorted" and remaining() < 120.0:
                break
            hcfg = Config(guidance="none", backbone="hashgrid",
                          scatter_impl=impl)
            hfield = make_field(hcfg)
            hparams = hfield.init(key, jnp.zeros((8, 3)),
                                  jnp.zeros((8, 3)))
            hopt = make_optimizer(hcfg, make_lr_schedule(hcfg))
            hopt_state = hopt.init(hparams)
            hstep = make_step_variant(
                hcfg, hfield, hopt, settings, None, is_front=False,
                shaded=False, with_sds=False)
            hparams, hopt_state, hm, _ = hstep(hparams, hopt_state, grid,
                                               key, novel_batch)
            _ = float(np.asarray(hm["loss"]))
            n_h = 3
            t0 = time.time()
            for _i in range(n_h):
                hparams, hopt_state, hm, _ = hstep(hparams, hopt_state,
                                                   grid, key, novel_batch)
            _ = float(np.asarray(hm["loss"]))
            legs[impl] = round(n_h / (time.time() - t0), 3)
            print(f"[bench] hash leg {impl}: {legs[impl]} it/s",
                  flush=True)
            del hparams, hopt_state, hm, hstep  # free HBM
        if legs:
            best = max(legs, key=legs.get)
            report["hash_albedo_iters_per_sec"] = legs[best]
            add_note(report, "hash A/B " + ", ".join(
                f"{k}={v}" for k, v in legs.items()) + f"; best={best}")
            mark("hash done")
    except Exception as e:
        print(f"[bench] hash phase skipped: {type(e).__name__}: {e}")
        time.sleep(10.0)  # if the worker faulted, let it respawn

    emit(report, status="ok")


if __name__ == "__main__":
    main()
