"""Training orchestration for the coarse stage.

reference: nerf/utils.py:196-1027 (Trainer). Architecture differences
from the torch original, by design:

- One jitted train step: render -> losses -> Adan update compiles to a
  single XLA program per (front|novel) variant. The reference's two
  backward passes (SDS via latents.backward + main loss.backward,
  utils.py:983 / sd.py:171) collapse into one value_and_grad because the
  SDS gradient is expressed as sum(latents * stop_grad(w(t) (eps_hat -
  eps))) inside the loss.
- Branch flags (is_large, diffusion phase, shading mode) are traced
  scalars; is_front is static (2 compiled variants), matching the
  front-every-4th schedule (provider.py:159).
- Occupancy-grid maintenance is its own jitted program, run every
  update_extra_interval steps (utils.py:969-972).
- Host work per step: pose sampling (numpy) and scalar logging only.
"""

from __future__ import annotations

import functools
import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import ViewSampler
from ..config import Config
from ..models.field import (
    HashGridField,
    make_field,
    SHADING_ALBEDO,
    SHADING_LAMBERTIAN,
    SHADING_TEXTURELESS,
)
from ..models.renderer import (
    RenderSettings,
    march_stage,
    render_occupancy,
)
from ..ops.grid import DensityGrid, init_density_grid, update_density_grid
from ..utils import watchdog
from ..utils.workspace import (
    Workspace,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    save_depth_u16,
    save_image_u8,
    write_video,
)
from .losses import (
    entropy_loss,
    img_l1,
    masked_pearson_depth,
    opacity_loss,
    resize_bilinear,
)
from .optimizer import make_lr_schedule, make_optimizer


class OptimizationCollapseError(RuntimeError):
    """Training is diagnosably dead (ws_mean pinned at the solid-block
    entropy attractor, or non-finite loss) for collapse_abort_intervals
    consecutive logging intervals. Raised so dead runs die in minutes
    instead of burning hours (the elastic-recovery machinery watches
    device faults, not optimization collapse)."""


def build_loss_fn(cfg, field, settings, guidance, is_front: bool,
                  shaded: bool = True, with_sds: bool = True):
    """The per-step loss as a pure function (front|novel x albedo|shaded
    x sds|no-sds variants).

    reference: nerf/utils.py:461-574 train_step. See the class docstring
    for the single-backward SDS reformulation. `shaded=False` is the
    albedo-mode program: no normal probes, and — matching the
    reference's `normals is not None` gates (renderer.py:513-524) — no
    orient/smooth losses. `with_sds=False` is the pre-diff_iters program:
    the reference skips guidance.train_step entirely while
    `global_step < diff_iters` (utils.py:512-517), so steps before that
    boundary must not pay the VAE+2xUNet FLOPs — only the ViT-B/16 CLIP
    losses remain on novel views (utils.py:561-563 run unconditionally).
    """

    def loss_and_metrics(params, grid, key, batch, marched=None,
                         feats=None, positions=None):
        H, W = cfg.h, cfg.w
        k_render, k_bg, k_guide = jax.random.split(key, 3)
        bg_color = jax.random.uniform(k_bg, (3,))

        field_eval = smooth_eval = None
        if feats is not None:
            # encode-split stage 3: the field runs over pre-encoded hash
            # features; this program never touches the table
            # (training/split_step.py)
            if shaded:
                from ..models.field import make_split_evals

                field_eval, smooth_eval = make_split_evals(
                    field, params, feats, positions,
                    M=H * W * settings.n_samples,
                    light_d_ratio_shading=(batch["ambient_ratio"],
                                           batch["shading_mode"]),
                    chunk=settings.field_chunk,
                    compute_smooth=settings.compute_smooth,
                )
            else:
                from ..models.field import make_split_albedo_eval

                field_eval = make_split_albedo_eval(
                    field, params, feats, positions,
                    M=H * W * settings.n_samples,
                    chunk=settings.field_chunk,
                )

        out = render_occupancy(
            field, params, grid,
            batch["rays_o"], batch["rays_d"], settings, k_render,
            training=True,
            shading_mode=batch["shading_mode"],
            ambient_ratio=batch["ambient_ratio"],
            bg_color=bg_color,
            perturb=True,
            depth_scale=batch["depth_scale"],
            marched=marched,
            shaded=shaded,
            field_eval=field_eval,
            smooth_eval=smooth_eval,
        )
        pred_rgb = out["image"].reshape(H, W, 3)
        pred_depth = out["depth"].reshape(H, W)
        pred_ws = out["weights_sum"].reshape(H, W)

        # per-step random-background composite of the reference image
        # (reference: utils.py:491-493)
        ref_rgba = batch["ref_rgba"]  # [512, 512, 4]
        gt_rgb = ref_rgba[..., :3] * ref_rgba[..., 3:] + bg_color * (
            1.0 - ref_rgba[..., 3:]
        )

        pred_rgb512 = resize_bilinear(pred_rgb, (512, 512), align_corners=True)
        pred_depth512 = resize_bilinear(pred_depth, (512, 512), align_corners=True)

        metrics = {}
        is_large = batch["is_large"]         # traced 0/1
        diff_phase = batch["diff_phase"]     # traced 0/1 (step >= diff_iters)

        loss = 0.0
        if cfg.lambda_opacity > 0:
            l_op = opacity_loss(pred_ws)
            loss += cfg.lambda_opacity * l_op * (1.0 + 9.0 * is_large)
            metrics["loss_opacity"] = l_op
        if cfg.lambda_entropy > 0:
            l_ent = entropy_loss(pred_ws)
            loss += cfg.lambda_entropy * l_ent * (1.0 + 9.0 * diff_phase)
            metrics["loss_entropy"] = l_ent
        if cfg.lambda_sigma_cap > 0 and "loss_sigma_cap" in out:
            l_cap = out["loss_sigma_cap"]
            loss += cfg.lambda_sigma_cap * l_cap
            metrics["loss_sigma_cap"] = l_cap
        if cfg.lambda_orient > 0 and shaded:
            # reference adds lambda*loss once plus (1x | 10x) more
            # (utils.py:538-544): effective 2x pre-diff, 11x after
            l_or = out["loss_orient"]
            loss += cfg.lambda_orient * l_or * (2.0 + 9.0 * diff_phase)
            metrics["loss_orient"] = l_or
        if cfg.lambda_smooth > 0 and shaded:
            loss += cfg.lambda_smooth * out["loss_smooth"]
            metrics["loss_smooth"] = out["loss_smooth"]

        if is_front:
            l_img = img_l1(pred_rgb512, gt_rgb)
            l_depth = masked_pearson_depth(
                pred_depth512, batch["ref_depth"], batch["obj_mask"]
            )
            loss += cfg.lambda_img * l_img + cfg.lambda_depth * l_depth
            metrics["loss_img"] = l_img
            metrics["loss_depth"] = l_depth
        else:
            if guidance is not None:
                # novel view: CLIP image + text losses
                # (reference: utils.py:561-563)
                l_clip = guidance.clip_losses(
                    pred_rgb512, gt_rgb, batch["text_z_clip"],
                    gparams=batch["gparams"],
                )
                loss += cfg.lambda_clip * l_clip
                metrics["loss_clip"] = l_clip
                # SDS / denoise guidance once past diff_iters
                # (reference: utils.py:512-517). with_sds=False compiles
                # this subgraph out entirely for pre-diff steps.
                if with_sds:
                    l_sds = guidance.train_step_loss(
                        k_guide,
                        batch["text_z"],
                        pred_rgb512,
                        gt_rgb,
                        is_large,
                        cfg.guidance_scale,
                        text_pooled=batch["text_z_clip"],
                        gparams=batch["gparams"],
                    )
                    loss += diff_phase * l_sds
                    metrics["loss_sds"] = l_sds

        metrics["loss"] = loss
        metrics["ws_mean"] = jnp.mean(pred_ws)
        metrics["n_valid"] = out["n_valid"]
        aux = {
            "pred_rgb": pred_rgb512,
            "pred_depth": pred_depth512,
            "gt_rgb": gt_rgb,
        }
        return loss, (metrics, aux)

    return loss_and_metrics


def build_train_step(cfg, field, optimizer, settings, guidance,
                     is_front: bool, salt: int = 0, shaded: bool = True,
                     with_sds: bool = True):
    """loss -> grad -> Adan update, as one jittable pure function.

    `salt` perturbs one literal by 1e-6*salt so re-rolled compilations
    produce a distinct executable (the v5e fault is a per-executable
    codegen lottery; see docs/TPU_NOTES.md). The magnitude must survive
    float32 rounding — 1e-12 folds to exactly 1.0 and every re-roll then
    replays the same binary; 1e-6 is ~8 ulp at 1.0 and scales the loss
    (hence every gradient, uniformly) by a negligible factor.
    """
    loss_fn = build_loss_fn(cfg, field, settings, guidance, is_front,
                            shaded=shaded, with_sds=with_sds)

    def train_step(params, opt_state, grid, key, batch, marched=None):
        def salted(p):
            loss, (metrics, aux) = loss_fn(p, grid, key, batch, marched)
            if salt:
                loss = loss * (1.0 + 1e-6 * salt)
            return loss, (metrics, aux)

        gfn = jax.value_and_grad(salted, has_aux=True)
        (_, (metrics, aux)), grads = gfn(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics, aux

    return train_step


def make_train_step(cfg, field, optimizer, settings, guidance,
                    is_front: bool, split: Optional[bool] = None,
                    salt: int = 0, shaded: bool = True,
                    with_sds: bool = True):
    """Jitted train step, optionally as two programs (march | step).

    split=None follows cfg.split_march (default off). Measured on the
    axon v5e (docs/TPU_NOTES.md 2026-08-16 follow-up): splitting does
    NOT dodge the codegen fault lottery — the fault tracks the data
    regime, not in-program vs materialized lattices. Kept as an
    experiment knob; the elastic re-roll recovery (Trainer) is the
    production mitigation.
    """
    if split is None:
        split = bool(cfg.split_march)
    inner = jax.jit(build_train_step(
        cfg, field, optimizer, settings, guidance, is_front=is_front,
        salt=salt, shaded=shaded, with_sds=with_sds))
    if not split:
        return inner

    march_jit = jax.jit(
        lambda grid, ro, rd, k: march_stage(grid, ro, rd, settings, k,
                                            perturb=True))

    def stepped(params, opt_state, grid, key, batch):
        k_march, k_rest = jax.random.split(key)
        m = march_jit(grid, batch["rays_o"], batch["rays_d"], k_march)
        return inner(params, opt_state, grid, k_rest, batch, m)

    return stepped


# multi-view batching: which batch keys carry a leading [B] view axis
# (everything else — reference buffers, guidance weights, step-phase
# scalars — is shared across the group's views)
MV_VIEW_KEYS = ("rays_o", "rays_d", "depth_scale", "is_large",
                "text_z", "text_z_clip")


def resolve_mv_remat(remat: Optional[bool], with_sds: bool,
                     guidance) -> bool:
    """Auto remat policy for the multi-view step (None = auto; see
    make_multiview_step docstring for the round-4 measurement basis):
    bf16 towers fit B=4 at 128^2 without remat and run +33% faster, so
    only f32 towers checkpoint."""
    if remat is not None:
        return remat
    tower_bf16 = (guidance is not None
                  and getattr(guidance, "dtype", None) == jnp.bfloat16)
    return with_sds and not tower_bf16


def make_multiview_step(cfg, field, optimizer, settings, guidance,
                        shaded: bool, with_sds: bool = True,
                        salt: int = 0, mesh=None,
                        remat: Optional[bool] = None):
    """B novel views per optimizer step — a TPU-first capability the
    reference lacks (it renders exactly one view per step,
    provider.py:316). The render/loss is vmapped over the view axis, so
    all B renders batch through the frozen UNet/CLIP towers in one call
    (B-fold bigger matmuls for the MXU), and the step gradient is the
    MEAN of the per-view gradients — SGD over views with an effective
    batch of B. Per-view PRNG streams derive as fold_in(key, view_index)
    (testable closed form, tests/test_multiview.py).

    Batch arrays in MV_VIEW_KEYS carry a leading [B] axis; the rest are
    shared. With `mesh`, the VIEW axis shards over the "data" axis (the
    SURVEY §2.3 "batch novel views across the slice" mapping); B must be
    divisible by the mesh size.

    Hash backbones on TPU are excluded: their shaded program needs the
    encode split (resolve_split_encode), whose scatter program is not
    vmap-safe against the v5e fault. Use the fourier/vanilla backbones
    for multi-view training.

    `remat` (None = auto): jax.checkpoint each view's forward, so the
    backward rematerializes the render + VAE-encode chain instead of
    keeping all B views' activations resident. Auto policy, from the
    round-4 TPU measurement (scripts/probe_mv_sds.py, 128^2 render,
    v5e 15.75G HBM): with bf16 towers B=4 fits WITHOUT remat and runs
    2.803 views/s vs 2.114 with the named-policy remat (+33%) against
    a 3.022 it/s single-view baseline — so bf16 towers default to no
    remat; f32 towers keep it (2x the activation bytes, the original
    OOM regime). Gradients are bitwise identical either way.
    """
    remat = resolve_mv_remat(remat, with_sds, guidance)
    if mesh is None and getattr(settings, "march_mode", None) == "boxed":
        # Single-chip VMAPPED multi-view: the boxed program's liveness
        # pushes even B=2 past the v5e's 15.75G (measured round 5:
        # boxed mv OOMs at B=2 no-remat while occupancy fits B=4 at
        # 2.76 views/s — results/log_probe_mv_r5_occ.txt). Pin the
        # occupancy march here; the SHARDED path (mesh given, 1-2
        # views/device) keeps the configured mode — per-device it is
        # the single-view memory profile that measurably fits.
        import dataclasses as _dc

        settings = _dc.replace(settings, march_mode="occupancy")
    loss_fn = build_loss_fn(cfg, field, settings, guidance, is_front=False,
                            shaded=shaded, with_sds=with_sds)
    axes = {k: (0 if k in MV_VIEW_KEYS else None) for k in
            BATCH_KEYS + (GUIDANCE_BATCH_KEYS if guidance is not None
                          else ())}

    def per_view(p, g, k, b):
        # params/grid are explicit args (not closures) so jax.checkpoint
        # sees the differentiated input and the non-diff grid directly
        return loss_fn(p, g, k, b)

    if remat:
        # save_only_these_names instead of a blanket jax.checkpoint: the
        # SDS guidance tags its stop-gradient constants "sds_const"
        # (guidance/sd.py train_step_loss), so the backward's recompute
        # graph drops the 2x UNet CFG forward + denoise towers (no
        # gradient flows through them) and rematerializes only the
        # render + VAE-encode chain. Memory profile matches full remat
        # (the saved residuals are a [1,64,64,4] latent-grad and a
        # scalar per view); the recompute FLOPs drop by the UNet pair —
        # the bulk of the r03 mv-SDS regression (1.888 views/s at B=4 vs
        # 3.01 single-view; VERDICT r3 item 5).
        per_view = jax.checkpoint(
            per_view,
            policy=jax.checkpoint_policies.save_only_these_names(
                "sds_const"))

    def train_step(params, opt_state, grid, key, batch):
        B = batch["rays_o"].shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))

        def salted(p):
            losses, (metrics, aux) = jax.vmap(
                per_view,
                in_axes=(None, None, 0, {k: axes[k] for k in batch}),
            )(p, grid, keys, batch)
            loss = jnp.mean(losses)
            if salt:
                loss = loss * (1.0 + 1e-6 * salt)
            metrics = jax.tree.map(jnp.mean, metrics)
            return loss, (metrics, aux)

        gfn = jax.value_and_grad(salted, has_aux=True)
        (_, (metrics, aux)), grads = gfn(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics, aux

    if mesh is not None:
        keys = BATCH_KEYS + (
            GUIDANCE_BATCH_KEYS if guidance is not None else ())
        if "model" in mesh.axis_names:
            # 2-D data x model: views shard over "data", the frozen
            # guidance towers tensor-shard over "model" (parallel/tp.py)
            from ..parallel.mesh import shard_mv_tp_step

            if guidance is None:
                raise ValueError(
                    "a 'model' mesh axis needs guidance towers to shard")
            fn, _ = shard_mv_tp_step(train_step, mesh, keys,
                                     MV_VIEW_KEYS, guidance.params)
            return fn
        from ..parallel.mesh import shard_train_step

        fn, _ = shard_train_step(train_step, mesh, keys)
        return fn
    return jax.jit(train_step)


def resolve_split_encode(cfg, field) -> bool:
    """Whether shaded steps run as the two-program encode split
    (training/split_step.py). None = auto: on for hash backbones on a
    TPU backend (the v5e fused-backward fault workaround), off on
    CPU/GPU where it is pointless overhead."""
    split_enc = cfg.split_encode
    if split_enc is None:
        split_enc = jax.default_backend() == "tpu"
    return bool(split_enc) and isinstance(field, HashGridField)


# batch keys Trainer.step() constructs — the sharding specs for the
# multi-chip jit are derived from these at build time
BATCH_KEYS = (
    "rays_o", "rays_d", "depth_scale", "ref_rgba", "ref_depth",
    "obj_mask", "is_large", "diff_phase", "shading_mode", "ambient_ratio",
)
GUIDANCE_BATCH_KEYS = ("text_z", "text_z_clip", "gparams")


def make_step_variant(cfg, field, optimizer, settings, guidance, *,
                      is_front: bool, shaded: bool, with_sds: bool = True,
                      salt: int = 0, mesh=None):
    """One train-step program variant with the production program-
    partitioning choice applied (fused single program vs encode split).
    Shared by Trainer._build_jits and bench.py so the bench measures
    exactly the programs training runs.

    `mesh`: a jax.sharding.Mesh for data-parallel training (rays sharded
    over the "data" axis, state replicated; SURVEY.md §2.3). The sharded
    path always uses the fused single-program step: sharding is for real
    multi-chip topologies, not the single-chip axon relay whose codegen
    fault the encode split works around.
    """
    if mesh is not None:
        from ..parallel.mesh import shard_train_step

        raw = build_train_step(
            cfg, field, optimizer, settings, guidance, is_front=is_front,
            salt=salt, shaded=shaded, with_sds=with_sds)
        keys = BATCH_KEYS + (
            GUIDANCE_BATCH_KEYS if guidance is not None else ())
        fn, _ = shard_train_step(
            raw, mesh, keys,
            gparams=(guidance.params if guidance is not None
                     and "model" in mesh.axis_names else None))
        return fn
    # Albedo steps also take the split — but only to reach the sorted-
    # segment-sum scatter (the fused albedo program survives on the v5e
    # and is equally fast under the plain XLA scatter formulations).
    from .split_step import resolve_scatter_impl

    use_split = resolve_split_encode(cfg, field) and (
        shaded or resolve_scatter_impl(cfg, shaded=shaded) == "sorted")
    if use_split:
        if shaded and getattr(cfg, "deferred_shading", False):
            # advisor r4 #4: the renderer's deferred branch requires the
            # plain field evaluators and silently no-ops under the
            # encode-split overrides; --deferred_shading with the hash
            # backbone would otherwise A/B per-sample shading against
            # itself.
            import logging

            logging.getLogger(__name__).warning(
                "deferred_shading is set but the encode-split path is "
                "active (backbone=%s): the shaded step keeps per-sample "
                "shading (models/renderer.py deferred gate)",
                cfg.backbone)
        from .split_step import make_split_encode_step

        return make_split_encode_step(
            cfg, field, optimizer, settings, guidance,
            is_front=is_front, salt=salt, with_sds=with_sds,
            shaded=shaded)
    return make_train_step(
        cfg, field, optimizer, settings, guidance, is_front=is_front,
        salt=salt, shaded=shaded, with_sds=with_sds)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        field=None,
        guidance=None,
        ref_rgba: Optional[np.ndarray] = None,   # [1, 512, 512, 4] in [0,1]
        ref_depth: Optional[np.ndarray] = None,  # [512, 512] normalized
        ref_mask: Optional[np.ndarray] = None,   # [512, 512] bool, True=bg
        workspace: Optional[str] = None,
        name: str = "df",
        seed: int = 0,
        use_checkpoint: str = "latest",
    ):
        self.cfg = cfg
        self.name = name
        self.field = field if field is not None else make_field(cfg)
        self.guidance = guidance
        self.ws = Workspace(workspace or cfg.workspace, name)
        self.ws.dump_settings(cfg)
        self._prep_ref(ref_rgba, ref_depth, ref_mask)

        self.key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = self.field.init(
            k_init, jnp.zeros((8, 3)), jnp.zeros((8, 3))
        )
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
        self.ws.log(f"[INFO] #parameters: {n_params}")

        self.schedule = make_lr_schedule(cfg)
        self.optimizer = make_optimizer(cfg, self.schedule)
        self.opt_state = self.optimizer.init(self.params)

        self.grid = init_density_grid(cfg.cascade, cfg.grid_size)
        self.settings_train = RenderSettings.from_config(cfg, training=True)
        self.settings_eval = RenderSettings.from_config(cfg, training=False)

        # data-parallel device mesh (SURVEY.md §2.3): rays sharded over
        # "data", state replicated; XLA emits the grad psum over ICI.
        # The reference's analogue is its never-activated DDP wrap
        # (nerf/utils.py:255-264).
        self.mesh = None
        if cfg.mesh_data > 1:
            from ..parallel.mesh import make_mesh, make_mesh_2d

            if (cfg.h * cfg.w) % cfg.mesh_data:
                raise ValueError(
                    f"h*w={cfg.h * cfg.w} not divisible by "
                    f"mesh_data={cfg.mesh_data}")
            if cfg.mesh_model > 1:
                # 2-D data x model mesh (the v4-8 scale-out shape):
                # rays/views shard over "data", the frozen guidance
                # towers tensor-shard over "model" (parallel/tp.py)
                if guidance is None:
                    raise ValueError(
                        "mesh_model > 1 needs guidance towers to shard "
                        "(--guidance stable-diffusion | clip)")
                self.mesh = make_mesh_2d(cfg.mesh_data, cfg.mesh_model)
            else:
                self.mesh = make_mesh(cfg.mesh_data)
            self.ws.log(f"[INFO] device mesh: {self.mesh}")

        # tensor-parallel guidance towers (SURVEY.md §2.3: "the frozen SD
        # UNet can be replicated or tensor-sharded with pjit"). Sharding
        # the frozen params once here is the whole integration: every
        # step receives them through batch["gparams"], and XLA partitions
        # the UNet/VAE matmuls to match their input shardings.
        if cfg.mesh_model > 1:
            if guidance is None:
                # 1-D TP with nothing to shard: warn instead of a silent
                # no-op (the 2-D case above already raised)
                self.ws.log(
                    "[WARN] --mesh_model ignored: no guidance towers to "
                    "shard (--guidance none)")
            else:
                from ..parallel.tp import (
                    make_tp_mesh, shard_guidance_params,
                )

                tp_mesh = (self.mesh if self.mesh is not None
                           else make_tp_mesh(cfg.mesh_model))
                guidance.params = shard_guidance_params(
                    guidance.params, tp_mesh)
                self.ws.log(
                    f"[INFO] guidance towers tensor-sharded over "
                    f"{cfg.mesh_model} devices")

        # model EMA mirror (reference: utils.py:304-307 torch_ema;
        # updated per step at utils.py:1006-1007, swapped in around
        # eval/test at utils.py:1043-1071, saved in full checkpoints)
        self.ema_params = (
            jax.tree.map(jnp.array, self.params) if cfg.ema_decay else None
        )

        self.epoch = 0
        self.global_step = 0
        self.stats: Dict[str, Any] = {"loss": [], "results": []}
        self._host_rng = np.random.default_rng(seed)
        self._compile_salt = 0   # bumped per re-roll (see step())
        self._host_snapshot = None
        # bumped on every snapshot restore; step() discards results
        # computed against an older generation (zombie watchdog threads)
        self._state_gen = 0
        # consecutive dead logging intervals (collapse watchdog)
        self._collapse_streak = 0

        # text conditioning (reference: utils.py:370-401)
        self.text_z = None
        if guidance is not None and cfg.text is not None:
            self.prepare_text_embeddings()

        self._build_jits()

        if use_checkpoint == "latest":
            path = latest_checkpoint(self.ws.ckpt_dir)
            if path:
                self.load_checkpoint(path)
            else:
                self.ws.log("[WARN] No checkpoint found, model randomly initialized.")
        elif use_checkpoint not in ("scratch", None):
            self.load_checkpoint(use_checkpoint)
        self.take_host_snapshot()

    # ------------------------------------------------------------------
    def prepare_text_embeddings(self):
        cfg = self.cfg
        self.text = [cfg.text]

        def host(x):
            # With --mesh_model the embeddings are computed with
            # TP-sharded tower params, so they come back carrying a
            # committed "model" sharding that would clash with the train
            # step's replicated text_z in_shardings. Pull the (tiny)
            # arrays to host once; jit re-places them per its specs.
            return np.asarray(x)

        self.text_z = [host(
            self.guidance.get_text_embeds([cfg.text], [cfg.negative]))]
        if cfg.need_back:
            back = f"{cfg.text}, back view"
            neg = cfg.negative + (", " if cfg.negative else "") + "face"
            self.text.append(back)
            self.text_z.append(host(
                self.guidance.get_text_embeds([back], [neg])))
        else:
            self.text.append(cfg.text)
            self.text_z.append(self.text_z[0])
        self._clip_text_cache = [
            host(self.guidance.clip_text_embeds(t)) for t in self.text
        ]

    # ------------------------------------------------------------------
    def _build_jits(self):
        cfg = self.cfg

        @jax.jit
        def update_grid(params, grid, key):
            return update_density_grid(
                grid,
                lambda x: self.field.apply(params, x, method="density")["sigma"],
                key,
                cfg.bound,
                cfg.density_thresh,
            )

        self._update_grid = update_grid
        # Static program variants (front is always albedo-shaded,
        # reference utils.py:470-483), keyed (is_front, shaded, with_sds):
        # albedo programs skip the 6 finite-difference normal probes — 7x
        # fewer field evals (network_tcnn.py:141-144) — and pre-diff_iters
        # programs compile out the SD VAE+UNet subgraph entirely
        # (utils.py:512-517). jit is lazy, so only the variants a run
        # actually reaches are ever compiled.
        self._train_step = {
            (front, shaded, with_sds): make_step_variant(
                cfg, self.field, self.optimizer, self.settings_train,
                self.guidance, is_front=front, shaded=shaded,
                with_sds=with_sds, salt=self._compile_salt,
                mesh=self.mesh)
            for front, shaded in ((True, False), (False, False),
                                  (False, True))
            for with_sds in ((False, True) if self.guidance is not None
                             and not front else (False,))
        }
        self._mv_step = None
        if cfg.views_per_step > 1:
            if resolve_split_encode(cfg, self.field):
                raise ValueError(
                    "views_per_step > 1 needs an MLP backbone on TPU "
                    "(--backbone fourier|vanilla): the hash encode split "
                    "is not vmap-safe (training/split_step.py)")
            if self.mesh is not None and cfg.views_per_step % cfg.mesh_data:
                raise ValueError(
                    f"views_per_step={cfg.views_per_step} not divisible "
                    f"by mesh_data={cfg.mesh_data}")
            self._mv_step = {
                (shaded, with_sds): make_multiview_step(
                    cfg, self.field, self.optimizer, self.settings_train,
                    self.guidance, shaded=shaded, with_sds=with_sds,
                    salt=self._compile_salt, mesh=self.mesh)
                for shaded in (False, True)
                for with_sds in ((False, True) if self.guidance is not None
                                 else (False,))
            }
        if cfg.ema_decay:
            d = float(cfg.ema_decay)

            @jax.jit
            def ema_update(ema, params):
                return jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p, ema, params
                )

            self._ema_update = ema_update

        @functools.partial(jax.jit, static_argnames=("n_samples",))
        def render_chunk(params, grid, rays_o, rays_d, key, bg_color,
                         depth_scale, n_samples=None):
            s = self.settings_eval
            if n_samples is not None:
                import dataclasses as _dc
                s = _dc.replace(s, n_samples=n_samples)
            return render_occupancy(
                self.field, params, grid, rays_o, rays_d, s, key,
                training=False, shading_mode=SHADING_ALBEDO,
                ambient_ratio=1.0, bg_color=bg_color, perturb=False,
                depth_scale=depth_scale,
            )

        self._render_chunk = render_chunk

        @functools.partial(jax.jit,
                           static_argnames=("n_chunks", "n_samples",
                                            "use_skip"))
        def render_chunks_scan(params, grid, rays_o, rays_d, key, bg_color,
                               depth_scale, n_chunks, n_samples=None,
                               use_skip=False):
            """Full-image eval render as ONE program: lax.scan over ray
            chunks instead of n_chunks sequential host dispatches. An
            800x800 orbit frame was 157 round-trips through the
            high-latency axon relay with per-chunk D2H syncs; this is
            one dispatch and one transfer (VERDICT round-1 item 9).
            rays_*: [n_chunks, B, 3]; returns stacked [n_chunks, B, ...]."""
            s = self.settings_eval
            if n_samples is not None:
                import dataclasses as _dc
                s = _dc.replace(s, n_samples=n_samples)

            if use_skip:
                # occupied-box chunk skip: the eval frame is march-bound
                # (probe_eval_frame.py: march = 3.2 s of the 6 s 800^2
                # frame) and background chunks composite to exactly bg,
                # so cond-skip them against the occupied-cell AABB.
                # use_skip is decided host-side per frame (render_image):
                # on a dense grid (early training: init is fully
                # occupied) nothing skips and the cond + tile padding
                # cost a measured +15% (probe_eval_skip.py), so the
                # plain program is kept for that regime.
                from ..models.renderer import render_eval_chunk_skippable
                from ..ops.grid import occupied_aabb

                aabb_occ = occupied_aabb(grid.occ, s.bound)

                def body(_, inp):
                    ro, rd, ds = inp
                    keep = render_eval_chunk_skippable(
                        self.field, params, grid, ro, rd, s, key,
                        bg_color=bg_color, depth_scale=ds,
                        aabb_occ=aabb_occ, shading_mode=SHADING_ALBEDO,
                        ambient_ratio=1.0,
                    )
                    return _, keep
            else:
                def body(_, inp):
                    ro, rd, ds = inp
                    out = render_occupancy(
                        self.field, params, grid, ro, rd, s, key,
                        training=False, shading_mode=SHADING_ALBEDO,
                        ambient_ratio=1.0, bg_color=bg_color,
                        perturb=False, depth_scale=ds,
                    )
                    keep = {k: out[k] for k in
                            ("image", "depth", "weights_sum", "normal")}
                    return _, keep

            _, outs = jax.lax.scan(
                body, None, (rays_o, rays_d, depth_scale))
            return outs

        self._render_chunks_scan = render_chunks_scan

        from ..ops.grid import occupied_aabb as _occ_aabb

        # one tiny jitted program (eager jnp would be dozens of relay
        # round-trips through axon); bound is static
        self._occupied_aabb_jit = jax.jit(
            lambda occ: _occ_aabb(occ, self.cfg.bound))

    # ------------------------------------------------------------------
    def _prep_ref(self, ref_rgba, ref_depth, ref_mask):
        if ref_rgba is None:
            ref_rgba = np.zeros((1, 512, 512, 4), np.float32)
        if ref_depth is None:
            ref_depth = np.full((512, 512), 0.5, np.float32)
        if ref_mask is None:
            ref_mask = np.zeros((512, 512), bool)
        self.ref_rgba = jnp.asarray(np.asarray(ref_rgba).reshape(512, 512, 4))
        self.ref_depth = jnp.asarray(np.asarray(ref_depth).reshape(512, 512))
        # object mask = NOT background (reference passes ~depth_mask,
        # utils.py:556)
        self.obj_mask = jnp.asarray(
            ~np.asarray(ref_mask).reshape(512, 512), jnp.float32
        )

    # ------------------------------------------------------------------
    def train(self, max_epochs: Optional[int] = None, steps_per_epoch: int = 100,
              valid_sampler: Optional[ViewSampler] = None):
        cfg = self.cfg
        if max_epochs is None:
            max_epochs = math.ceil(cfg.iters / steps_per_epoch)
        sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w,
                              size=steps_per_epoch, seed=cfg.seed)
        start = time.time()
        profiling = False
        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            # profile the second epoch only: past compiles, one full epoch
            # of steady-state steps (cfg.profile_dir -> xprof trace)
            if cfg.profile_dir and epoch == 2 and not profiling:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            self.train_one_epoch(sampler)
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                self.ws.log(f"[INFO] profiler trace -> {cfg.profile_dir}")
            if epoch % cfg.eval_interval == 0:
                # checkpoint FIRST: a hung validation render (dead relay
                # RPC) must not cost the training state
                self.save_checkpoint()
                if valid_sampler is not None:
                    try:
                        watchdog.call_with_timeout(
                            lambda: self.evaluate(valid_sampler),
                            cfg.step_timeout_s * 2)
                        # eval-gated best slot (reference: utils.py:654-656
                        # saves best after each eval interval)
                        self.save_checkpoint(best=True)
                    except (jax.errors.JaxRuntimeError,
                            watchdog.DeviceHangError) as e:
                        # eval is observability, not training state:
                        # log and march on
                        self.ws.log(
                            f"[WARN] validation render failed "
                            f"({type(e).__name__}); continuing training."
                        )
        self.ws.log(
            f"[INFO] training takes {(time.time() - start) / 60:.4f} minutes."
        )

    def train_one_epoch(self, sampler: ViewSampler):
        cfg = self.cfg
        total_loss, n = 0.0, 0
        lr = float(self.schedule(jnp.asarray(self.global_step + 1)))
        self.ws.log(
            f"==> Start Training {self.ws.root} Epoch {self.epoch}, lr={lr:.6f} ..."
        )
        def body(i):
            # Commit discipline mirrors step(): body() runs inside a
            # watchdog daemon thread, so a zombie thread unblocking after
            # a snapshot restore must not overwrite the restored lineage
            # (grid/key/_host_snapshot writes below).
            gen = self._state_gen

            def commit_guard():
                if gen != self._state_gen:
                    raise watchdog.DeviceHangError(
                        "stale epoch body discarded (state restored "
                        "mid-flight)")

            if self.global_step % cfg.update_extra_interval == 0:
                key, k = jax.random.split(self.key)
                grid = self._update_grid(self.params, self.grid, k)
                commit_guard()
                self.key, self.grid = key, grid
            if self.global_step % cfg.snapshot_interval == 0:
                # rollback point for re-rolls. Decoupled from the grid
                # cadence: a snapshot drags ~270 MB of params+EMAs
                # through the relay (seconds), so it must be rare.
                commit_guard()
                self.take_host_snapshot(gen=gen)
            # multi-view grouping: pull up to views_per_step consecutive
            # NOVEL views into one batched step (front views and the
            # albedo warmup stay single-view; groups never span a front
            # index, so the every-4th-front cadence is preserved)
            views = [sampler.get(i)]
            if (self._mv_step is not None and not views[0].is_front
                    and self.global_step + 1 >= cfg.albedo_iters):
                j = i + 1
                while (len(views) < cfg.views_per_step
                       and j < sampler.size):
                    v = sampler.get(j)
                    if v.is_front:
                        break
                    views.append(v)
                    j += 1
            consumed = len(views)
            metrics, aux = self.step(views if consumed > 1 else views[0])
            # Host syncs are expensive through the axon relay (a
            # per-step loss.item() like the reference's utils.py:991
            # costs ~6x throughput); read scalars back only at the
            # logging cadence and let the steps in between pipeline.
            # Cadence 9 (coprime to the every-4th-front view schedule)
            # so front-step metrics (loss_img/loss_depth) surface too.
            if self.ws.primary and (self.global_step % 100 == 0
                                    or self.global_step == 1):
                save_image_u8(
                    os.path.join(self.ws.train_dir, f"{self.global_step}.png"),
                    np.asarray(aux["pred_rgb"]),
                )
                save_image_u8(
                    os.path.join(self.ws.train_dir, f"{self.global_step}_gt.png"),
                    np.asarray(aux["gt_rgb"]),
                )
            if self.global_step % 9 == 0:
                loss = float(metrics["loss"])
                self.ws.scalar("train/loss", loss, self.global_step)
                parts = " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(metrics.items())
                )
                self.ws.log(f"step {self.global_step}: {parts}")
                self._check_collapse(loss, float(metrics["ws_mean"]),
                                     is_front=views[0].is_front)
                return loss, consumed
            return None, consumed

        rolls = 0
        i = 0
        while i < sampler.size:
            try:
                # the watchdog bounds every device interaction (dispatch,
                # compile, sync): a dead relay RPC otherwise blocks the
                # process forever with no exception (docs/TPU_NOTES.md)
                loss, consumed = watchdog.call_with_timeout(
                    functools.partial(body, i), cfg.step_timeout_s)
                if loss is not None:
                    total_loss += loss
                    n += 1
                i += consumed
            except (jax.errors.JaxRuntimeError,
                    watchdog.DeviceHangError) as e:
                rolls += 1
                gs_at_fault = self.global_step
                if (rolls > cfg.max_compile_rerolls
                        or not self._recover_from_fault(e)):
                    raise
                # replay the rolled-back steps: restore rewinds
                # global_step to the snapshot, so rewind the view index
                # by the same distance (upper-bounded by views_per_step
                # per step when grouping — replaying a few extra poses
                # is harmless, the views are i.i.d. samples)
                per = max(cfg.views_per_step, 1)
                i = max(0, i - (gs_at_fault - self.global_step) * per)
        self.stats["loss"].append(total_loss / max(n, 1))
        self.ws.log(f"==> Finished Epoch {self.epoch}.")

    def _check_collapse(self, loss: float, ws_mean: float,
                        is_front: bool = False):
        """Optimization-collapse watchdog (called at the logging cadence).

        Dead states: ws_mean pinned at ~1.0 (the solid-opaque-block
        entropy attractor — nothing left to optimize, every pixel fully
        opaque; docs/TPU_NOTES.md "failure modes #2") or a non-finite
        loss. Both are diagnosable within a few logging intervals, so a
        dead run should die in minutes, not hours (results/ab_hashgrid
        burned 86 TPU-minutes this way in round 3).

        Front steps are excluded from the ws_mean signal: the front
        program composites against the reference mask, so a fully
        collapsed scene still logs front ws_mean≈0.5 (round-4
        ab_hashgrid log: novel intervals pinned at 1.0000 interleaved
        with front intervals at 0.51 every 4th log). A front reading
        therefore can neither confirm nor clear the attractor — it
        must not reset the streak. A non-finite loss counts dead on
        any step."""
        cfg = self.cfg
        if cfg.collapse_ws_threshold <= 0:
            return
        if is_front and math.isfinite(loss):
            return
        dead = (ws_mean >= cfg.collapse_ws_threshold
                or not math.isfinite(loss))
        if not dead:
            self._collapse_streak = 0
            return
        self._collapse_streak += 1
        s = self._collapse_streak
        if (cfg.collapse_warn_intervals > 0
                and s >= cfg.collapse_warn_intervals
                and s % cfg.collapse_warn_intervals == 0):
            self.ws.log(
                f"[WARN] optimization looks collapsed at step "
                f"{self.global_step}: ws_mean={ws_mean:.4f} "
                f"loss={loss:.4f} for {s} consecutive logging intervals "
                f"(threshold {cfg.collapse_ws_threshold}; tune "
                f"collapse_ws_threshold/collapse_abort_intervals)")
        if (cfg.collapse_abort_intervals > 0
                and s >= cfg.collapse_abort_intervals):
            raise OptimizationCollapseError(
                f"training dead for {s} consecutive logging intervals "
                f"(ws_mean={ws_mean:.4f}, loss={loss:.4f}) — aborting; "
                f"set collapse_abort_intervals=0 to disable")

    # ------------------------------------------------------------------
    # elastic recovery (no reference equivalent; SURVEY.md §5.3 records
    # the reference has none). The axon v5e backend loses some compiles
    # to a per-executable codegen fault that kills the TPU worker at
    # runtime (docs/TPU_NOTES.md). Recovery: snapshot train state to host
    # regularly; on a worker crash, wait for the relay to respawn,
    # restore the snapshot, rebuild the step with a fresh compile salt
    # (new executable), and replay.

    def take_host_snapshot(self, gen: Optional[int] = None):
        """Copy train state to host as the re-roll rollback point.

        `gen` (when called from a watchdog-threaded path) is the state
        generation captured at the caller's entry: the D2H copies below
        can block for seconds on a dead relay, and a zombie thread that
        unblocks after a restore must not replace _host_snapshot with its
        stale pre-restore lineage — the next fault would then roll back
        to the wrong state."""
        snap = {
            "params": jax.tree.map(np.asarray, self.params),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "grid": jax.tree.map(np.asarray, self.grid),
            "global_step": self.global_step,
            "key": np.asarray(self.key),
            "ema_params": (
                jax.tree.map(np.asarray, self.ema_params)
                if self.ema_params is not None else None
            ),
        }
        if gen is not None and gen != self._state_gen:
            raise watchdog.DeviceHangError(
                "stale snapshot discarded (state restored mid-flight)")
        self._host_snapshot = snap

    def _recover_from_fault(self, err: Exception, _retries: int = 0) -> bool:
        cfg = self.cfg
        if self._host_snapshot is None:
            return False
        self._compile_salt += 1
        self.ws.log(
            f"[WARN] TPU worker fault at step {self.global_step} "
            f"({type(err).__name__}); re-roll #{self._compile_salt}: "
            f"waiting {cfg.reroll_wait_s:.0f}s, restoring snapshot at "
            f"step {self._host_snapshot['global_step']}, recompiling."
        )
        time.sleep(cfg.reroll_wait_s)
        snap = self._host_snapshot

        self._state_gen += 1  # invalidate any in-flight zombie step

        def restore():
            self.params = jax.tree.map(jnp.asarray, snap["params"])
            self.opt_state = jax.tree.map(jnp.asarray, snap["opt_state"])
            self.global_step = snap["global_step"]
            self.key = jnp.asarray(snap["key"])
            if snap.get("ema_params") is not None:
                self.ema_params = jax.tree.map(
                    jnp.asarray, snap["ema_params"])
            # the pre-crash grid is dead device memory; restore from host
            self.grid = jax.tree.map(jnp.asarray, snap["grid"])
            self._build_jits()
            jax.block_until_ready(self.grid.occ)

        try:
            watchdog.call_with_timeout(restore, cfg.step_timeout_s)
        except (jax.errors.JaxRuntimeError, watchdog.DeviceHangError):
            # Worker still down; wait and retry. The budget is
            # per-fault-episode (_retries), NOT the lifetime-cumulative
            # compile salt — the salt is solely the executable-uniqueness
            # nonce, and bounding on it would permanently disable
            # recovery after enough sparse faults over a long run.
            time.sleep(cfg.reroll_wait_s)
            return self._recover_from_fault(err, _retries + 1) \
                if _retries < cfg.max_compile_rerolls else False
        return True

    def step(self, view) -> tuple:
        """One optimization step from a sampled ViewBatch — or, with
        cfg.views_per_step > 1, a LIST of novel ViewBatches trained
        through the vmapped multi-view program (make_multiview_step).
        Worker-fault recovery wraps the epoch loop (train_one_epoch),
        which is where device scalars are read back.

        Commit discipline: a watchdog-abandoned zombie thread may still be
        executing an older step() when recovery restores a snapshot. All
        writes to shared trainer state happen at the END of this method,
        gated on the state generation (`self._state_gen`) being unchanged
        since entry — a stale thread's results are discarded instead of
        overwriting the restored lineage."""
        cfg = self.cfg
        gen = self._state_gen
        gs = self.global_step + 1

        views = view if isinstance(view, (list, tuple)) else [view]
        if len(views) == 1:
            view = views[0]
            grouped = False
        else:
            assert self._mv_step is not None and not views[0].is_front
            grouped = True

        # shading schedule (reference: utils.py:470-483); drawn once per
        # step — a grouped step shares one shading mode across its views
        if gs < cfg.albedo_iters or (not grouped and view.is_front):
            shading, ambient = SHADING_ALBEDO, 1.0
        else:
            r = self._host_rng.random()
            if r > 0.5:
                shading, ambient = SHADING_ALBEDO, 1.0
            elif r > 0.4:
                shading, ambient = SHADING_TEXTURELESS, 0.1
            else:
                shading, ambient = SHADING_LAMBERTIAN, 0.1

        diff_phase = 1.0 if gs >= cfg.diff_iters else 0.0

        def stack(fn):
            return jnp.asarray(np.stack([fn(v) for v in views]))

        if grouped:
            batch = {
                "rays_o": stack(lambda v: v.rays_o.reshape(-1, 3)),
                "rays_d": stack(lambda v: v.rays_d.reshape(-1, 3)),
                "depth_scale": stack(lambda v: v.depth_scale.reshape(-1)),
                "is_large": jnp.asarray(
                    [1.0 if v.is_large else 0.0 for v in views]),
            }
        else:
            batch = {
                "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
                "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
                "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
                "is_large": jnp.asarray(1.0 if view.is_large else 0.0),
            }
        batch.update({
            "ref_rgba": self.ref_rgba,
            "ref_depth": self.ref_depth,
            "obj_mask": self.obj_mask,
            "diff_phase": jnp.asarray(diff_phase),
            "shading_mode": jnp.asarray(shading, jnp.int32),
            "ambient_ratio": jnp.asarray(ambient, jnp.float32),
        })
        if self.guidance is not None and self.text_z is not None:
            if grouped:
                idxs = [1 if v.is_large else 0 for v in views]
                batch["text_z"] = jnp.stack(
                    [self.text_z[i] for i in idxs])
                batch["text_z_clip"] = jnp.stack(
                    [self._clip_text_cache[i] for i in idxs])
            else:
                text_idx = 1 if view.is_large else 0
                batch["text_z"] = self.text_z[text_idx]
                batch["text_z_clip"] = self._clip_text_cache[text_idx]
            batch["gparams"] = self.guidance.params

        use_sds = (
            (grouped or not view.is_front)
            and self.guidance is not None
            and gs >= cfg.diff_iters
        )
        key, k = jax.random.split(self.key)
        if grouped:
            params, opt_state, metrics, aux = self._mv_step[
                (shading != SHADING_ALBEDO, use_sds)
            ](self.params, self.opt_state, self.grid, k, batch)
            # per-view aux images; keep view 0 for the debug dumps
            aux = jax.tree.map(lambda a: a[0], aux)
        else:
            params, opt_state, metrics, aux = self._train_step[
                (view.is_front, shading != SHADING_ALBEDO, use_sds)
            ](self.params, self.opt_state, self.grid, k, batch)
        ema = (
            self._ema_update(self.ema_params, params)
            if self.ema_params is not None else None
        )
        # Surface worker faults inside the re-roll guard at the grid
        # cadence — blocking every step through the axon relay costs ~6x
        # throughput (the reference syncs per step via loss.item(),
        # utils.py:991; we deliberately do not).
        if gs % cfg.update_extra_interval == 0:
            jax.block_until_ready(metrics["loss"])
        if gen != self._state_gen:
            raise watchdog.DeviceHangError(
                "stale step discarded (state restored mid-flight)")
        self.key = key
        self.params, self.opt_state = params, opt_state
        if ema is not None:
            self.ema_params = ema
        self.global_step = gs
        return metrics, aux

    # ------------------------------------------------------------------
    def _eval_occ_filtered(self):
        """Dust-filtered occupancy for eval renders, cached per grid
        generation (the filter is a host scipy pass over the fetched
        2 MB bitfield; render_image is called 33+ times per eval orbit
        against the same grid)."""
        occ = self.grid.occ
        frac = float(getattr(self.cfg, "eval_dust_frac", 0.0))
        ref_hit = bool(getattr(self.cfg, "eval_ref_hit", False))
        if frac <= 0.0 and not ref_hit:
            return occ
        cache = getattr(self, "_eval_occ_cache", None)
        if cache is not None and cache[0] is occ:
            return cache[1]
        from ..ops.grid import dust_filter_occ, ref_hit_filter_occ

        filtered, dropped = dust_filter_occ(np.asarray(occ), frac)
        if ref_hit:
            # First-hit visibility from the supervised front view: the
            # single-image task defines the object as what the reference
            # camera sees (ref_hit_filter_occ docstring; fix_poses front
            # branch = the exact pose of every supervised train step).
            from ..cameras import fix_poses, get_rays, intrinsics_from_fov

            _, _, poses, _, _ = fix_poses(
                1, 0, np.random.default_rng(0),
                radius_range=self.cfg.radius_range,
                theta_range=self.cfg.theta_range,
                phi_range=self.cfg.phi_range,
            )
            rb = get_rays(poses, intrinsics_from_fov(self.cfg.fov, 64, 64),
                          64, 64)
            filtered, rh_dropped = ref_hit_filter_occ(
                filtered, np.asarray(rb["rays_o"][0]),
                np.asarray(rb["rays_d"][0]), self.cfg.bound)
            dropped += rh_dropped
        filtered_dev = jnp.asarray(filtered)
        self._eval_occ_cache = (occ, filtered_dev)
        self._eval_dust_dropped = dropped  # observability / tests
        return filtered_dev

    def render_image(self, view, bg_color=1.0, n_samples=None):
        """Staged full-image render (reference: renderer.py:655-668).

        One jitted program (lax.scan over ray chunks) + one D2H
        transfer, instead of one dispatch + sync per chunk — an 800x800
        frame was 157 sequential relay round-trips (VERDICT item 9)."""
        cfg = self.cfg
        H, W = view.H, view.W
        B = cfg.max_ray_batch
        from .eval_frame import pack_scanlines, plan_tiles

        # Square-tile chunking: with the occupied-AABB chunk skip live,
        # scanline bands only skip when the object misses whole ROWS;
        # sqrt(B)-sided pixel tiles also skip background COLUMNS (an
        # object-centric 800^2 frame is mostly skippable tiles).
        plan = (plan_tiles(H, W, B)
                if (getattr(cfg, "eval_tile", True)
                    and getattr(cfg, "eval_aabb_skip", True)) else None)
        # Eval renders ALWAYS march the dust-filtered occupancy
        # (independent of which program renders the frame): orbit
        # frames must be consistent — floaters culled everywhere or
        # nowhere, never per-tile — and the refine stage's point cloud
        # is fused from these very renders (dust_filter_occ docstring:
        # the exporter's keep-rule, eval-only; training never filters).
        occ_f = self._eval_occ_filtered()
        grid_eval = (self.grid if occ_f is self.grid.occ
                     else self.grid._replace(occ=occ_f))
        tiled = False
        if plan is not None:
            # Host-side per-frame decision: the skip program only pays
            # when tiles actually skip. Fetch the occupied AABB ([6]
            # floats) of the filtered occupancy (a single stray cell
            # pins the box at the full bound) and count skippable tiles
            # with the numpy mirror of the device slab test; below 10%
            # skippable, the plain scanline program is faster (the cond
            # + tile padding cost +15% on a dense grid,
            # probe_eval_skip.py — early training starts fully
            # occupied; and the reference's radius-1.0 fov-20 test
            # cameras give close-up frames where nothing skips,
            # TPU_NOTES round 5).
            box = np.asarray(self._occupied_aabb_jit(occ_f))
            frac = plan.skippable_frac(box, view.rays_o, view.rays_d,
                                       cfg.min_near)
            tiled = frac >= 0.1
        self._last_eval_used_skip = tiled  # observability / tests
        if tiled:
            n_chunks = plan.n_chunks
            ro = plan.tile_up(view.rays_o, 3)
            rd = plan.tile_up(view.rays_d, 3)
            ds = plan.tile_up(view.depth_scale, 1)[..., 0]
        else:
            n_chunks = -(-H * W // B)
            ro = pack_scanlines(view.rays_o, 3, H, W, B)
            rd = pack_scanlines(view.rays_d, 3, H, W, B, pad_value=1.0)
            ds = pack_scanlines(view.depth_scale, 1, H, W, B)[..., 0]
        # gen-guarded key advance: render_image runs under the watchdog
        # from evaluate()/test(); a zombie thread must not overwrite the
        # key restored by _recover_from_fault (same discipline as step()).
        gen = self._state_gen
        key, k = jax.random.split(self.key)
        if gen != self._state_gen:
            raise watchdog.DeviceHangError(
                "stale render discarded (state restored mid-flight)")
        self.key = key
        bg = jnp.asarray(np.broadcast_to(bg_color, (3,)), jnp.float32)
        outs = self._render_chunks_scan(
            self.params, grid_eval, jnp.asarray(ro), jnp.asarray(rd),
            k, bg, jnp.asarray(ds), n_chunks=n_chunks,
            n_samples=n_samples, use_skip=tiled,
        )
        if tiled:
            res = {k2: plan.untile(v) for k2, v in outs.items()}
            res["depth"] = res["depth"].reshape(H, W)
            res["weights_sum"] = res["weights_sum"].reshape(H, W)
            return res
        res = {k2: np.asarray(v).reshape(n_chunks * B, *v.shape[2:])[: H * W]
               for k2, v in outs.items()}
        res["image"] = res["image"].reshape(H, W, 3)
        res["depth"] = res["depth"].reshape(H, W)
        res["weights_sum"] = res["weights_sum"].reshape(H, W)
        if "normal" in res:
            res["normal"] = res["normal"].reshape(H, W, 3)
        return res

    class _EmaScope:
        """store() / copy_to() / restore() around eval and test renders
        (reference: utils.py:1043-1071)."""

        def __init__(self, trainer):
            self.trainer = trainer
            self.saved = None

        def __enter__(self):
            if self.trainer.ema_params is not None:
                self.saved = self.trainer.params
                self.trainer.params = self.trainer.ema_params
            return self

        def __exit__(self, *exc):
            if self.saved is not None:
                self.trainer.params = self.saved
            return False

    def evaluate(self, sampler: ViewSampler, name: Optional[str] = None):
        """Validation orbit renders (reference: utils.py:1030-1073).

        Renders with EMA weights when enabled, and records an eval result
        (mean foreground coverage as the ranking scalar — the reference
        appends to stats["results"] to unlock best-checkpoint saving,
        utils.py:1106-1122, while ranking nothing: "loss cannot reflect
        performance")."""
        if self.ws.primary:
            os.makedirs(self.ws.valid_dir, exist_ok=True)
        name = name or f"{self.name}_ep{self.epoch:04d}"
        coverage = []
        with self._EmaScope(self):
            for i in range(sampler.size):
                view = sampler.get(i)
                res = self.render_image(view)
                # every host computes the coverage ranking scalar (it
                # gates best-checkpoint saving and must stay in lockstep
                # across hosts); only the primary writes the renders
                coverage.append(float(np.mean(res["weights_sum"])))
                if not self.ws.primary:
                    continue
                save_image_u8(
                    os.path.join(self.ws.valid_dir, f"{name}_{i + 1:04d}_rgb.png"),
                    res["image"],
                )
                save_image_u8(
                    os.path.join(self.ws.valid_dir, f"{name}_{i + 1:04d}_depth.png"),
                    res["depth"] / max(res["depth"].max(), 1e-6),
                )
        # ranking scalar = mean over ALL orbit views, not whatever view
        # the loop ended on (round-2 verdict weak #6)
        self.stats["results"].append(
            float(np.mean(coverage)) if coverage else 0.0)
        self.ws.log(f"++> Evaluate epoch {self.epoch} Finished.")

    def test(self, sampler: ViewSampler, save_path: Optional[str] = None,
             name: Optional[str] = None, write_image: bool = True,
             write_video_out: bool = True):
        """Orbit test renders + mp4 + poses (reference: utils.py:671-744).

        Non-primary hosts skip entirely: test() is pure side effect
        (files), so in a multi-host run only host 0 renders the orbit —
        there is no cross-host state to keep in lockstep here."""
        if not self.ws.primary:
            return
        save_path = save_path or self.ws.result_dir
        os.makedirs(save_path, exist_ok=True)
        name = name or f"{self.name}_ep{self.epoch:04d}"
        all_rgb, all_normal, all_poses = [], [], []
        ema_scope = self._EmaScope(self)
        ema_scope.__enter__()
        for i in range(sampler.size):
            view = sampler.get(i)
            try:
                # deadline-bound like the train loop: a dead relay RPC
                # otherwise hangs the orbit forever; partial orbits
                # still produce their videos below
                res = watchdog.call_with_timeout(
                    functools.partial(self.render_image, view,
                                      bg_color=1.0),
                    self.cfg.step_timeout_s)
            except (jax.errors.JaxRuntimeError,
                    watchdog.DeviceHangError) as e:
                self.ws.log(
                    f"[WARN] test render died at view {i}/{sampler.size} "
                    f"({type(e).__name__}); writing partial orbit.")
                break
            rgb = (np.clip(res["image"], 0, 1) * 255).astype(np.uint8)
            mask = ((res["weights_sum"] > 0.9) * 255).astype(np.uint8)
            normal = (np.clip(res.get("normal", res["image"]), 0, 1) * 255).astype(np.uint8)
            all_rgb.append(rgb)
            all_normal.append(normal)
            all_poses.append(view.poses[0])
            if write_image:
                import cv2

                cv2.imwrite(os.path.join(save_path, f"{name}_{i:04d}_rgb.png"),
                            cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
                cv2.imwrite(os.path.join(save_path, f"{name}_{i:04d}_normal.png"),
                            cv2.cvtColor(normal, cv2.COLOR_RGB2BGR))
                save_depth_u16(os.path.join(save_path, f"{name}_{i:04d}_depth.png"),
                               res["depth"])
                cv2.imwrite(os.path.join(save_path, f"{name}_{i:04d}_mask.png"), mask)
        ema_scope.__exit__()
        if all_rgb:
            if write_video_out:
                write_video(os.path.join(save_path, f"{name}_rgb.mp4"),
                            all_rgb)
                write_video(os.path.join(save_path, f"{name}_normal.mp4"),
                            all_normal)
            np.save(os.path.join(save_path, f"{name}_poses.npy"),
                    np.stack(all_poses, axis=0))
        self.ws.log("==> Finished Test.")

    # ------------------------------------------------------------------
    def save_mesh(self, save_path: Optional[str] = None,
                  resolution: int = 256):
        """Textured OBJ export (reference: utils.py:626-637 +
        renderer.py:156-330). Pure side effect — host 0 only
        (docs/MULTIHOST.md)."""
        if not self.ws.primary:
            return
        from ..utils.mesh_export import export_textured_mesh

        save_path = save_path or os.path.join(self.ws.root, "mesh")
        self.ws.log(f"==> Saving mesh to {save_path}")
        chunk = 1 << 17

        @jax.jit
        def density_j(params, x):
            d = self.field.apply(params, x, method="density")
            return d["sigma"], d["albedo"]

        def density_fn(pts):
            out = np.zeros(len(pts), np.float32)
            for h in range(0, len(pts), chunk):
                t = min(h + chunk, len(pts))
                x = jnp.asarray(pts[h:t])
                s, _ = density_j(self.params, x)
                out[h:t] = np.asarray(s)
            return out

        def albedo_fn(pts):
            out = np.zeros((len(pts), 3), np.float32)
            for h in range(0, len(pts), chunk):
                t = min(h + chunk, len(pts))
                _, a = density_j(self.params, jnp.asarray(pts[h:t]))
                out[h:t] = np.asarray(a)
            return out

        thresh = min(float(self.grid.mean_density), self.cfg.density_thresh)
        export_textured_mesh(
            density_fn, albedo_fn, save_path, resolution=resolution,
            threshold=thresh, bound=self.cfg.bound,
        )
        self.ws.log("==> Finished saving mesh.")

    # ------------------------------------------------------------------
    def _ckpt_state(self):
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "grid": self.grid,
            "epoch": self.epoch,
            "global_step": self.global_step,
        }
        if self.ema_params is not None:
            # reference: utils.py:1094-1095 (EMA state in full checkpoints)
            state["ema_params"] = self.ema_params
        return state

    def save_checkpoint(self, name: Optional[str] = None,
                        best: bool = False):
        """best=True writes the eval-gated best slot with EMA weights
        swapped in (reference: utils.py:1106-1122 — "always save best
        since loss cannot reflect performance", but only after at least
        one eval has recorded a result). The best file sits outside the
        rotation window.

        Multi-host: only host 0 writes (params are replicated across
        hosts — jax.device_get of a fully-addressable replicated array
        is identical everywhere, so one writer loses nothing;
        docs/MULTIHOST.md)."""
        if not self.ws.primary:
            return
        if best:
            if not self.stats["results"]:
                self.ws.log(
                    "[WARN] no evaluated results found, "
                    "skip saving best checkpoint.")
                return
            with self._EmaScope(self):
                state = self._ckpt_state()
            path = os.path.join(self.ws.ckpt_dir, f"{self.name}_best.ckpt")
            from flax import serialization

            with open(path, "wb") as f:
                f.write(serialization.to_bytes(state))
            self.ws.log(f"[INFO] saved best checkpoint {path}")
            return
        name = name or f"{self.name}_ep{self.epoch:04d}"
        path = save_checkpoint(self.ws.ckpt_dir, name, self._ckpt_state())
        self.ws.log(f"[INFO] saved checkpoint {path}")

    def load_checkpoint(self, path: str):
        """Tolerant per-part load (reference: utils.py:1124-1186 wraps
        optimizer/scheduler/scaler restores in try/except): an optimizer
        state whose structure changed across versions must not brick the
        model weights."""
        try:
            state = load_checkpoint(path, self._ckpt_state())
            self.opt_state = state["opt_state"]
        except Exception:
            from flax import serialization

            with open(path, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            tmpl = self._ckpt_state()
            state = {
                "params": serialization.from_state_dict(
                    tmpl["params"], raw["params"]),
                "grid": serialization.from_state_dict(
                    tmpl["grid"], raw["grid"]),
                "epoch": raw["epoch"],
                "global_step": raw["global_step"],
            }
            if "ema_params" in raw and self.ema_params is not None:
                state["ema_params"] = serialization.from_state_dict(
                    tmpl["params"], raw["ema_params"])
            try:
                self.opt_state = serialization.from_state_dict(
                    tmpl["opt_state"], raw["opt_state"])
            except Exception:
                self.ws.log(
                    "[WARN] checkpoint optimizer state incompatible; "
                    "optimizer reinitialized (model weights loaded)."
                )
                self.opt_state = self.optimizer.init(state["params"])
        self.params = state["params"]
        self.grid = DensityGrid(*state["grid"])
        self.epoch = int(state["epoch"])
        self.global_step = int(state["global_step"])
        if self.ema_params is not None:
            # resume EMA lineage when present; otherwise restart the EMA
            # from the loaded weights (reference: utils.py:1160-1165)
            loaded = state.get("ema_params") if isinstance(state, dict) else None
            self.ema_params = (
                loaded if loaded is not None
                else jax.tree.map(jnp.array, self.params)
            )
        self.ws.log(
            f"[INFO] load at epoch {self.epoch}, global step {self.global_step}"
        )

    def set_reference(self, ref_rgba, ref_depth, ref_mask):
        self._prep_ref(ref_rgba, ref_depth, ref_mask)
