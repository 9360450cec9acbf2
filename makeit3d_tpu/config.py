"""Flat configuration for the Make-It-3D TPU pipeline.

Mirrors the reference CLI surface (reference: main.py:18-94) as a typed
dataclass instead of an argparse namespace, plus TPU-specific knobs that
replace the CUDA ray-marching buffer heuristics (reference:
nerf/renderer.py:129-132, raymarching/raymarching.py:210-215) with static
compile-time budgets.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # ---- prompt / app mode (reference main.py:19-34) ----
    text: Optional[str] = None
    negative: str = ""
    test: bool = False
    final: bool = False
    refine: bool = False
    save_mesh: bool = False
    eval_interval: int = 10
    workspace: str = "workspace"
    guidance: str = "stable-diffusion"  # stable-diffusion | clip | none
    seed: int = 0
    guidance_scale: float = 10.0
    need_back: bool = False
    suppress_face: bool = False
    ref_path: Optional[str] = None

    # ---- training (reference main.py:37-51) ----
    iters: int = 10000
    refine_iters: int = 3000
    lr: float = 1e-3
    min_lr: float = 1e-4
    warm_iters: int = 500
    ckpt: str = "latest"
    max_steps: int = 512          # occupancy lattice length K per ray
    num_steps: int = 64           # uniform samples (pure path)
    upsample_steps: int = 32      # importance samples (pure path)
    update_extra_interval: int = 16
    max_ray_batch: int = 4096
    albedo_iters: int = 1000
    uniform_sphere_rate: float = 0.5
    diff_iters: int = 400
    # model EMA decay; None disables (reference: nerf/utils.py:209,304-307
    # — opt-in torch_ema mirror applied at eval/test and stored in
    # checkpoints)
    ema_decay: Optional[float] = None
    step_range: Tuple[float, float] = (0.2, 0.6)

    # ---- model (reference main.py:54-66) ----
    bg_radius: float = -1.0
    density_thresh: float = 10.0
    blob_density: float = 5.0
    blob_radius: float = 0.1
    fp16: bool = False            # on TPU this selects bfloat16 compute
    backbone: str = "hashgrid"    # hashgrid (tcnn equivalent) | vanilla | fourier
    # fourier backbone (TPU flagship): an MXU-aligned frequency-encoded
    # MLP. Rationale (docs/TPU_NOTES.md "scatter ceiling"): XLA:TPU
    # scatter-add tops out at ~20M rows/s, capping ANY grid/hash-style
    # encoder's backward at minutes per 128x128 shaded step, while the
    # MXU runs matmul backward at ~150 TFLOP/s. The flagship field is
    # therefore matmul-only: sin/cos bands -> wide MLP, analytic
    # normals computed inside the forward program.
    mlp_hidden: int = 256
    mlp_layers: int = 6
    mlp_multires: int = 10
    # "relu": plain-ReLU chain via the fused Pallas kernel (forward +
    # analytic normal + hand-derived double backward, all MXU-resident;
    # ops/pallas/fused_mlp.py). "resmlp": LayerNorm/SiLU ResMLP under
    # XLA autodiff (round-2 pre-fused flagship, kept for comparison).
    mlp_arch: str = "relu"
    # Novel views per optimizer step (>1 batches the render + frozen
    # UNet/CLIP towers over a leading view axis — bigger MXU matmuls —
    # and the gradient is the per-view mean; reference renders exactly
    # 1 view/step, provider.py:316). Front/reference views always train
    # single-view. Requires an MLP backbone on TPU (the hash encode
    # split is not vmap-safe).
    views_per_step: int = 1
    optim: str = "adan"           # adan | adam | adamw
    sd_version: str = "2.0"
    hf_key: Optional[str] = None
    w: int = 128                  # train render width
    h: int = 128                  # train render height

    # ---- scene / dataset (reference main.py:69-92) ----
    bound: float = 1.0
    dt_gamma: float = 0.0
    min_near: float = 0.1
    radius_range: Tuple[float, float] = (1.0, 1.5)
    fov: float = 20.0
    fovy_range: Tuple[float, float] = (15.0, 25.0)
    theta_range: Tuple[float, float] = (70.0, 110.0)
    phi_range: Tuple[float, float] = (0.0, 360.0)

    # Binary-entropy weight (reference main.py:79 default 1.0). None =
    # resolve in __post_init__: 1.0 under real guidance, 1e-3 under
    # guidance="none". The entropy loss has attractors at ws=0 AND ws=1;
    # with no guidance there is no novel-view data term to oppose the
    # ws=1 attractor and the scene collapses to a solid opaque block
    # (docs/TPU_NOTES.md "failure modes #2"; burned results/ab_hashgrid
    # in round 3 when the guard lived only in the CLI). An explicit
    # value always wins. NOTE: resolution happens at construction — a
    # later .replace(guidance="none") keeps the already-resolved float;
    # pass guidance at Config() time.
    lambda_entropy: Optional[float] = None
    lambda_opacity: float = 1e-3
    # Density-saturation cap: mean over marched samples of
    # relu(log(sigma) - sigma_cap_log). Once sigma saturates
    # (trunc_exp clamps at e^15), the alpha gradient dt*exp(-sigma*dt)
    # has vanished and NO ray-space loss (opacity/entropy/photometric/
    # SDS) can ever pull that region back down — observed round 5 as
    # e^15 junk blobs filling the teddy_fourier_r4 occupancy (916
    # components, box pinned at the full bound, side-view renders full
    # of junk). Through the exp parametrization this term's gradient
    # w.r.t. the raw logit is a CONSTANT above the cap, so saturated
    # junk decays linearly instead of never. e^9 ~ 8100 is far above
    # full opacity at any marched dt (sigma*dt > 80), so legitimate
    # surfaces are untouched. None resolves like lambda_entropy: on
    # (0.1) for guidance-free runs (where novel views have no data term
    # and junk provably persists), off otherwise (guided runs keep the
    # reference's exact loss stack; enable explicitly if needed).
    lambda_sigma_cap: Optional[float] = None
    sigma_cap_log: float = 9.0
    lambda_orient: float = 1e-2
    lambda_smooth: float = 1.0
    # fraction of marched samples given the perturbed-normal eval for
    # the smooth loss (1.0 = reference behavior, every sample,
    # renderer.py:521-524; <1 = unbiased per-step subsample — the
    # perturbed chain is a full second normal backward). Default 0.25,
    # measured round 4 on v5e: shaded step 419.8 -> 311.7 ms (projected
    # mixed headline +20%) with no quality regression in the paired
    # 400-iter A/B (fourier_ss25 20.04 dB / 0.836 SSIM vs baseline
    # 14.37 / 0.710; BASELINE.md quality table). Set 1.0 for the
    # reference's exact every-sample behavior.
    smooth_subset: float = 0.25
    # Deferred shading (TPU-native variant, ON by default since round
    # 5): shade at the per-ray expected surface point instead of
    # per-sample. The reference shades every marched sample
    # (network_tcnn.py:156-168) and takes orient/smooth losses per
    # sample (nerf/renderer.py:513-524); with analytic-normal backbones
    # that is a second-order double-backward over all N*S samples — the
    # dominant cost of the shaded program on TPU (docs/TPU_NOTES.md
    # round-4 close-out). Deferred mode composites albedo first, then
    # evaluates the normal chain only at the N composited surface
    # expectations (~100x fewer rows) and shades / regularizes at the
    # ray level. Default flipped on round-5 evidence: shaded step 311->
    # 142 ms on the v5e (projected mixed headline 4.88 -> 7.05 it/s)
    # with front-PSNR/SSIM equal to per-sample shading within the
    # seeded A/B's noise floor (TPU_NOTES round 5; BASELINE.md). Set
    # False (--per_sample_shading) for the reference's exact per-sample
    # semantics. No effect on the encode-split (hash) path, which keeps
    # per-sample shading either way.
    deferred_shading: bool = True
    lambda_img: float = 1e3
    lambda_depth: float = 1.0
    lambda_clip: float = 1.0

    W: int = 800                  # full-res render width (eval/test/refine)
    H: int = 800
    radius: float = 3.0
    light_theta: float = 60.0
    light_phi: float = 0.0
    max_spp: int = 1
    max_depth: float = 10.0

    # ---- TPU-native knobs (new; no reference equivalent) ----
    # Static per-ray sample budget after occupancy compaction. Replaces the
    # reference's dynamic mean_count buffer sizing (renderer.py:633-637) with
    # a compile-time constant so one XLA program serves every step.
    train_samples_per_ray: int = 96
    eval_samples_per_ray: int = 192
    # Eval-frame chunk skipping against the occupied-cell AABB: chunks
    # whose rays all miss the box composite to exactly bg and skip the
    # march + field via lax.cond (semantics-preserving; the eval frame
    # is march-bound, scripts/probe_eval_frame.py). eval_tile reorders
    # the frame's rays into square pixel tiles (side = sqrt of
    # max_ray_batch) instead of scanline bands so the skip predicate
    # fires on background columns too; output is reassembled exactly.
    eval_aabb_skip: bool = True
    eval_tile: bool = True
    # Eval-time floater-dust filter: occupancy components smaller than
    # this fraction of the largest (world volume, per dust_filter_occ)
    # are dropped from the EVAL march + occupied box. Same keep-rule and
    # default as the mesh exporter's floater filter; without it a single
    # stray occupied cell pins the occupied AABB at the full bound and
    # the tile skip never fires (round-4 verdict weak #7). 0 disables.
    # Training always marches the unfiltered grid.
    eval_dust_frac: float = 0.005
    # Eval-time reference-view first-hit filter (opt-in, demo assets):
    # keep only occupancy components first-hit by a ray bundle from the
    # supervised front view (ops/grid.ref_hit_filter_occ). Guidance-free
    # assets grow junk whose density AND size match the object's, so the
    # relative-size dust rule cannot separate them (TPU_NOTES round 5);
    # first-hit visibility from the one supervised camera can. Applied
    # after the dust filter; training is never filtered.
    eval_ref_hit: bool = False
    # TRAINING marching mode: "boxed" (default since round 5) =
    # gather-free uniform sampling inside the per-ray occupied-AABB
    # segment; "occupancy" = the reference's run_cuda semantics
    # (compacted lattice, per-sample grid lookups). The occupancy
    # probes are the coarse step's largest cost at the XLA gather
    # ceiling (~125M rows/s, a platform bound — docs/TPU_NOTES.md);
    # boxed removes every one of them: measured 142 -> 80 ms on ALL
    # three schedule programs (probe_march_mode.py, projected mixed
    # 7.0 -> 12.5 it/s) with front quality equal within the seeded
    # A/B's noise floor (boxed 18.65 +- 1.25 dB / 0.802 SSIM vs
    # per-occupancy 18.96 +- 0.86 / 0.793; results/log_ab_boxed_r5.txt).
    # EVAL/test renders always keep occupancy marching (reference-exact
    # sample placement, the fidelity-harness anchor) regardless of this
    # knob — see RenderSettings.from_config. Set "occupancy" to train
    # with the reference's compacted-lattice semantics.
    march_mode: str = "boxed"
    # Opt-in: let EVAL/test renders use the boxed march too. Off by
    # default — eval sample placement is the fidelity-harness anchor
    # and the reference-parity surface; turn on for demo orbits where
    # frame latency matters more (the 800² eval frame is ~half march
    # gathers, TPU_NOTES). scripts/fidelity.py prices the oracle
    # agreement of the boxed eval before trusting it.
    eval_march_boxed: bool = False
    # occupancy grid resolution (reference: renderer.py:106 grid_size=128)
    grid_size: int = 128
    # hash encoding (reference: nerf/network_tcnn.py:54-65)
    hash_levels: int = 16
    hash_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    desired_resolution: int = 2048
    # rendering compute dtype: float32 | bfloat16
    compute_dtype: str = "float32"
    # Elastic recovery from TPU worker crashes (the axon v5e relay has a
    # data/codegen-dependent kernel-fault lottery, docs/TPU_NOTES.md):
    # catch the runtime fault, restore the last host snapshot, rebuild
    # the step with a fresh compile salt (new executable), and replay.
    # Ten rolls ~ rides out a multi-minute relay outage at 45s+1 step
    # timeout each; a healthy stack never uses them.
    max_compile_rerolls: int = 10
    reroll_wait_s: float = 45.0
    # watchdog deadline for one train-loop iteration (covers dispatch,
    # remote compile, and the cadence sync; a dead relay RPC otherwise
    # blocks forever with no exception). Generous: first compiles through
    # the remote-compile relay have been observed taking minutes.
    step_timeout_s: float = 600.0
    # elastic-recovery snapshot cadence, in steps. A snapshot pulls
    # params + optimizer EMAs (~270 MB for the default field) to host,
    # which costs seconds through the axon relay — every-16-steps
    # (the grid cadence) measured ~0.2 it/s vs ~50+ it/s without.
    # Recovery replays at most this many steps.
    snapshot_interval: int = 500
    # Run the occupancy march as its own jitted program and materialize
    # the sample lattice through HBM before the differentiated program.
    # None = off (measured: does NOT avoid the v5e fault lottery, see
    # docs/TPU_NOTES.md 2026-08-16 follow-up; kept as an experiment knob).
    split_march: Optional[bool] = None
    # Evaluate FD normal probes as 7 separate field calls instead of one
    # [7N] batch (see HashGridField.split_probes). Dodges the axon-v5e
    # fused probes+scatter backward fault (round-2 ablation matrix).
    split_probes: bool = False
    # Run shaded (FD-probe) train steps as two XLA programs: a
    # froztab-shaped grad program (encode forward + probe backward, no
    # table scatter) and a scatter+update program (explicit table
    # gradient via HashGridEncoder.grad_table). The program boundary
    # keeps the two halves of the v5e-toxic fusion (batched-probe
    # backward + hash scatter-add) in separate executables
    # (training/split_step.py). None = auto: on for hash backbones on
    # TPU, off elsewhere.
    split_encode: Optional[bool] = None
    # Rows per table-gradient scatter invocation in the encode split.
    # One 22M-row scatter program crashes the v5e worker; the same
    # formulation at <=1.5M rows survives (scripts/probe_scatter.py), so
    # the scatter runs as K pipelined invocations of one executable.
    # 0 = default (2^20).
    scatter_slice_rows: int = 0
    # Table-gradient scatter formulation inside the encode split:
    # "sorted" = XLA sort + Pallas block-matmul segment sum
    # (ops/pallas/segsum.py, ~2x over the XLA scatter-add ceiling);
    # "vjp" = jax.vjp of the encode forward (pure XLA, round-2 path).
    # None = auto: "sorted" on TPU backends, "vjp" elsewhere (the Pallas
    # kernel would run in interpret mode on CPU — orders slower).
    scatter_impl: Optional[str] = None
    # paths to locally available pretrained weights (no network egress):
    sd_weights: Optional[str] = None
    clip_weights: Optional[str] = None
    vgg_weights: Optional[str] = None
    dpt_weights: Optional[str] = None
    # device mesh: number of devices along the data (ray/view) axis.
    mesh_data: int = 1
    # tensor-parallel devices for the frozen guidance towers: the SD
    # UNet/VAE/CLIP params are sharded Megatron-style over a 'model'
    # axis (parallel/tp.py); XLA SPMD places the all-reduces on ICI.
    mesh_model: int = 1
    # Optimization-collapse watchdog (no reference equivalent; the
    # reference's only quality control is visual inspection, SURVEY.md
    # §4). The known dead states are diagnosable from scalars within
    # minutes: ws_mean pinned at ~1.0 (the solid-opaque-block entropy
    # attractor, docs/TPU_NOTES.md "failure modes #2" — burned 86 min of
    # TPU in results/ab_hashgrid) or a non-finite loss. The Trainer
    # counts consecutive logging intervals in the dead state, warns at
    # collapse_warn_intervals, and raises OptimizationCollapseError at
    # collapse_abort_intervals (0 disables the abort; threshold <= 0
    # disables the watchdog entirely).
    collapse_ws_threshold: float = 0.995
    collapse_warn_intervals: int = 5
    collapse_abort_intervals: int = 30
    # profiling: when set, Trainer.train wraps epochs in a jax.profiler
    # trace written here (open with xprof / tensorboard). Replaces the
    # reference's commented-out manual timing probes (nerf/sd.py:123-147,
    # nerf/utils.py:495) with the standard JAX tooling.
    profile_dir: Optional[str] = None

    def __post_init__(self):
        if self.lambda_entropy is None:
            self.lambda_entropy = 1e-3 if self.guidance == "none" else 1.0
        if self.lambda_sigma_cap is None:
            self.lambda_sigma_cap = 0.1 if self.guidance == "none" else 0.0

    # ---- derived ----
    @property
    def cascade(self) -> int:
        # reference: nerf/renderer.py:105
        return 1 + int(math.ceil(math.log2(max(self.bound, 1.0))))

    @property
    def per_level_scale(self) -> float:
        # reference: nerf/network_tcnn.py:52; must agree with
        # ops/encoding.py HashGridEncoder's internal computation
        return float(
            2.0 ** (
                math.log2(self.desired_resolution * self.bound
                          / self.base_resolution)
                / (self.hash_levels - 1)
            )
        )

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        field_names = {f.name for f in dataclasses.fields(Config)}
        d = {k: v for k, v in d.items() if k in field_names}
        for k in ("step_range", "radius_range", "fovy_range", "theta_range", "phi_range"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return Config(**d)


def stage1_config(**overrides) -> Config:
    """Coarse stage 1: frontal hemisphere (reference README.md:67-70)."""
    cfg = Config(iters=2000, phi_range=(135.0, 225.0))
    return cfg.replace(**overrides)


def stage2_config(**overrides) -> Config:
    """Coarse stage 2 / --final: full 360 (reference README.md:71-74)."""
    cfg = Config(iters=5000, albedo_iters=3500, phi_range=(0.0, 360.0), final=True)
    return cfg.replace(**overrides)
