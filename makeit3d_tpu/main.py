"""CLI entry point: single RGBA image -> 3D asset.

Mirrors the reference CLI surface (reference: main.py:16-251): same
flags, same workspace layout (results/<workspace>), same mode flow
(train -> [--final test] -> [--save_mesh] -> [--refine]).

Zero-egress gating: BLIP-2 captioning, the DPT depth model, SD weights
and CLIP weights all load from local paths when given (--sd_weights,
--dpt_weights, ...); absent weights degrade to documented fallbacks so
the pipeline runs end-to-end in any environment.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np


def parse_args(argv=None):
    from .config import Config

    d = Config()
    p = argparse.ArgumentParser(description="Make-It-3D (TPU)")
    # prompt / modes (reference main.py:19-34)
    p.add_argument("--text", default=None)
    p.add_argument("--negative", default="", type=str)
    p.add_argument("--test", action="store_true")
    p.add_argument("--final", action="store_true")
    p.add_argument("--refine", action="store_true")
    p.add_argument("--save_mesh", action="store_true")
    p.add_argument("--eval_interval", type=int, default=d.eval_interval)
    p.add_argument("--workspace", type=str, default="workspace")
    p.add_argument("--guidance", type=str, default="stable-diffusion",
                   choices=["stable-diffusion", "clip", "none"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--guidance_scale", type=float, default=10)
    p.add_argument("--need_back", action="store_true")
    p.add_argument("--suppress_face", action="store_true")
    p.add_argument("--ref_path", default=None, type=str)
    # training (reference main.py:37-51)
    p.add_argument("--iters", type=int, default=d.iters)
    p.add_argument("--refine_iters", type=int, default=d.refine_iters)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--min_lr", type=float, default=d.min_lr)
    p.add_argument("--ckpt", type=str, default="latest")
    p.add_argument("--max_steps", type=int, default=d.max_steps)
    p.add_argument("--num_steps", type=int, default=d.num_steps)
    p.add_argument("--upsample_steps", type=int, default=d.upsample_steps)
    p.add_argument("--update_extra_interval", type=int,
                   default=d.update_extra_interval)
    p.add_argument("--max_ray_batch", type=int, default=d.max_ray_batch)
    p.add_argument("--albedo_iters", type=int, default=d.albedo_iters)
    p.add_argument("--uniform_sphere_rate", type=float,
                   default=d.uniform_sphere_rate)
    p.add_argument("--diff_iters", type=int, default=d.diff_iters)
    p.add_argument("--step_range", type=float, nargs=2, default=[0.2, 0.6])
    # model (reference main.py:54-66)
    p.add_argument("--bg_radius", type=float, default=d.bg_radius)
    p.add_argument("--density_thresh", type=float, default=d.density_thresh)
    p.add_argument("--blob_density", type=float, default=d.blob_density)
    p.add_argument("--blob_radius", type=float, default=d.blob_radius)
    p.add_argument("--fp16", action="store_true",
                   help="bfloat16 compute on TPU")
    p.add_argument("--backbone", type=str, default="hashgrid",
                   choices=["hashgrid", "tcnn", "grid", "vanilla", "fourier"])
    p.add_argument("--optim", type=str, default="adan",
                   choices=["adan", "adam", "adamw"])
    p.add_argument("--sd_version", type=str, default="2.0",
                   choices=["1.5", "2.0"])
    p.add_argument("--hf_key", type=str, default=None)
    p.add_argument("--w", type=int, default=d.w)
    p.add_argument("--h", type=int, default=d.h)
    # scene (reference main.py:69-92)
    p.add_argument("--bound", type=float, default=d.bound)
    p.add_argument("--dt_gamma", type=float, default=d.dt_gamma)
    p.add_argument("--min_near", type=float, default=d.min_near)
    p.add_argument("--radius_range", type=float, nargs=2, default=[1.0, 1.5])
    p.add_argument("--fov", type=float, default=d.fov)
    p.add_argument("--fovy_range", type=float, nargs=2, default=[15, 25])
    p.add_argument("--theta_range", type=float, nargs=2, default=[70, 110])
    p.add_argument("--phi_range", type=float, nargs=2, default=[0, 360])
    # default None, NOT d.lambda_entropy: d is a default Config whose
    # __post_init__ already resolved the sentinel to 1.0; forwarding
    # that float would read as an explicit value and defeat the
    # guidance=="none" -> 1e-3 resolution in Config.__post_init__.
    p.add_argument("--lambda_entropy", type=float, default=None)
    p.add_argument("--lambda_opacity", type=float, default=d.lambda_opacity)
    p.add_argument("--lambda_orient", type=float, default=d.lambda_orient)
    p.add_argument("--lambda_smooth", type=float, default=d.lambda_smooth)
    p.add_argument("--smooth_subset", type=float, default=d.smooth_subset,
                   help="fraction of samples given the perturbed-normal "
                        "eval for the smooth loss (1.0 = reference "
                        "behavior; <1 subsamples the ~40%%-of-step "
                        "second normal chain)")
    p.add_argument("--deferred_shading", action="store_true",
                   default=d.deferred_shading, dest="deferred_shading",
                   help="shade at the per-ray surface expectation instead "
                        "of per sample (TPU-native variant: drops the "
                        "per-sample normal chain, ~100x fewer normal rows "
                        "on the shaded program; the default since round 5 "
                        "— see Config.deferred_shading)")
    p.add_argument("--per_sample_shading", action="store_false",
                   dest="deferred_shading",
                   help="the reference's exact per-sample shading + "
                        "sample-space orient/smooth losses "
                        "(nerf/renderer.py:513-524); ~2.2x slower shaded "
                        "step on TPU (docs/TPU_NOTES.md round 5)")
    p.add_argument("--lambda_img", type=float, default=d.lambda_img)
    p.add_argument("--lambda_depth", type=float, default=d.lambda_depth)
    p.add_argument("--lambda_clip", type=float, default=d.lambda_clip)
    p.add_argument("--W", type=int, default=d.W)
    p.add_argument("--H", type=int, default=d.H)
    p.add_argument("--max_depth", type=float, default=d.max_depth)
    # TPU-native knobs
    p.add_argument("--train_samples_per_ray", type=int,
                   default=d.train_samples_per_ray)
    p.add_argument("--eval_samples_per_ray", type=int,
                   default=d.eval_samples_per_ray)
    p.add_argument("--eval_dust_frac", type=float, default=d.eval_dust_frac,
                   help="eval-time occupancy floater filter: components "
                        "below this fraction of the largest (world "
                        "volume) are culled from eval marches and the "
                        "tile-skip box. 0.005 = the mesh exporter's "
                        "keep-rule (default); 0.5 = dominant-component "
                        "orbit renders for guidance-free demo assets "
                        "(culls feature-aliasing junk, TPU_NOTES round "
                        "5); 0 disables. Training is never filtered")
    p.add_argument("--eval_ref_hit", action="store_true",
                   default=d.eval_ref_hit,
                   help="eval-time reference-view first-hit filter: keep "
                        "only occupancy components first-hit by rays "
                        "from the supervised front view (the object, by "
                        "the single-image task's definition). Culls "
                        "junk the relative-size dust rule cannot "
                        "(guidance-free junk matches the object's "
                        "density and size, TPU_NOTES round 5). Training "
                        "is never filtered")
    p.add_argument("--march_mode", type=str, default=d.march_mode,
                   choices=["occupancy", "boxed"],
                   help="occupancy = reference-semantics compacted "
                        "lattice march; boxed = gather-free uniform "
                        "sampling inside the per-ray occupied-AABB "
                        "segment (see Config.march_mode)")
    p.add_argument("--eval_march_boxed", action="store_true",
                   default=d.eval_march_boxed,
                   help="let eval/test renders use the gather-free boxed "
                        "march too (default keeps reference-exact "
                        "occupancy eval marching; see Config)")
    p.add_argument("--sd_weights", type=str, default=None,
                   help="local diffusers-layout weight dir")
    p.add_argument("--clip_weights", type=str, default=None)
    p.add_argument("--vgg_weights", type=str, default=None)
    p.add_argument("--dpt_weights", type=str, default=None)
    p.add_argument("--blip_weights", type=str, default=None,
                   help="local BLIP-2 dir for captioning")
    p.add_argument("--tiny_guidance", action="store_true",
                   help="miniature random towers (tests/smoke)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler (xprof) trace of epoch 2 here")
    p.add_argument("--mlp_hidden", type=int, default=d.mlp_hidden,
                   help="fourier backbone: MLP width (MXU-aligned)")
    p.add_argument("--mlp_layers", type=int, default=d.mlp_layers)
    p.add_argument("--mlp_multires", type=int, default=d.mlp_multires)
    p.add_argument("--mlp_arch", type=str, default=d.mlp_arch,
                   choices=["relu", "resmlp"],
                   help="fourier backbone MLP: fused-kernel plain-ReLU "
                        "chain or XLA ResMLP")
    p.add_argument("--ema_decay", type=float, default=d.ema_decay,
                   help="model EMA decay (e.g. 0.95); default off, "
                        "matching the reference's never-exposed knob "
                        "(nerf/utils.py:304-307)")
    p.add_argument("--views_per_step", type=int, default=d.views_per_step,
                   help="novel views batched per optimizer step (MLP "
                        "backbones; front views stay single)")
    p.add_argument("--mesh_data", type=int, default=d.mesh_data,
                   help="data-parallel devices: rays sharded over a 1-D "
                        "mesh, state replicated (parallel/mesh.py)")
    p.add_argument("--mesh_model", type=int, default=d.mesh_model,
                   help="tensor-parallel devices for the frozen guidance "
                        "towers (Megatron-style shardings, parallel/tp.py)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "before any device use (env-driven coordinator "
                        "discovery on TPU pods)")

    args = p.parse_args(argv)
    kw = {k: v for k, v in vars(args).items()
          if k in {f.name for f in __import__("dataclasses").fields(Config)}}
    for k in ("step_range", "radius_range", "fovy_range", "theta_range",
              "phi_range"):
        kw[k] = tuple(kw[k])
    cfg = Config(**kw)
    cfg = cfg.replace(workspace=os.path.join("results", args.workspace))
    given = argv if argv is not None else sys.argv[1:]
    if cfg.guidance == "none" and "--lambda_entropy" not in given:
        # Resolution itself happens in Config.__post_init__ (the w=1
        # entropy attractor collapses unguided scenes — the guard must
        # cover programmatic Config users too, not just the CLI); the
        # CLI's job is only to surface it.
        print("[WARN] --guidance none: lambda_entropy defaulted to "
              f"{cfg.lambda_entropy:g} (the w=1 entropy attractor "
              "collapses unguided scenes); pass --lambda_entropy "
              "explicitly to override")
    return cfg, args


def caption_image(image_path: str, blip_weights=None) -> str:
    """BLIP-2 captioning with the reference's cleanup rules
    (reference: main.py:159-172). Requires local BLIP-2 weights."""
    if blip_weights is None:
        raise SystemExit(
            "--text is required when no local BLIP-2 weights are available "
            "(zero-egress environment; pass --blip_weights or --text)"
        )
    from PIL import Image
    from transformers import Blip2ForConditionalGeneration, Blip2Processor

    processor = Blip2Processor.from_pretrained(blip_weights)
    model = Blip2ForConditionalGeneration.from_pretrained(blip_weights)
    image = Image.open(image_path).convert("RGB")
    inputs = processor(image, return_tensors="pt")
    out = model.generate(**inputs)
    caption = processor.batch_decode(out, skip_special_tokens=True)[0].strip()
    caption = caption.replace("there is ", "").replace("close up", "photo")
    for bg in ("black background", "white background"):
        caption = caption.replace(bg, "ground")
    return caption


def main(argv=None):
    cfg, args = parse_args(argv)
    if getattr(args, "distributed", False):
        # multi-host entry: one process per host, coordinator discovered
        # from the TPU pod metadata / env (jax handles both). Must run
        # before any other jax API touches the backend.
        import jax

        jax.distributed.initialize()
    # persistent compilation cache: the trainer compiles 4-8 program
    # variants (albedo/shaded x front/novel x sds); through the axon
    # relay's degraded windows a single compile can take minutes, and
    # the cache makes every rerun (and bench.py, which shares the dir)
    # pay each compile once ever.
    import jax

    cache_dir = os.environ.get(
        "MAKEIT3D_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    os.makedirs(cfg.workspace, exist_ok=True)

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    from .cameras import ViewSampler
    from .training.trainer import Trainer
    from .utils.image import erode_mask, estimate_depth, load_ref_image, normalize_depth

    # guidance (reference: main.py:146-153). Pure --test (orbit render /
    # mesh export) never touches the prompt or the diffusion stack —
    # skip loading the towers and the BLIP caption requirement there.
    needs_guidance = not args.test or args.refine
    guidance = None
    if not needs_guidance:
        pass
    elif cfg.guidance == "stable-diffusion":
        import jax.numpy as jnp

        from .guidance.sd import StableDiffusionGuidance

        guidance = StableDiffusionGuidance(
            sd_version=cfg.sd_version,
            weights_root=args.sd_weights or cfg.hf_key,
            step_range=cfg.step_range,
            tiny=args.tiny_guidance,
            # --fp16 = bf16 UNet/VAE compute, the reference's AMP analogue
            dtype=jnp.bfloat16 if cfg.fp16 else jnp.float32,
        )
    elif cfg.guidance == "clip":
        from .guidance.clip import CLIPGuidance

        guidance = CLIPGuidance(weights_root=args.clip_weights,
                                tiny=args.tiny_guidance)

    # reference image preprocessing (reference: main.py:155-214)
    ref_rgba = ref_depth = ref_mask = None
    if cfg.ref_path:
        ref_rgba, ori_rgb = load_ref_image(cfg.ref_path)
        ref_mask = erode_mask((ref_rgba[0, :, :, 3] * 255).astype(np.uint8))
        disparity = estimate_depth(ori_rgb, args.dpt_weights)
        import cv2

        disparity = cv2.resize(np.asarray(disparity, np.float64), (512, 512))
        ref_depth = normalize_depth(disparity, ref_mask)

        if cfg.text is None and guidance is not None and needs_guidance:
            cfg = cfg.replace(text=caption_image(cfg.ref_path,
                                                 args.blip_weights))
            print("Caption:", cfg.text)

    trainer = Trainer(
        cfg, guidance=guidance, ref_rgba=ref_rgba, ref_depth=ref_depth,
        ref_mask=ref_mask, workspace=cfg.workspace, seed=cfg.seed,
        use_checkpoint=cfg.ckpt,
    )

    if args.test:
        sampler = ViewSampler(cfg, type="test", H=cfg.H, W=cfg.W, size=33)
        trainer.test(sampler, write_video_out=True)
        if args.save_mesh:
            trainer.save_mesh(resolution=256)
        return

    valid = ViewSampler(cfg, type="val", H=cfg.H, W=cfg.W, size=5)
    trainer.train(valid_sampler=valid)

    if args.final:
        sampler = ViewSampler(cfg, type="test", H=cfg.H, W=cfg.W, size=64)
        trainer.test(sampler, write_image=False, write_video_out=True)

    if args.save_mesh:
        trainer.save_mesh(resolution=256)

    if args.refine:
        if jax.process_count() > 1 and jax.process_index() != 0:
            # refine is a single-host stage (docs/MULTIHOST.md §4): it
            # consumes the mvimg renders host 0 just wrote and runs the
            # host-side point-cloud fusion; non-primary hosts are done.
            return
        from .training.refine import RefineStage

        mv = ViewSampler(cfg, type="gen_mv", H=cfg.H, W=cfg.W, size=33)
        test_sampler = ViewSampler(cfg, type="test", H=cfg.H, W=cfg.W, size=64)
        mv_dir = os.path.join(cfg.workspace, "mvimg")
        trainer.test(mv, save_path=mv_dir, write_image=True,
                     write_video_out=False)
        stage = RefineStage(cfg, guidance=guidance, workspace=cfg.workspace,
                            vgg_weights=args.vgg_weights)
        gt_rgba, _ = load_ref_image(cfg.ref_path)
        stage.run(mv_dir, cfg.refine_iters, gt_rgba[0], text=cfg.text,
                  test_sampler=test_sampler)


if __name__ == "__main__":
    main()
