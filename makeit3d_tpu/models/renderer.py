"""Volume rendering paths.

- render_occupancy: the production path — static-lattice occupancy
  marching + fixed-budget compositing. TPU-native equivalent of
  NeRFRenderer.run_cuda (reference: nerf/renderer.py:481-583).
- render_pure: uniform + importance sampling, no occupancy grid. The
  correctness oracle, equivalent of NeRFRenderer.run (reference:
  nerf/renderer.py:332-479).

Both are pure functions of (variables, rays, rng) and jit end-to-end; all
branching (shading mode, front/back view) rides traced scalars so a single
compiled program serves every training step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.composite import composite_rays, composite_weights_only
from ..ops.grid import DensityGrid
from ..ops.marching import (
    march_rays, march_rays_boxed, near_far_from_aabb, near_far_from_bound,
)
from ..ops.sample_pdf import sample_pdf
from .field import (
    apply_field_chunked,
    safe_normalize,
    sigma_albedo_normal_chunked,
)


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (compile-time) render configuration."""

    bound: float = 1.0
    min_near: float = 0.1
    max_steps: int = 512          # occupancy lattice length
    n_samples: int = 96           # per-ray sample budget after compaction
    num_steps: int = 64           # pure path: uniform samples
    upsample_steps: int = 32      # pure path: importance samples
    T_thresh: float = 1e-4
    max_depth: float = 10.0
    compute_smooth: bool = True   # lambda_smooth > 0
    smooth_sigma: float = 1e-2
    # fraction of marched samples whose perturbed normal is evaluated
    # for the smoothness loss. 1.0 = the reference's every-sample eval
    # (renderer.py:521-524); <1 subsamples rows per step (unbiased
    # estimator, fresh rows each step) — the perturbed chain is a full
    # second normal backward, ~40% of the shaded step on the v5e
    # (docs/TPU_NOTES.md), so 0.25 trades ~30% step time for smooth-loss
    # gradient variance. Applies to the fused/batched paths; the
    # encode-split (hash) path always evaluates every sample.
    smooth_subset: float = 1.0
    # Shade at the per-ray surface expectation instead of per sample
    # (see Config.deferred_shading). Training-path only; the eval/test
    # renders and the encode-split (field_eval override) path ignore it.
    deferred_shading: bool = False
    # log-density cap for the saturation loss (Config.lambda_sigma_cap):
    # training renders report mean relu(log(sigma) - sigma_cap_log) over
    # valid samples as results["loss_sigma_cap"].
    sigma_cap_log: float = 9.0
    field_chunk: int = 1 << 17    # samples per rematerialized field chunk
    # "occupancy" = compacted lattice march (reference run_cuda
    # semantics); "boxed" = gather-free uniform sampling inside the
    # per-ray occupied-AABB segment (ops/marching.march_rays_boxed —
    # trades the ~65-90 ms/step of occupancy-probe gathers for in-box
    # empty-space field evals; the march-mode A/B prices the quality)
    march_mode: str = "occupancy"
    # Training-path compositor backend. None = auto (Pallas on TPU). The
    # Pallas kernel pair (ops/pallas/composite.py) mirrors the CUDA
    # fwd/bwd (raymarching.cu:500-693) and keeps the composite out of
    # XLA's fusion soup.
    pallas_composite: Optional[bool] = None

    @staticmethod
    def from_config(cfg, training: bool = True) -> "RenderSettings":
        return RenderSettings(
            bound=cfg.bound,
            min_near=cfg.min_near,
            max_steps=cfg.max_steps,
            n_samples=cfg.train_samples_per_ray if training else cfg.eval_samples_per_ray,
            num_steps=cfg.num_steps,
            upsample_steps=cfg.upsample_steps,
            max_depth=cfg.max_depth,
            compute_smooth=cfg.lambda_smooth > 0,
            smooth_subset=getattr(cfg, "smooth_subset", 1.0),
            deferred_shading=bool(getattr(cfg, "deferred_shading", False)),
            sigma_cap_log=getattr(cfg, "sigma_cap_log", 9.0),
            # eval/test renders keep the reference-exact occupancy
            # march regardless of the training knob (eval sample
            # placement is the fidelity anchor and the tile-skip
            # machinery's contract) unless eval_march_boxed opts in
            march_mode=(getattr(cfg, "march_mode", "occupancy")
                        if training else
                        ("boxed" if getattr(cfg, "eval_march_boxed",
                                            False) else "occupancy")),
        )


def sample_light_d(key: jax.Array, rays_o: jnp.ndarray) -> jnp.ndarray:
    """Random light near the camera so faces stay lit
    (reference: nerf/renderer.py:496-499)."""
    noise = jax.random.normal(key, (3,))
    return safe_normalize(rays_o.reshape(-1, 3)[0] + noise)


def render_occupancy(
    field,
    variables,
    grid: DensityGrid,
    rays_o: jnp.ndarray,      # [N, 3]
    rays_d: jnp.ndarray,      # [N, 3]
    settings: RenderSettings,
    key: jax.Array,
    training: bool = True,
    shading_mode=0,
    ambient_ratio=1.0,
    light_d: Optional[jnp.ndarray] = None,
    bg_color: Any = 1.0,
    perturb: bool = True,
    depth_scale: Optional[jnp.ndarray] = None,
    marched: Optional["MarchedRays"] = None,
    shaded: bool = True,
    field_eval=None,
    smooth_eval=None,
) -> Dict[str, jnp.ndarray]:
    """`marched`: optionally consume pre-marched samples (see march_stage).

    `field_eval` / `smooth_eval`: optional overrides for the field
    application — (flat_x, flat_d) -> (sigmas, rgbs, normals) and
    (flat_x_perturbed) -> normals respectively. The encode-split
    pipeline (training/split_step.py) injects evaluators that consume
    pre-computed hash features so this program never contains the
    hash-table scatter backward (the axon-v5e fault trigger,
    docs/TPU_NOTES.md).

    `shaded` (STATIC): False compiles the reference's albedo-mode program
    (network_tcnn.py:141-144) — no finite-difference normal probes (7x
    fewer field evals) and, matching the reference's `normals is not
    None` gates (renderer.py:513-524), no orient/smooth losses.

    Splitting the march into its own jitted program materializes the
    sample lattice through HBM; on the axon v5e this sidesteps a Mosaic
    codegen fault in the fused backward (docs/TPU_NOTES.md) at the cost
    of one [N*S*3] round-trip (~50us at 128^2) — every backward then
    consumes jit *arguments*, the shape that passed all fault trials.
    """
    s = settings
    N = rays_o.shape[0]
    aabb = jnp.asarray([-s.bound] * 3 + [s.bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, s.min_near)

    key, k_march, k_light, k_smooth = jax.random.split(key, 4)
    if light_d is None:
        light_d = sample_light_d(k_light, rays_o)

    if marched is not None:
        m = marched
    elif s.march_mode == "boxed":
        from ..ops.grid import occupied_aabb

        m = march_rays_boxed(
            rays_o, rays_d, occupied_aabb(grid.occ, s.bound), nears, fars,
            n_samples=s.n_samples, perturb=perturb, key=k_march,
            min_near=s.min_near,
        )
    else:
        m = march_rays(
            rays_o, rays_d, grid.occ, s.bound, nears, fars,
            max_steps=s.max_steps, n_samples=s.n_samples,
            perturb=perturb, key=k_march,
        )

    flat_x = m.xyzs.reshape(-1, 3)
    flat_d = m.dirs.reshape(-1, 3)
    # Deferred shading: the field runs the cheap albedo program over the
    # sample lattice; normals are evaluated only at the per-ray surface
    # expectation after compositing (below). Requires per-sample weights
    # and the plain field evaluators, so the encode-split overrides and
    # the Pallas compositor (weights=None) opt out.
    deferred = (training and shaded and s.deferred_shading
                and field_eval is None and smooth_eval is None)
    normals_perturb = None
    # smooth-loss row subset (see RenderSettings.smooth_subset): fresh
    # random rows per step; duplicates are fine for an unbiased mean
    smooth_sub_idx = None
    if (training and shaded and s.compute_smooth and not deferred
            and s.smooth_subset < 1.0 and smooth_eval is None):
        M_all = flat_x.shape[0]
        m_sub = max((int(M_all * s.smooth_subset) // 256) * 256, 256)
        k_smooth, k_sub = jax.random.split(k_smooth)
        smooth_sub_idx = jax.random.randint(k_sub, (m_sub,), 0, M_all)
    if field_eval is not None:
        sigmas, rgbs, normals = field_eval(flat_x, flat_d, light_d)
    elif deferred:
        # albedo program over the lattice: no finite-difference /
        # analytic-normal probes per sample (the shaded program's
        # dominant FLOPs; docs/TPU_NOTES.md round-4 close-out)
        sigmas, rgbs, normals = apply_field_chunked(
            field, variables, flat_x, flat_d,
            light_d=light_d, ratio=ambient_ratio, shading_mode=shading_mode,
            chunk=s.field_chunk, shaded=False,
        )
    elif training and shaded and s.compute_smooth:
        # Batch the main eval and the smooth-loss perturbed eval into
        # ONE field program: [x; x+noise] through a single chunked
        # sigma/albedo/normal pass (2x the rows -> bigger MXU tiles,
        # half the launches), then shade the first half here. Same math
        # as the separate smooth_eval below (the reference evaluates the
        # perturbed normals separately, renderer.py:521-524).
        from .field import _shade

        sub_x = (flat_x if smooth_sub_idx is None
                 else flat_x[smooth_sub_idx])
        noise = jax.random.normal(k_smooth, sub_x.shape) * s.smooth_sigma
        both = jnp.concatenate([flat_x, sub_x + noise], axis=0)
        sig_all, alb_all, nrm_all = sigma_albedo_normal_chunked(
            field, variables, both, chunk=s.field_chunk)
        M = flat_x.shape[0]
        sigmas = sig_all[:M]
        normals = nrm_all[:M]
        rgbs = _shade(alb_all[:M], normals, light_d, ambient_ratio,
                      shading_mode, field.lambert_min)
        normals_perturb = nrm_all[M:]
    else:
        sigmas, rgbs, normals = apply_field_chunked(
            field, variables, flat_x, flat_d,
            light_d=light_d, ratio=ambient_ratio, shading_mode=shading_mode,
            chunk=s.field_chunk, shaded=shaded,
        )
    S = s.n_samples
    sigmas = sigmas.reshape(N, S)
    rgbs = rgbs.reshape(N, S, 3)
    normals = normals.reshape(N, S, 3)

    use_pallas_comp = s.pallas_composite
    if use_pallas_comp is None:
        use_pallas_comp = jax.default_backend() == "tpu"
    if training and use_pallas_comp and N % 256 == 0 and not deferred:
        from ..ops.pallas.composite import composite_rays_pallas

        ws_p, depth_p, image_p = composite_rays_pallas(
            sigmas, rgbs, m.dts, m.real_dts, m.valid, s.T_thresh, 256
        )
        from ..ops.composite import Composited

        comp = Composited(weights_sum=ws_p, depth=depth_p, image=image_p,
                          weights=None)
    else:
        comp = composite_rays(sigmas, rgbs, m.dts, m.real_dts, m.valid,
                              s.T_thresh)

    results: Dict[str, jnp.ndarray] = {}
    nvalid = jnp.maximum(jnp.sum(m.valid), 1)
    # marched-sample telemetry: the reference's 16-slot step_counter ring
    # (renderer.py:129-132,633-637) becomes a per-step scalar; here the
    # budget is static so this only feeds observability, not buffer sizing.
    results["n_valid"] = nvalid

    if training:
        # density-saturation cap (Config.lambda_sigma_cap): mean excess
        # log-density above the cap over valid samples. Where sigma has
        # saturated, the alpha gradient dt*exp(-sigma*dt) has vanished
        # and no ray-space loss can pull the region down; through the
        # exp parametrization this term's raw-logit gradient is a
        # constant above the cap (d relu(log sigma - tau)/d sigma =
        # 1/sigma, times dsigma/dv = sigma), so saturated junk decays
        # linearly. No reference analogue (the docstring of
        # Config.lambda_sigma_cap records the failure mode).
        excess = jnp.maximum(
            jnp.log(jnp.maximum(sigmas, 1e-12)) - s.sigma_cap_log, 0.0)
        results["loss_sigma_cap"] = jnp.sum(
            jnp.where(m.valid, excess, 0.0)) / nvalid

    if deferred:
        # --- deferred shading: one normal chain at the per-ray surface
        # expectation x_surf = sum(w_i x_i)/ws instead of per sample.
        # Divergences from the reference, all at the ray level instead of
        # the sample level: shading (network_tcnn.py:156-168), orient
        # loss (renderer.py:513-518, weighted by ws instead of
        # 1-exp(-sigma) per sample), smooth loss (renderer.py:521-524).
        # The surface expectation is stop-gradient (geometry treated as
        # fixed for the shade, like the orient weights). ---
        from .field import (
            SHADING_ALBEDO, SHADING_LAMBERTIAN, SHADING_TEXTURELESS,
        )

        ws_sg = jax.lax.stop_gradient(comp.weights_sum)
        w_sg = jax.lax.stop_gradient(comp.weights)
        x_surf = jnp.sum(w_sg[..., None] * m.xyzs, axis=-2) / jnp.maximum(
            ws_sg, 1e-6)[..., None]
        x_surf = jnp.clip(x_surf, -s.bound, s.bound)
        if s.compute_smooth:
            k_smooth, k_noise = jax.random.split(k_smooth)
            noise = jax.random.normal(k_noise, x_surf.shape) * s.smooth_sigma
            probe_x = jnp.concatenate([x_surf, x_surf + noise], axis=0)
        else:
            probe_x = x_surf
        _, _, nrm = sigma_albedo_normal_chunked(
            field, variables, probe_x, chunk=s.field_chunk)
        n_surf = nrm[:N]

        ray_valid = ws_sg > 1e-3
        n_ray_valid = jnp.maximum(jnp.sum(ray_valid), 1)

        # ray-level shade of the premultiplied foreground accumulation.
        # Lambertian scales the composited albedo; the albedo-free modes
        # (textureless / normal-viz) must re-premultiply by ws.
        lam = ambient_ratio + (1.0 - ambient_ratio) * jnp.maximum(
            jnp.sum(n_surf * light_d, axis=-1, keepdims=True),
            field.lambert_min)
        mode = jnp.asarray(shading_mode, jnp.int32)
        fg = jnp.where(
            mode == SHADING_ALBEDO, comp.image,
            jnp.where(
                mode == SHADING_LAMBERTIAN, comp.image * lam,
                jnp.where(
                    mode == SHADING_TEXTURELESS,
                    comp.weights_sum[..., None]
                    * jnp.broadcast_to(lam, comp.image.shape),
                    comp.weights_sum[..., None] * (n_surf + 1.0) / 2.0)))
        comp = comp._replace(image=fg)

        dot = jnp.sum(n_surf * rays_d, axis=-1)
        loss_orient = ws_sg * jnp.maximum(dot, 0.0) ** 2
        results["loss_orient"] = jnp.sum(
            jnp.where(ray_valid, loss_orient, 0.0)) / n_ray_valid
        if s.compute_smooth:
            diff = jnp.abs(n_surf - nrm[N:])
            diff = jnp.where(ray_valid[..., None], diff, 0.0)
            results["loss_smooth"] = jnp.sum(diff) / (n_ray_valid * 3)

    if training and shaded and not deferred:
        # orientation loss: back-facing normals with positive weight are
        # penalized (reference: renderer.py:513-518, CUDA-path variant
        # uses w = 1 - exp(-sigma), not alpha*T)
        w_orient = jax.lax.stop_gradient(1.0 - jnp.exp(-sigmas))
        dot = jnp.sum(normals * m.dirs, axis=-1)
        loss_orient = w_orient * jnp.maximum(dot, 0.0) ** 2
        loss_orient = jnp.where(m.valid, loss_orient, 0.0)
        results["loss_orient"] = jnp.sum(loss_orient) / nvalid

        if s.compute_smooth:
            # surface-normal smoothness (reference: renderer.py:521-524)
            if smooth_eval is not None:
                normals_perturb = smooth_eval(flat_x)
            elif normals_perturb is None:  # not pre-batched above
                sub_x = (flat_x if smooth_sub_idx is None
                         else flat_x[smooth_sub_idx])
                noise = (jax.random.normal(k_smooth, sub_x.shape)
                         * s.smooth_sigma)
                _, _, normals_perturb = sigma_albedo_normal_chunked(
                    field, variables, sub_x + noise, chunk=s.field_chunk
                )
            if smooth_sub_idx is not None:
                n_main = normals.reshape(-1, 3)[smooth_sub_idx]
                v_sub = m.valid.reshape(-1)[smooth_sub_idx]
                diff = jnp.abs(n_main - normals_perturb)
                diff = jnp.where(v_sub[..., None], diff, 0.0)
                results["loss_smooth"] = jnp.sum(diff) / (
                    jnp.maximum(jnp.sum(v_sub), 1) * 3)
            else:
                diff = jnp.abs(normals - normals_perturb.reshape(N, S, 3))
                diff = jnp.where(m.valid[..., None], diff, 0.0)
                results["loss_smooth"] = jnp.sum(diff) / (nvalid * 3)

    weights_sum = comp.weights_sum
    image = comp.image + (1.0 - weights_sum)[..., None] * bg_color
    depth = comp.depth + (1.0 - weights_sum) * s.max_depth
    if depth_scale is not None:
        depth = depth * depth_scale.reshape(depth.shape)

    if not training:
        # composite normals (reference: renderer.py:547-549, 560-562)
        normal_img = jnp.sum(
            comp.weights[..., None] * (normals + 1.0) / 2.0, axis=-2
        )
        normal_img = normal_img + (1.0 - weights_sum)[..., None] * bg_color
        results["normal"] = normal_img

    results["image"] = image
    results["depth"] = depth
    results["weights_sum"] = weights_sum
    results["mask"] = nears < fars
    return results


def render_eval_chunk_skippable(
    field,
    variables,
    grid: DensityGrid,
    rays_o: jnp.ndarray,      # [N, 3]
    rays_d: jnp.ndarray,      # [N, 3]
    settings: RenderSettings,
    key: jax.Array,
    bg_color,                 # scalar or [3]
    depth_scale: Optional[jnp.ndarray],
    aabb_occ: jnp.ndarray,    # [6] from ops.grid.occupied_aabb
    shading_mode=0,
    ambient_ratio=1.0,
) -> Dict[str, jnp.ndarray]:
    """One eval chunk, lax.cond-skipped when it misses the occupied box.

    A chunk none of whose rays intersects the occupied-cell AABB
    composits to exactly (bg, max_depth * depth_scale, ws=0, normal=bg)
    — see render_occupancy's finalization — so the march + field are
    skipped wholesale for it. Semantics-preserving: the AABB is a
    conservative superset of the occupancy (parity test
    tests/test_eval_skip.py). The eval frame is march-bound on TPU
    (~54% of the 6 s 800^2 frame, scripts/probe_eval_frame.py) and most
    tiles of an object-centric frame never touch the object, so this is
    the frame's main lever. Returns the four eval outputs only (the
    cond branches must be identical pytrees; the loss/telemetry keys of
    the full render are training-path outputs anyway).
    """
    s = settings
    N = rays_o.shape[0]
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb_occ, s.min_near)
    any_hit = jnp.any(nears < fars)

    def full(_):
        out = render_occupancy(
            field, variables, grid, rays_o, rays_d, s, key,
            training=False, shading_mode=shading_mode,
            ambient_ratio=ambient_ratio, bg_color=bg_color, perturb=False,
            depth_scale=depth_scale,
        )
        return {k: out[k].astype(jnp.float32)
                for k in ("image", "depth", "weights_sum", "normal")}

    def skip(_):
        bg = jnp.broadcast_to(
            jnp.asarray(bg_color, jnp.float32).reshape(-1), (N, 3))
        depth = jnp.full((N,), s.max_depth, jnp.float32)
        if depth_scale is not None:
            depth = depth * depth_scale.reshape(N)
        return {
            "image": bg,
            "depth": depth,
            "weights_sum": jnp.zeros((N,), jnp.float32),
            "normal": bg,
        }

    return jax.lax.cond(any_hit, full, skip, None)


def march_stage(
    grid: DensityGrid,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    settings: RenderSettings,
    key: jax.Array,
    perturb: bool = True,
):
    """The march half of render_occupancy, for two-program execution
    (see the `marched` parameter there). Pure function of the occupancy
    grid and rays — the field parameters are not involved, so no
    gradient flows through this program."""
    s = settings
    aabb = jnp.asarray([-s.bound] * 3 + [s.bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, s.min_near)
    if s.march_mode == "boxed":
        # mirror render_occupancy's boxed branch exactly (same box, same
        # key use) so the split-vs-fused parity contract holds bitwise
        from ..ops.grid import occupied_aabb

        return march_rays_boxed(
            rays_o, rays_d, occupied_aabb(grid.occ, s.bound), nears, fars,
            n_samples=s.n_samples, perturb=perturb, key=key,
            min_near=s.min_near,
        )
    return march_rays(
        rays_o, rays_d, grid.occ, s.bound, nears, fars,
        max_steps=s.max_steps, n_samples=s.n_samples,
        perturb=perturb, key=key,
    )


def render_pure(
    field,
    variables,
    rays_o: jnp.ndarray,      # [N, 3]
    rays_d: jnp.ndarray,      # [N, 3]
    settings: RenderSettings,
    key: jax.Array,
    training: bool = True,
    shading_mode=0,
    ambient_ratio=1.0,
    light_d: Optional[jnp.ndarray] = None,
    bg_color: Any = 1.0,
    perturb: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Uniform + PDF-importance sampling (reference: renderer.py:332-479)."""
    s = settings
    N = rays_o.shape[0]
    nears, fars = near_far_from_bound(
        rays_o, rays_d, s.bound, type="sphere", min_near=s.min_near
    )
    nears, fars = nears.reshape(N, 1), fars.reshape(N, 1)

    key, k_z, k_light, k_pdf, k_smooth = jax.random.split(key, 5)
    if light_d is None:
        light_d = sample_light_d(k_light, rays_o)

    T = s.num_steps
    z_vals = jnp.linspace(0.0, 1.0, T)[None, :]
    z_vals = nears + (fars - nears) * z_vals  # [N, T]
    sample_dist = (fars - nears) / T
    if perturb:
        z_vals = z_vals + (jax.random.uniform(k_z, z_vals.shape) - 0.5) * sample_dist

    def pts(z):
        p = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        return jnp.clip(p, -s.bound, s.bound)

    xyzs = pts(z_vals)
    dens = field.apply(variables, xyzs.reshape(-1, 3), method="density")
    sigmas = dens["sigma"].reshape(N, T)

    if s.upsample_steps > 0:
        # importance re-sampling on the coarse weights
        # (reference: renderer.py:381-413)
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate(
            [deltas, jnp.broadcast_to(sample_dist, (N, 1))], axis=-1
        )
        alphas = 1.0 - jnp.exp(-deltas * jax.lax.stop_gradient(sigmas))
        shifted = jnp.concatenate(
            [jnp.ones((N, 1)), 1.0 - alphas + 1e-15], axis=-1
        )
        weights = alphas * jnp.cumprod(shifted, axis=-1)[:, :-1]

        z_mid = z_vals[:, :-1] + 0.5 * deltas[:, :-1]
        new_z = sample_pdf(
            z_mid, weights[:, 1:-1], s.upsample_steps,
            det=not training, key=k_pdf,
        )
        new_z = jax.lax.stop_gradient(new_z)

        z_all = jnp.concatenate([z_vals, new_z], axis=-1)
        order = jnp.argsort(z_all, axis=-1)
        z_vals = jnp.take_along_axis(z_all, order, axis=-1)
        xyzs = pts(z_vals)

    Tt = z_vals.shape[-1]
    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, (N, 1))], axis=-1
    )

    flat_x = xyzs.reshape(-1, 3)
    flat_d = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape).reshape(-1, 3)
    sigmas, rgbs, normals = apply_field_chunked(
        field, variables, flat_x, flat_d,
        light_d=light_d, ratio=ambient_ratio, shading_mode=shading_mode,
        chunk=s.field_chunk,
    )
    sigmas = sigmas.reshape(N, Tt)
    rgbs = rgbs.reshape(N, Tt, 3)
    normals = normals.reshape(N, Tt, 3)

    valid = jnp.ones_like(sigmas, dtype=bool)
    weights = composite_weights_only(sigmas, deltas, valid, T_thresh=0.0)
    weights_sum = jnp.sum(weights, axis=-1)

    results: Dict[str, jnp.ndarray] = {}
    normal_map = jnp.sum(normals * weights[..., None], axis=-2)
    results["normal"] = normal_map

    if training:
        # pure-path orientation loss uses the compositing weights
        # (reference: renderer.py:434-437)
        dirs = jnp.broadcast_to(rays_d[:, None, :], normals.shape)
        dot = jnp.sum(normals * dirs, axis=-1)
        loss_orient = jax.lax.stop_gradient(weights) * jnp.maximum(dot, 0.0) ** 2
        results["loss_orient"] = jnp.mean(jnp.sum(loss_orient, axis=-1))

        if s.compute_smooth:
            noise = jax.random.normal(k_smooth, flat_x.shape) * s.smooth_sigma
            _, _, normals_perturb = sigma_albedo_normal_chunked(
                field, variables, flat_x + noise, chunk=s.field_chunk
            )
            results["loss_smooth"] = jnp.mean(
                jnp.abs(normals - normals_perturb.reshape(N, Tt, 3))
            )

    depth = jnp.sum(weights * z_vals, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    image = image + (1.0 - weights_sum)[..., None] * bg_color

    results["image"] = image
    results["depth"] = depth
    results["weights_sum"] = weights_sum
    results["mask"] = (nears < fars).reshape(N)
    return results
