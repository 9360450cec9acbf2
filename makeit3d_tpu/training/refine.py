"""Refine stage: textured point cloud + neural renderer optimization.

reference: Trainer.refine (nerf/utils.py:747-944). Pipeline:
  1. load the coarse stage's orbit renders (mvimg artifacts),
  2. build the point cloud (canonical view + fused novel views),
  3. optimize per-point colors + 16-d features + a background feature +
     the gated UNet under SDS / CLIP / contextual / background /
     color-anchor losses,
  4. render the final orbit video through the neural renderer.

TPU design: one jitted step per (front|novel) variant containing the
3-scale point splat, the UNet, and every loss; point positions are
fixed device buffers; Adam with the reference's 0.1^(i/1000) decay.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cameras import fix_poses
from ..models.unet_refine import RefineUNet
from ..models.vgg import ContextualLoss
from ..ops.point_raster import render_points
from ..training.losses import img_l1
from ..utils.workspace import save_image_u8, write_video


def max_pool_5x5(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 stride-1 max pool (reference: utils.py:836 dilation of the
    rendered mask)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (5, 5, 1), (1, 1, 1), "SAME"
    )


def intrinsics(fov_deg: float, H: int, W: int) -> np.ndarray:
    # reference: utils.py:758-759
    focal = 1.0 / (2.0 * math.tan(math.radians(fov_deg) / 2.0))
    return np.array(
        [[focal * W, 0, 0.5 * W], [0, focal * H, 0.5 * H], [0, 0, 1]],
        np.float32,
    )


class RefineStage:
    def __init__(self, cfg, guidance=None, workspace=None, seed: int = 0,
                 vgg_weights: Optional[str] = None):
        self.cfg = cfg
        self.guidance = guidance
        self.ws_dir = workspace or cfg.workspace
        # multi-host rank-gating: host 0 owns all file writes
        # (docs/MULTIHOST.md; same policy as utils.workspace.Workspace)
        from ..utils.workspace import default_primary
        self.primary = default_primary()
        self.key = jax.random.PRNGKey(seed)
        self.unet = RefineUNet(num_input_channels=3 + 16)
        self.cx = ContextualLoss(weights_path=vgg_weights)
        self.host_rng = np.random.default_rng(seed)

    # ------------------------------------------------------------------
    def render_mask_fn(self, H, W, K):
        """Canonical-cloud coverage renderer for the fusion step
        (reference: refine_utils.py:78-84)."""

        K = jnp.asarray(K)

        @jax.jit
        def fn(points, w2c):
            out = render_points(
                jnp.asarray(points, jnp.float32),
                jnp.ones((points.shape[0], 3), jnp.float32),
                jnp.asarray(w2c, jnp.float32), K, H, W,
                radius_px=2.0, points_per_pixel=8,
            )
            return out.image

        return lambda pts, w2c: np.asarray(fn(jnp.asarray(pts), w2c))[..., 0]

    # ------------------------------------------------------------------
    def init_state(self, v_cano, c_cano, v_novel, c_novel):
        """Optimizable state (reference: utils.py:812-835)."""
        key = self.key
        k1, k2, k3 = jax.random.split(key, 3)
        H = self.cfg.H
        self.points = jnp.asarray(
            np.concatenate([v_cano, v_novel], axis=0), jnp.float32
        )
        self.n_cano = len(v_cano)
        unet_params = self.unet.init(
            k3, [jnp.zeros((H, H, 19)), jnp.zeros((H // 2, H // 2, 19)),
                 jnp.zeros((H // 4, H // 4, 19))]
        )["params"]
        params = {
            "colors_cano": jnp.asarray(c_cano, jnp.float32),
            "colors_novel": jnp.asarray(c_novel, jnp.float32),
            "feat_cano": jax.random.normal(k1, (len(v_cano), 16)),
            "feat_novel": jax.random.normal(k2, (len(v_novel), 16)),
            "bg_feat": jnp.ones((19,)),
            "unet": unet_params,
        }
        anchors = {
            "colors_cano": params["colors_cano"],
            "colors_novel": params["colors_novel"],
        }
        sched = lambda count: 1e-3 * 0.1 ** jnp.minimum(
            count.astype(jnp.float32) / 1000.0, 1.0
        )
        optimizer = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15)
        return params, optimizer, optimizer.init(params), anchors

    # ------------------------------------------------------------------
    def _suggest_passes(self, H: int, W: int, fov: float):
        """Host-side per-pyramid-level multi-pass sizing so the splat
        composites EVERY binned point like pytorch3d (refine_utils.py:
        317-331) instead of silently truncating at tile capacity. The
        cloud is frozen during refine, so one sizing over sampled poses
        covers the whole run."""
        from ..ops.point_raster import suggest_passes

        rng = np.random.default_rng(0)
        poses = []
        for i in range(16):
            _, _, p, _, _ = fix_poses(
                1, i, rng,
                radius_range=self.cfg.radius_range,
                theta_range=self.cfg.theta_range,
                phi_range=self.cfg.phi_range,
            )
            poses.append(np.linalg.inv(p[0]))
        pts = np.asarray(self.points)
        out = [
            suggest_passes(pts, poses, intrinsics(fov, H // s, W // s),
                           H // s, W // s)
            for s in (1, 2, 4)
        ]
        print(f"[refine] splat passes per pyramid level: {out}", flush=True)
        return out

    def build_step(self, optimizer, is_front: bool, H: int, W: int,
                   fov: float, salt: int = 0):
        """`salt` scales the loss by (1 + 1e-6*salt) so re-rolled
        compilations after a worker fault produce a distinct executable
        (the v5e codegen lottery, docs/TPU_NOTES.md)."""
        cfg = self.cfg
        guidance = self.guidance
        unet = self.unet
        cx = self.cx
        points = self.points
        Ks = [jnp.asarray(intrinsics(fov, H // s, W // s))
              for s in (1, 2, 4)]
        K_full = Ks[0]
        if not hasattr(self, "n_passes"):
            self.n_passes = self._suggest_passes(H, W, fov)
        n_passes = self.n_passes

        def forward(params, w2c):
            feats = jnp.concatenate([
                jnp.concatenate([params["colors_cano"], params["feat_cano"]],
                                axis=-1),
                jnp.concatenate([params["colors_novel"], params["feat_novel"]],
                                axis=-1),
            ], axis=0)
            pyramid = []
            dropped = jnp.zeros((), jnp.int32)
            for s, K, npass in zip((1, 2, 4), Ks, n_passes):
                out = render_points(
                    points, feats, w2c, K, H // s, W // s,
                    radius_px=2.0, points_per_pixel=8,
                    bg_features=params["bg_feat"],
                    n_passes=npass,
                )
                pyramid.append(out.image)
                dropped = jnp.maximum(dropped, out.dropped)
            pred = unet.apply({"params": params["unet"]}, pyramid)
            return pred, (pyramid, dropped)

        def loss_fn(params, w2c, key, gt_rgb, gt_mask, text_z, text_pooled,
                    anchors, gparams):
            pred, (_, splat_dropped) = forward(params, w2c)

            # mask render (white cloud, no grads needed)
            mask_out = render_points(
                points, jnp.ones((points.shape[0], 3)), w2c, K_full, H, W,
                radius_px=2.0, points_per_pixel=8,
            )
            pred_mask = jax.lax.stop_gradient(mask_out.image)
            mask_dilate = max_pool_5x5(pred_mask)

            metrics = {}
            if is_front:
                main = 1000.0 * img_l1(pred * gt_mask[..., None],
                                       gt_rgb * gt_mask[..., None])
                metrics["loss_front"] = main
            else:
                main = 0.0
                if guidance is not None:
                    sds = guidance.train_step_loss(
                        key, text_z, pred, gt_rgb,
                        is_large=jnp.asarray(0.0), guidance_scale=5.0,
                        text_pooled=text_pooled, gparams=gparams,
                    )
                    clip_img = guidance.clip_losses(
                        pred, gt_rgb, text_pooled, gparams=gparams
                    )
                    main = sds + 10.0 * clip_img
                    metrics["loss_sds"] = sds
                    metrics["loss_clip"] = clip_img
                l_cx = cx(pred, gt_rgb)
                main = main + l_cx
                metrics["loss_cx"] = l_cx

            bg_loss = 1e-3 * jnp.sum(1.0 - pred * (1.0 - mask_dilate))
            reg = (
                jnp.mean((params["colors_novel"] - anchors["colors_novel"]) ** 2) * 1e3
                + jnp.mean((params["colors_cano"] - anchors["colors_cano"]) ** 2) * 1e5
            )
            loss = main + bg_loss + reg
            if salt:
                loss = loss * (1.0 + 1e-6 * salt)
            # nonzero = the splat truncated points beyond its pass window;
            # logged at the print cadence so truncation is never silent
            metrics["splat_dropped"] = splat_dropped
            metrics.update(loss=loss, bg_loss=bg_loss, reg_loss=reg)
            return loss, (metrics, pred)

        def step(params, opt_state, w2c, key, gt_rgb, gt_mask, text_z,
                 text_pooled, anchors, gparams):
            (_, (metrics, pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, w2c, key, gt_rgb, gt_mask, text_z, text_pooled,
              anchors, gparams)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics, pred

        return jax.jit(step), jax.jit(forward)

    # ------------------------------------------------------------------
    def run(self, load_dir: str, train_iters: int, gt_rgba: np.ndarray,
            text: Optional[str] = None, test_sampler=None):
        """Full refine pass (reference: utils.py:747-944).

        gt_rgba: [512 or H, W, 4] reference image in [0, 1].
        """
        import cv2

        cfg = self.cfg
        H, W = cfg.H, cfg.W
        outdir = os.path.join(self.ws_dir, "refine")
        train_outdir = os.path.join(outdir, "train")
        if self.primary:
            os.makedirs(outdir, exist_ok=True)
            os.makedirs(train_outdir, exist_ok=True)

        K = intrinsics(cfg.fov, H, W)
        gt_rgb = cv2.resize(np.asarray(gt_rgba[..., :3], np.float64), (W, H))
        gt_mask = cv2.resize(np.asarray(gt_rgba[..., 3], np.float64), (W, H))
        kernel = np.ones((5, 5), np.uint8)
        gt_mask = cv2.erode(gt_mask, kernel, iterations=1)

        from .point_cloud import build_point_cloud

        v_cano, c_cano, v_novel, c_novel = build_point_cloud(
            load_dir, gt_rgb, H, W, K, self.render_mask_fn(H, W, K)
        )
        np.save(os.path.join(outdir, "vertices_cano.npy"), v_cano)
        np.save(os.path.join(outdir, "vertices_color_cano.npy"), c_cano)
        np.save(os.path.join(outdir, "vertices_novel.npy"), v_novel)
        np.save(os.path.join(outdir, "vertices_color_novel.npy"), c_novel)

        params, optimizer, opt_state, anchors = self.init_state(
            v_cano, c_cano, v_novel, c_novel
        )

        text_z = text_pooled = None
        gparams = {}
        if self.guidance is not None and text is not None:
            text_z = self.guidance.get_text_embeds([text], [cfg.negative])
            text_pooled = self.guidance.clip_text_embeds(text)
            gparams = self.guidance.params

        step_front, fwd = self.build_step(optimizer, True, H, W, cfg.fov)
        step_novel, _ = self.build_step(optimizer, False, H, W, cfg.fov)

        gt_rgb_j = jnp.asarray(gt_rgb, jnp.float32)
        gt_mask_j = jnp.asarray(gt_mask, jnp.float32)

        # elastic recovery, same scheme as the coarse Trainer (worker
        # faults / dead RPCs through the axon relay, docs/TPU_NOTES.md):
        # host snapshot every 500 iters (refine state is only a few MB),
        # watchdog-bounded iterations, restore + retry on fault.
        snapshot = {"params": jax.tree.map(np.asarray, params),
                    "opt_state": jax.tree.map(np.asarray, opt_state),
                    "i": 0}

        def body(i, params, opt_state):
            _, _, poses, is_front, _ = fix_poses(
                1, i, self.host_rng,
                radius_range=cfg.radius_range,
                theta_range=cfg.theta_range,
                phi_range=cfg.phi_range,
            )
            w2c = jnp.asarray(np.linalg.inv(poses[0]), jnp.float32)
            self.key, k = jax.random.split(self.key)
            fn = step_front if is_front else step_novel
            params, opt_state, metrics, pred = fn(
                params, opt_state, w2c, k, gt_rgb_j, gt_mask_j,
                text_z, text_pooled, anchors, gparams,
            )
            if i % 50 == 0 and self.primary:
                save_image_u8(os.path.join(train_outdir, f"{i}.png"),
                              np.asarray(pred))
                parts = " ".join(f"{k2}={float(v):.4f}"
                                 for k2, v in sorted(metrics.items()))
                print(f"[refine {i}] {parts}", flush=True)
            if (i % 1000 == 0 or i == train_iters - 1) and self.primary:
                self._save_ckpt(outdir, i if i < train_iters - 1 else "end",
                                params)
            return params, opt_state

        import jax.errors as jerr

        from ..utils import watchdog

        i, rolls = 0, 0
        while i < train_iters:
            try:
                if i % 500 == 0:
                    snapshot = {
                        "params": jax.tree.map(np.asarray, params),
                        "opt_state": jax.tree.map(np.asarray, opt_state),
                        "i": i,
                    }
                params, opt_state = watchdog.call_with_timeout(
                    lambda: body(i, params, opt_state),
                    cfg.step_timeout_s)
                i += 1
            except (jerr.JaxRuntimeError, watchdog.DeviceHangError) as e:
                rolls += 1
                if rolls > cfg.max_compile_rerolls:
                    raise
                print(f"[refine] worker fault at iter {i} "
                      f"({type(e).__name__}); restoring iter "
                      f"{snapshot['i']} and retrying", flush=True)
                time.sleep(cfg.reroll_wait_s)
                params = jax.tree.map(jnp.asarray, snapshot["params"])
                opt_state = jax.tree.map(jnp.asarray, snapshot["opt_state"])
                i = snapshot["i"]
                step_front, fwd = self.build_step(optimizer, True, H, W,
                                                  cfg.fov, salt=rolls)
                step_novel, _ = self.build_step(optimizer, False, H, W,
                                                cfg.fov, salt=rolls)

        # final orbit rendering through the neural renderer
        # (reference: utils.py:912-944)
        if test_sampler is not None and self.primary:
            img_outdir = os.path.join(outdir, "results")
            os.makedirs(img_outdir, exist_ok=True)
            frames = []
            for i in range(test_sampler.size):
                view = test_sampler.get(i)
                w2c = jnp.asarray(np.linalg.inv(view.poses[0]), jnp.float32)
                pred, _ = fwd(params, w2c)
                img = np.asarray(pred)
                save_image_u8(
                    os.path.join(img_outdir, f"render_unet_{i:04d}.png"), img
                )
                frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
            write_video(os.path.join(img_outdir, "render_unet_img_clip.mp4"),
                        frames)
        return params

    def _save_ckpt(self, outdir: str, tag, params):
        from flax import serialization

        with open(os.path.join(outdir, f"{tag}_refine.ckpt"), "wb") as f:
            f.write(serialization.to_bytes(
                {"params": params, "points": self.points,
                 "n_cano": self.n_cano}
            ))
