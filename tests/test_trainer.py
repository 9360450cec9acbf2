"""End-to-end coarse-stage smoke test (BASELINE config 1 analogue):
fit the frontal view of a synthetic RGBA image with photometric + depth
losses only (no guidance), and check the loss drops and the render
reproduces the object silhouette."""

import os

import numpy as np
import pytest

from makeit3d_tpu.config import Config


def make_disk_image(size=512, radius=0.35, color=(0.9, 0.2, 0.1)):
    yy, xx = np.mgrid[0:size, 0:size]
    r = np.sqrt((xx / size - 0.5) ** 2 + (yy / size - 0.5) ** 2)
    alpha = (r < radius).astype(np.float32)
    rgba = np.zeros((1, size, size, 4), np.float32)
    for c in range(3):
        rgba[0, :, :, c] = color[c]
    rgba[0, :, :, 3] = alpha
    return rgba


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws"))
    return Config(
        h=48, w=48,
        max_steps=128,
        train_samples_per_ray=32,
        eval_samples_per_ray=48,
        grid_size=32,
        hash_levels=8,
        log2_hashmap_size=14,
        desired_resolution=256,
        lambda_smooth=0.0,     # keep the CPU test fast
        albedo_iters=10_000,   # albedo-only
        diff_iters=10_000,
        iters=60,
        workspace=ws,
        guidance="none",
    )


def test_frontal_fit_loss_decreases(tiny_cfg):
    from makeit3d_tpu.training.trainer import Trainer
    from makeit3d_tpu.cameras import ViewSampler

    rgba = make_disk_image()
    depth = np.full((512, 512), 0.5, np.float32)
    bg_mask = rgba[0, :, :, 3] < 0.5

    tr = Trainer(tiny_cfg, ref_rgba=rgba, ref_depth=depth, ref_mask=bg_mask,
                 workspace=tiny_cfg.workspace, use_checkpoint="scratch")

    sampler = ViewSampler(tiny_cfg, type="train", H=48, W=48, size=60, seed=0)
    losses = []
    import jax

    for i in range(60):
        if tr.global_step % tiny_cfg.update_extra_interval == 0:
            tr.key, k = jax.random.split(tr.key)
            tr.grid = tr._update_grid(tr.params, tr.grid, k)
        view = sampler.get(4 * i)  # frontal every step (index % 4 == 0)
        metrics, aux = tr.step(view)
        losses.append(float(metrics["loss_img"]))

    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.7, f"L1 did not decrease: {first:.4f} -> {last:.4f}"

    # the render should show the object: opaque inside, empty corners
    view = sampler.get(0)
    res = tr.render_image(view, bg_color=1.0)
    ws = res["weights_sum"]
    assert ws[20:28, 20:28].mean() > 0.3, "object not forming at center"

    # checkpoint round-trip
    tr.save_checkpoint("test_ckpt")
    gs = tr.global_step
    tr2 = Trainer(tiny_cfg, ref_rgba=rgba, ref_depth=depth, ref_mask=bg_mask,
                  workspace=tiny_cfg.workspace, use_checkpoint="latest")
    assert tr2.global_step == gs
    p1 = np.asarray(
        np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree.leaves(tr.params)])
    )
    p2 = np.asarray(
        np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree.leaves(tr2.params)])
    )
    np.testing.assert_allclose(p1, p2)


def test_smooth_subset_estimates_full():
    """smooth_subset < 1 (renderer.py / round-2 verdict item 5b): the
    subsampled perturbed-normal smooth loss is finite and averages to
    the full-eval value — a fresh-rows-per-step unbiased estimator of
    the reference's every-sample eval (renderer.py:521-524)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.models.field import make_field
    from makeit3d_tpu.models.renderer import (
        RenderSettings, render_occupancy,
    )
    from makeit3d_tpu.ops.grid import init_density_grid

    cfg = Config(h=24, w=24, max_steps=64, train_samples_per_ray=16,
                 grid_size=32, guidance="none", backbone="fourier",
                 mlp_hidden=32, mlp_layers=3, mlp_multires=4)
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                        jnp.zeros((8, 3)))
    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    grid = grid._replace(occ=jnp.ones_like(grid.occ))
    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=4,
                          seed=0)
    v = sampler.get(1)
    ro = jnp.asarray(v.rays_o.reshape(-1, 3))
    rd = jnp.asarray(v.rays_d.reshape(-1, 3))
    base = RenderSettings.from_config(cfg, training=True)

    def run(subset, k):
        s = dataclasses.replace(base, smooth_subset=subset)
        out = render_occupancy(field, params, grid, ro, rd, s, k,
                               training=True, shading_mode=1,
                               ambient_ratio=0.1, bg_color=1.0,
                               perturb=True)
        return float(out["loss_smooth"])

    keys = jax.random.split(jax.random.PRNGKey(1), 6)
    full = run(1.0, keys[0])
    subs = [run(0.25, k) for k in keys]
    assert all(np.isfinite(x) for x in subs)
    assert all(x >= 0 for x in subs)
    # loose estimator bound: the mean over draws tracks the full value
    assert abs(float(np.mean(subs)) - full) < 0.5 * max(full, 1e-3), (
        f"subset smooth loss {np.mean(subs):.5f} far from full {full:.5f}")
