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
