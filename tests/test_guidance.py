"""Guidance stack tests with miniature towers (SURVEY.md §4: fake the
diffusion prior with a tiny random UNet for pipeline tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.guidance.scheduler import DDIMScheduler


def test_scheduler_alphas_monotone():
    sch = DDIMScheduler.create()
    a = np.asarray(sch.alphas_cumprod)
    assert a.shape == (1000,)
    assert np.all(np.diff(a) < 0)
    assert 0 < a[-1] < a[0] < 1


def test_scheduler_add_noise_and_step_consistency():
    sch = DDIMScheduler.create()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.asarray(500)
    xt = sch.add_noise(x0, noise, t)
    # with the true eps, one DDIM step toward t-1 moves xt closer to the
    # t-1 noising of x0
    x_prev = sch.step(noise, t, xt)
    expected = sch.add_noise(x0, noise, t - 1)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_guidance():
    from makeit3d_tpu.guidance.sd import StableDiffusionGuidance

    return StableDiffusionGuidance(tiny=True, seed=0)


def test_text_embeds_shape(tiny_guidance):
    z = tiny_guidance.get_text_embeds(["a photo of a teddy bear"], [""])
    assert z.shape == (2, 77, tiny_guidance.text_cfg.width)
    assert np.all(np.isfinite(np.asarray(z)))


def test_sds_branch_gradient_flows(tiny_guidance):
    g = tiny_guidance
    g.min_step, g.max_step = 500, 600  # t/T > 0.4 -> SDS branch
    text_z = g.get_text_embeds(["x"], [""])
    # NOTE: constant images are pathological for GroupNorm backward
    # (variance -> 0), so use a textured input like a real render
    pred = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(8), (64, 64, 3))

    def loss(p):
        return g.train_step_loss(jax.random.PRNGKey(0), text_z, p, ref,
                                 is_large=jnp.asarray(0.0))

    grad = jax.grad(loss)(pred)
    gn = float(jnp.linalg.norm(grad))
    assert np.isfinite(gn) and gn > 0


def test_denoise_branch_is_constant(tiny_guidance):
    """The t<=0.4T denoise->CLIP branch contributes zero gradient,
    matching the reference's torch.no_grad computation (sd.py:138-162)."""
    g = tiny_guidance
    g.min_step, g.max_step = 100, 200  # t/T <= 0.4 -> denoise branch
    text_z = g.get_text_embeds(["x"], [""])
    pred = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(8), (64, 64, 3))

    def loss(p):
        return g.train_step_loss(jax.random.PRNGKey(0), text_z, p, ref,
                                 is_large=jnp.asarray(0.0))

    val, grad = jax.value_and_grad(loss)(pred)
    assert np.isfinite(float(val))
    assert float(jnp.linalg.norm(grad)) == 0.0


def test_back_view_always_sds(tiny_guidance):
    g = tiny_guidance
    g.min_step, g.max_step = 100, 200  # low t, but is_large forces SDS
    text_z = g.get_text_embeds(["x"], [""])
    pred = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))

    def loss(p):
        return g.train_step_loss(jax.random.PRNGKey(0), text_z, p, pred,
                                 is_large=jnp.asarray(1.0))

    grad = jax.grad(loss)(pred)
    assert float(jnp.linalg.norm(grad)) > 0


def test_clip_losses_finite(tiny_guidance):
    g = tiny_guidance
    zt = g.clip_text_embeds("a teddy bear")
    pred = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(8), (64, 64, 3))
    val = g.clip_losses(pred, gt, zt)
    assert np.isfinite(float(val))
    grad = jax.grad(lambda p: g.clip_losses(p, gt, zt))(pred)
    assert np.isfinite(float(jnp.linalg.norm(grad)))


def test_clip_guidance_alternative():
    from makeit3d_tpu.guidance.clip import CLIPGuidance

    g = CLIPGuidance(tiny=True)
    z = g.get_text_embeds(["hello"])
    np.testing.assert_allclose(float(jnp.linalg.norm(z[0])), 1.0, rtol=1e-5)
    pred = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 3))
    val = g.train_step_loss(jax.random.PRNGKey(0), z, pred, pred,
                            jnp.asarray(0.0))
    assert np.isfinite(float(val))


def test_sampler_produces_image(tiny_guidance):
    g = tiny_guidance
    img = g.prompt_to_img("a teddy bear", num_inference_steps=3)
    assert img.shape == (1, 64, 64, 3)
    assert np.all((img >= 0) & (img <= 1))


def test_trainer_with_tiny_guidance(tmp_path):
    """Full novel-view training step through CLIP + SDS losses."""
    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.guidance.sd import StableDiffusionGuidance
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(
        h=32, w=32, max_steps=64, train_samples_per_ray=16,
        grid_size=16, hash_levels=4, log2_hashmap_size=10,
        desired_resolution=64, lambda_smooth=0.0,
        diff_iters=0, albedo_iters=10_000,
        workspace=str(tmp_path), text="a teddy bear",
    )
    guidance = StableDiffusionGuidance(tiny=True)
    rgba = np.zeros((1, 512, 512, 4), np.float32)
    rgba[..., 0] = 0.8
    rgba[0, 100:400, 100:400, 3] = 1.0
    tr = Trainer(cfg, guidance=guidance, ref_rgba=rgba,
                 workspace=cfg.workspace, use_checkpoint="scratch")
    sampler = ViewSampler(cfg, type="train", H=32, W=32, size=8, seed=0)
    import jax as _jax

    tr.key, k = _jax.random.split(tr.key)
    tr.grid = tr._update_grid(tr.params, tr.grid, k)
    view = sampler.get(1)  # novel view
    assert not view.is_front
    metrics, aux = tr.step(view)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_sds" in metrics and "loss_clip" in metrics
