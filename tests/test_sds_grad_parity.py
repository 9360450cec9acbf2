"""One-step GRADIENT parity of the guided train step vs a torch
reimplementation of the reference's exact two-backward scheme (round-2
verdict item 2 — the keystone proof this environment supports without
SD weights).

The reference updates parameters through TWO backward passes
(/root/reference/nerf/sd.py:117-174 + nerf/utils.py:561-563,983):

  1. SDS injection: latents = vae.encode(pred_rgb) WITH grad; the UNet's
     CFG epsilon is computed under torch.no_grad; then
     `latents.backward(gradient=w(t)*(eps_hat - noise), retain_graph=True)`
     accumulates d(SDS)/d(theta) directly into .grad.
  2. Main loss backward: the novel-view CLIP losses
     (utils.py:561-563) flow through `loss.backward()` (utils.py:983).

This repo reformulates both as ONE scalar loss under a single
value_and_grad (guidance/sd.py:229-306):
     loss = clip_losses + sum(latents * stop_grad(w(t)*(eps_hat-noise)))

Here a torch fixture executes the reference's literal scheme — tiny VAE
encoder twin (torch.nn, diffusers block structure, same pattern as
tests/test_sd_parity.py), HF `transformers.CLIPVisionModelWithProjection`
as the CLIP tower, identical weights ported torch->flax through
models/sd/weights.py, fixed t/noise/VAE-sample — against the production
`train_step_loss` + `clip_losses`, and asserts
d(loss)/d(generator-params) matches. The generator (a tiny MLP mapping
fixed Fourier pixel features -> RGB image) stands in for the renderer:
the render path's own gradients are covered by tests/test_ops.py and
tests/test_field_vjp.py; what is under test here is the guided step's
gradient WIRING through the frozen towers.

The UNet's epsilon is passed to torch as a constant: it is inside
stop_gradient / torch.no_grad in BOTH schemes, so given equal `latents`
values (VAE twin parity) it is the same constant either way — no torch
UNet twin needed for a gradient test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from makeit3d_tpu.models.sd.clip import CLIP_MEAN, CLIP_STD  # noqa: E402
from makeit3d_tpu.models.sd.weights import port_torch_to_flax  # noqa: E402

SIZE = 64          # tiny guidance image size (latents 32x32)
GUIDANCE_SCALE = 10.0


def _port_into(torch_module, flax_params):
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_module.state_dict().items()}
    return port_torch_to_flax(sd, flax_params)


# ---------------------------------------------------------------------------
# torch twins (diffusers block structure; names mirror the flax modules
# so models/sd/weights.py ports them — same approach as test_sd_parity)
# ---------------------------------------------------------------------------


class TResnetNT(torch.nn.Module):
    """ResnetBlock2D(use_time_emb=False) twin."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (torch.nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TVaeAttention(torch.nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(32, channels, eps=1e-6)
        self.to_q = torch.nn.Linear(channels, channels)
        self.to_k = torch.nn.Linear(channels, channels)
        self.to_v = torch.nn.Linear(channels, channels)
        self.to_out_0 = torch.nn.Linear(channels, channels)

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) / C ** 0.5, dim=-1)
        h = self.to_out_0(attn @ v)
        return x + h.transpose(1, 2).reshape(B, C, H, W)


class TVaeEncoderTiny(torch.nn.Module):
    """Encoder twin for AutoencoderKL(block_out_channels=(32, 64))
    (models/sd/vae.py Encoder, layers_per_block=2, latent_channels=4)."""

    def __init__(self):
        super().__init__()
        self.conv_in = torch.nn.Conv2d(3, 32, 3, padding=1)
        self.down_blocks_0_resnets_0 = TResnetNT(32, 32)
        self.down_blocks_0_resnets_1 = TResnetNT(32, 32)
        self.down_blocks_0_downsamplers_0 = torch.nn.Module()
        self.down_blocks_0_downsamplers_0.conv = torch.nn.Conv2d(
            32, 32, 3, stride=2, padding=1)
        self.down_blocks_1_resnets_0 = TResnetNT(32, 64)
        self.down_blocks_1_resnets_1 = TResnetNT(64, 64)
        self.mid_block_resnets_0 = TResnetNT(64, 64)
        self.mid_block_attentions_0 = TVaeAttention(64)
        self.mid_block_resnets_1 = TResnetNT(64, 64)
        self.conv_norm_out = torch.nn.GroupNorm(32, 64, eps=1e-6)
        self.conv_out = torch.nn.Conv2d(64, 8, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        h = self.down_blocks_0_resnets_1(self.down_blocks_0_resnets_0(h))
        h = self.down_blocks_0_downsamplers_0.conv(h)
        h = self.down_blocks_1_resnets_1(self.down_blocks_1_resnets_0(h))
        h = self.mid_block_resnets_0(h)
        h = self.mid_block_attentions_0(h)
        h = self.mid_block_resnets_1(h)
        h = torch.nn.functional.silu(self.conv_norm_out(h))
        return self.conv_out(h)


class TVaeTiny(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TVaeEncoderTiny()
        self.quant_conv = torch.nn.Conv2d(8, 8, 1)

    def encode(self, x, eps):
        """reference sd.py encode_imgs semantics: sample the posterior,
        scale by 0.18215 (models/sd/vae.py:102-108); `eps` is the fixed
        gaussian standing in for the JAX PRNG draw."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        return (mean + torch.exp(0.5 * logvar) * eps) * 0.18215


class TGenerator(torch.nn.Module):
    """theta -> [SIZE, SIZE, 3] image; the tiny stand-in for the field
    + renderer (see module docstring)."""

    def __init__(self, feat_dim):
        super().__init__()
        self.fc1 = torch.nn.Linear(feat_dim, 32)
        self.fc2 = torch.nn.Linear(32, 3)

    def forward(self, feats):
        h = torch.relu(self.fc1(feats))
        return torch.sigmoid(self.fc2(h)).reshape(SIZE, SIZE, 3)


def _clip_pooled_torch(hf_clip, img_hw3):
    """clip_preprocess + pooled projection twin (models/sd/clip.py:193-200
    + CLIPVisionModel pooled path) via HF."""
    x = img_hw3.permute(2, 0, 1)[None]                       # NCHW
    x = torch.nn.functional.interpolate(
        x, (224, 224), mode="bilinear", align_corners=False)
    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    return hf_clip((x - mean) / std).image_embeds[0]


def _cos_losses_torch(hf_clip, pred, gt, text_pooled):
    """reference utils.py:436-453,561-563 (== guidance.clip_losses)."""
    zp = _clip_pooled_torch(hf_clip, pred)
    zg = _clip_pooled_torch(hf_clip, gt)
    zp = zp / zp.norm()
    zg = zg / zg.norm()
    zt = text_pooled / text_pooled.norm()
    return -(zp * zg).sum() - (zp * zt).sum()


# ---------------------------------------------------------------------------


class FlaxGenerator:
    def __init__(self, feat_dim):
        import flax.linen as nn

        class G(nn.Module):
            @nn.compact
            def __call__(self, feats):
                h = nn.relu(nn.Dense(32, name="fc1")(feats))
                return jax.nn.sigmoid(
                    nn.Dense(3, name="fc2")(h)).reshape(SIZE, SIZE, 3)

        self.mod = G()

    def init(self, feats):
        return self.mod.init(jax.random.PRNGKey(9), feats)["params"]

    def apply(self, params, feats):
        return self.mod.apply({"params": params}, feats)


@pytest.fixture(scope="module")
def rig():
    from transformers import CLIPVisionConfig as HFVCfg
    from transformers import CLIPVisionModelWithProjection as HFV

    from makeit3d_tpu.guidance.sd import StableDiffusionGuidance

    torch.manual_seed(0)
    guidance = StableDiffusionGuidance(tiny=True, seed=0)
    assert guidance.image_size == SIZE

    # torch twins own the weights; port them INTO the flax guidance
    tvae = TVaeTiny().eval()
    guidance.params["vae"] = _port_into(tvae, guidance.params["vae"])
    hfv = HFV(HFVCfg(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=224, patch_size=32,
        projection_dim=32, hidden_act="quick_gelu",
    )).eval()
    guidance.params["clip_vision"] = _port_into(
        hfv, guidance.params["clip_vision"])

    rng = np.random.default_rng(3)
    feat_dim = 16
    coords = np.stack(np.meshgrid(np.linspace(-1, 1, SIZE),
                                  np.linspace(-1, 1, SIZE),
                                  indexing="ij"), -1).reshape(-1, 2)
    Bmat = rng.normal(size=(2, feat_dim // 2)).astype(np.float32) * 2.0
    feats = np.concatenate([np.sin(coords @ Bmat),
                            np.cos(coords @ Bmat)], -1).astype(np.float32)

    gen = FlaxGenerator(feat_dim)
    tgen = TGenerator(feat_dim)
    theta = gen.init(jnp.asarray(feats))
    theta = {
        "fc1": {"kernel": jnp.asarray(
                    tgen.fc1.weight.detach().numpy().T),
                "bias": jnp.asarray(tgen.fc1.bias.detach().numpy())},
        "fc2": {"kernel": jnp.asarray(
                    tgen.fc2.weight.detach().numpy().T),
                "bias": jnp.asarray(tgen.fc2.bias.detach().numpy())},
    }

    gt_rgb = rng.uniform(0, 1, (SIZE, SIZE, 3)).astype(np.float32)
    text_z = rng.normal(size=(2, 77, 32)).astype(np.float32)
    text_pooled = rng.normal(size=(32,)).astype(np.float32)
    return (guidance, tvae, hfv, gen, tgen, feats, theta, gt_rgb,
            text_z, text_pooled)


def _torch_grads(tgen):
    return {
        "fc1": {"kernel": tgen.fc1.weight.grad.numpy().T,
                "bias": tgen.fc1.bias.grad.numpy()},
        "fc2": {"kernel": tgen.fc2.weight.grad.numpy().T,
                "bias": tgen.fc2.bias.grad.numpy()},
    }


def _assert_tree_close(got, want, rtol=2e-3):
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(got),
        jax.tree_util.tree_leaves_with_path(want),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=rtol * scale,
            err_msg=f"grad {jax.tree_util.keystr(pa)} diverged")


def test_sds_branch_grad_matches_reference_scheme(rig):
    """is_large=1 -> the SDS injection branch. torch runs the literal
    reference wiring: latents.backward(gradient=w(t)(eps_hat - noise))
    then clip_loss.backward(); JAX runs the production single
    value_and_grad. d(loss)/d(theta) must match."""
    (guidance, tvae, hfv, gen, tgen, feats, theta, gt_rgb,
     text_z, text_pooled) = rig
    key = jax.random.PRNGKey(123)

    # ---- JAX: the production one-backward step ----
    def loss_fn(th):
        img = gen.apply(th, jnp.asarray(feats))
        l_clip = guidance.clip_losses(img, jnp.asarray(gt_rgb),
                                      jnp.asarray(text_pooled))
        l_sds = guidance.train_step_loss(
            key, jnp.asarray(text_z), img, jnp.asarray(gt_rgb),
            is_large=jnp.asarray(1.0), guidance_scale=GUIDANCE_SCALE,
            text_pooled=jnp.asarray(text_pooled))
        return l_clip + l_sds

    g_jax = jax.jit(jax.grad(loss_fn))(theta)

    # ---- shared constants: replicate train_step_loss's PRNG stream ----
    k_t, k_noise, k_vae = jax.random.split(key, 3)
    t_val = int(jax.random.randint(
        k_t, (), guidance.min_step, guidance.max_step + 1))
    lat_shape = (1, SIZE // 2, SIZE // 2, 4)
    noise = np.asarray(jax.random.normal(k_noise, lat_shape))
    eps_vae = np.asarray(jax.random.normal(k_vae, lat_shape))
    # is_large=1 forces the SDS branch regardless of t (sd.py:153,163)

    # eps_hat: stop-gradient in both schemes -> a shared constant given
    # equal latents; compute it once with the production towers
    def eps_hat_fn(th):
        img = gen.apply(th, jnp.asarray(feats))
        lat = guidance.vae.apply(
            {"params": guidance.params["vae"]}, 2.0 * img[None] - 1.0,
            k_vae, method="encode")
        lat_noisy = guidance.scheduler.add_noise(
            lat, jnp.asarray(noise), t_val)
        lat2 = jnp.concatenate([lat_noisy, lat_noisy], axis=0)
        eps = guidance.unet.apply(
            {"params": guidance.params["unet"]}, lat2,
            jnp.full((2,), t_val, jnp.int32), jnp.asarray(text_z))
        return eps[1:2] + GUIDANCE_SCALE * (eps[1:2] - eps[0:1])

    eps_hat = np.asarray(eps_hat_fn(theta))

    # ---- torch: the reference's literal two-backward scheme ----
    tgen.zero_grad()
    img_t = tgen(torch.tensor(feats))
    # NHWC -> NCHW for the conv stack
    x = (2.0 * img_t - 1.0).permute(2, 0, 1)[None]
    latents_t = tvae.encode(x, torch.tensor(np.moveaxis(eps_vae, -1, 1)))
    # w(t) = 1 - alphas_cumprod[t] (reference sd.py:164-166)
    w = 1.0 - float(np.asarray(guidance.scheduler.alphas_cumprod[t_val]))
    grad_inject = torch.tensor(
        np.nan_to_num(w * (np.moveaxis(eps_hat, -1, 1) -
                           np.moveaxis(noise, -1, 1))))
    # reference sd.py:171: latents.backward(gradient=grad, retain_graph)
    latents_t.backward(gradient=grad_inject, retain_graph=True)
    # reference utils.py:561-563 + 983: the CLIP losses' own backward
    l_clip_t = _cos_losses_torch(hfv, img_t, torch.tensor(gt_rgb),
                                 torch.tensor(text_pooled))
    l_clip_t.backward()
    g_torch = _torch_grads(tgen)

    _assert_tree_close(g_jax, g_torch)


def test_denoise_branch_contributes_zero_grad(rig):
    """is_large=0 & t <= 0.4T -> the reference's denoise-then-CLIP
    branch, whose graph is disconnected from theta (everything flows
    from no_grad latents_noisy; sd.py:153-162). The production
    stop_gradient reformulation must therefore give exactly the
    CLIP-only gradient."""
    (guidance, tvae, hfv, gen, tgen, feats, theta, gt_rgb,
     text_z, text_pooled) = rig
    import dataclasses as _dc

    # force the denoise branch: t always in [0.2T, 0.3T] <= 0.4T
    g2 = guidance
    old = (g2.min_step, g2.max_step)
    g2.min_step, g2.max_step = 200, 300
    try:
        key = jax.random.PRNGKey(7)

        def loss_guided(th):
            img = gen.apply(th, jnp.asarray(feats))
            return guidance.train_step_loss(
                key, jnp.asarray(text_z), img, jnp.asarray(gt_rgb),
                is_large=jnp.asarray(0.0), guidance_scale=GUIDANCE_SCALE,
                text_pooled=jnp.asarray(text_pooled))

        g_all = jax.jit(jax.grad(loss_guided))(theta)
        for _, leaf in jax.tree_util.tree_leaves_with_path(g_all):
            np.testing.assert_allclose(np.asarray(leaf), 0.0, atol=1e-12)
    finally:
        g2.min_step, g2.max_step = old
