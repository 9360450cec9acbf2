"""Stable Diffusion score-distillation guidance.

Equivalent of the reference's StableDiffusion wrapper (reference:
nerf/sd.py:21-238) rebuilt for a single-backward JAX training step:

- The reference injects the SDS gradient with a second backward pass
  (latents.backward(gradient=w(t)(eps_hat - eps)), sd.py:163-173). Here
  the same gradient comes out of the scalar loss
      loss_sds = sum(latents * stop_gradient(w(t) (eps_hat - eps)))
  so render -> VAE encode -> UNet -> losses is ONE value_and_grad.
- The reference's denoise-then-CLIP branch (t <= 0.4T and not a back
  view, sd.py:153-162) computes everything under torch.no_grad, so it
  contributes a CONSTANT to the loss — zero gradient. That effective
  behavior is reproduced with stop_gradient (and documented here since
  it looks like a bug but is what the reference executes).
- CFG uses the reference's amplified form
  eps = eps_text + s * (eps_text - eps_uncond)   (sd.py:150-151).

All frozen tower parameters travel as an explicit pytree argument so
they enter jit as arguments (device-resident buffers), not as baked-in
HLO constants.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..models.sd.clip import (
    CLIPTextModel,
    CLIPVisionModel,
    CLIPTextConfig,
    CLIPVisionConfig,
    SD2_TEXT_CONFIG,
    SD15_TEXT_CONFIG,
    VIT_B16,
    clip_preprocess,
)
from ..models.sd.tokenizer import CLIPTokenizer
from ..models.sd.unet import UNet2DConditionModel, sd15_unet, sd2_base_unet, tiny_unet
from ..models.sd.vae import AutoencoderKL
from ..models.sd.weights import find_weight_file, load_torch_state_dict, port_torch_to_flax
from .scheduler import DDIMScheduler


def _tiny_vae():
    return AutoencoderKL(block_out_channels=(32, 64))


def _tiny_text_cfg():
    return CLIPTextConfig(vocab_size=49408, width=32, layers=2, heads=2,
                          act="gelu", projection_dim=None)


def _tiny_clip():
    return (
        CLIPTextConfig(width=32, layers=2, heads=2, projection_dim=32),
        CLIPVisionConfig(image_size=224, patch_size=32, width=32, layers=2,
                         heads=2, projection_dim=32),
    )


class StableDiffusionGuidance:
    """Frozen SD + CLIP towers and the guidance losses.

    weights_root: a local diffusers-layout directory (vae/, unet/,
    text_encoder/, tokenizer/). Absent -> randomly initialized towers
    (pipeline stays runnable; quality obviously needs real weights).
    tiny=True builds miniature towers for tests.
    """

    def __init__(
        self,
        sd_version: str = "2.0",
        weights_root: Optional[str] = None,
        step_range=(0.2, 0.6),
        tiny: bool = False,
        seed: int = 0,
        latent_image_size: int = 512,
        dtype=jnp.float32,
    ):
        self.sd_version = sd_version
        self.dtype = dtype
        self.image_size = latent_image_size
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 6)

        if tiny:
            self.unet = tiny_unet(dtype)
            self.vae = _tiny_vae()
            self.text_cfg = _tiny_text_cfg()
            clip_t_cfg, clip_v_cfg = _tiny_clip()
            self.image_size = 64
        elif sd_version == "1.5":
            self.unet = sd15_unet(dtype)
            self.vae = AutoencoderKL(dtype=dtype)
            self.text_cfg = SD15_TEXT_CONFIG
            clip_t_cfg, clip_v_cfg = VIT_B16
        else:
            self.unet = sd2_base_unet(dtype)
            self.vae = AutoencoderKL(dtype=dtype)
            self.text_cfg = SD2_TEXT_CONFIG
            clip_t_cfg, clip_v_cfg = VIT_B16

        # context dim must match the text tower in the tiny setting
        if tiny:
            self.unet = self.unet.clone(cross_attention_dim=self.text_cfg.width)

        self.text_encoder = CLIPTextModel(self.text_cfg)
        # the loss CLIP model (reference: trainer-owned ViT-B/16,
        # nerf/utils.py:248)
        self.clip_text = CLIPTextModel(clip_t_cfg)
        self.clip_vision = CLIPVisionModel(clip_v_cfg)
        self.clip_image_size = clip_v_cfg.image_size

        tok_path = None
        if weights_root:
            for cand in ("tokenizer/merges.txt", "bpe_simple_vocab_16e6.txt.gz"):
                p = os.path.join(weights_root, cand)
                if os.path.exists(p):
                    tok_path = p
                    break
        # SD1.5's CLIP tokenizer pads with EOT; SD2/OpenCLIP pads with 0
        self.tokenizer = CLIPTokenizer(
            tok_path,
            pad_token_id=CLIPTokenizer.EOT if sd_version == "1.5" else 0,
        )

        self.latent_factor = 2 if tiny else 8
        latent_hw = self.image_size // self.latent_factor
        self.params: Dict[str, Any] = {
            "vae": self.vae.init(
                ks[0], jnp.zeros((1, self.image_size, self.image_size, 3)), ks[1]
            )["params"],
            "unet": self.unet.init(
                ks[2],
                jnp.zeros((1, latent_hw, latent_hw, 4)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, self.text_cfg.width)),
            )["params"],
            "text": self.text_encoder.init(
                ks[3], jnp.zeros((1, 77), jnp.int32)
            )["params"],
            "clip_text": self.clip_text.init(
                ks[4], jnp.zeros((1, 77), jnp.int32)
            )["params"],
            "clip_vision": self.clip_vision.init(
                ks[5],
                jnp.zeros((1, self.clip_image_size, self.clip_image_size, 3)),
            )["params"],
        }
        self.has_pretrained = False
        if weights_root:
            self._load_weights(weights_root)

        self.scheduler = DDIMScheduler.create()
        T = self.scheduler.num_train_timesteps
        self.min_step = int(T * step_range[0])
        self.max_step = int(T * step_range[1])

    # ------------------------------------------------------------------
    def _load_weights(self, root: str):
        for name, module_key, strip in (
            ("vae", "vae", None),
            ("unet", "unet", None),
            ("text_encoder", "text", None),
        ):
            try:
                path = find_weight_file(root, name)
            except FileNotFoundError:
                print(f"[guidance] no {name} weights under {root}; "
                      f"keeping random init")
                continue
            sd = load_torch_state_dict(path)
            self.params[module_key] = port_torch_to_flax(
                sd, self.params[module_key], verbose=True
            )
            self.has_pretrained = True
        for name in ("clip_vision", "clip_text"):
            p = os.path.join(root, name + ".bin")
            if os.path.exists(p):
                sd = load_torch_state_dict(p)
                self.params[name] = port_torch_to_flax(sd, self.params[name])

    # ------------------------------------------------------------------
    def get_text_embeds(self, prompts, negative_prompts) -> jnp.ndarray:
        """[uncond; cond] embeddings [2, 77, D] (reference: sd.py:68-85)."""
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        nids = jnp.asarray(self.tokenizer(list(negative_prompts)))
        emb = self.text_encoder.apply(
            {"params": self.params["text"]}, ids
        )["last_hidden_state"]
        nemb = self.text_encoder.apply(
            {"params": self.params["text"]}, nids
        )["last_hidden_state"]
        return jnp.concatenate([nemb, emb], axis=0)

    def clip_text_embeds(self, text: str) -> jnp.ndarray:
        """Pooled ViT-B/16 text feature for the text-CLIP loss."""
        ids = jnp.asarray(self.tokenizer([text]))
        return self.clip_text.apply(
            {"params": self.params["clip_text"]}, ids
        )["pooled"][0]

    # ------------------------------------------------------------------
    def _encode_image_feature(self, gparams, rgb):
        """rgb [H, W, 3] in [0,1] -> pooled CLIP vision feature."""
        x = clip_preprocess(rgb[None], self.clip_image_size)
        return self.clip_vision.apply(
            {"params": gparams["clip_vision"]}, x
        )["pooled"][0]

    def clip_losses(self, pred_rgb, gt_rgb, text_pooled, gparams=None):
        """-cos(pred, ref_img) - cos(pred, text) (reference:
        utils.py:436-453,561-563)."""
        gparams = gparams if gparams is not None else self.params
        zp = self._encode_image_feature(gparams, pred_rgb)
        zg = self._encode_image_feature(gparams, gt_rgb)
        zp = zp / jnp.linalg.norm(zp)
        zg = zg / jnp.linalg.norm(zg)
        zt = text_pooled / jnp.linalg.norm(text_pooled)
        return -jnp.sum(zp * zg) - jnp.sum(zp * zt)

    # ------------------------------------------------------------------
    def train_step_loss(
        self,
        key: jax.Array,
        text_z: jnp.ndarray,        # [2, 77, D]
        pred_rgb: jnp.ndarray,      # [512, 512, 3] in [0, 1], grads flow
        ref_rgb: jnp.ndarray,       # [512, 512, 3]
        is_large,                   # traced 0/1
        guidance_scale: float = 10.0,
        text_pooled: Optional[jnp.ndarray] = None,  # ViT-B/16 text feature
        gparams: Optional[Dict[str, Any]] = None,
    ) -> jnp.ndarray:
        """One guidance step as a scalar loss (reference: sd.py:117-174)."""
        gparams = gparams if gparams is not None else self.params
        sch = self.scheduler
        k_t, k_noise, k_vae = jax.random.split(key, 3)

        img = pred_rgb
        if img.shape[0] != self.image_size:
            from ..training.losses import resize_bilinear

            img = resize_bilinear(img, (self.image_size, self.image_size),
                                  align_corners=False)
        t = jax.random.randint(k_t, (), self.min_step, self.max_step + 1)

        # VAE encode WITH gradient (reference: sd.py:131-133)
        latents = self.vae.apply(
            {"params": gparams["vae"]}, 2.0 * img[None] - 1.0, k_vae,
            method="encode",
        )

        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        latents_noisy = sch.add_noise(jax.lax.stop_gradient(latents), noise, t)

        # CFG epsilon prediction, no grad (reference: sd.py:138-151)
        lat2 = jnp.concatenate([latents_noisy, latents_noisy], axis=0)
        eps = self.unet.apply(
            {"params": gparams["unet"]}, lat2,
            jnp.full((2,), t, jnp.int32), text_z,
        )
        eps = jax.lax.stop_gradient(eps)
        eps_uncond, eps_text = eps[0:1], eps[1:2]
        eps_pred = eps_text + guidance_scale * (eps_text - eps_uncond)

        use_denoise = jnp.logical_and(
            is_large < 0.5,
            (t.astype(jnp.float32) / sch.num_train_timesteps) <= 0.4,
        )

        def denoise_branch(_):
            # one DDIM step -> decode -> CLIP losses x10. Entirely under
            # stop_gradient: the reference computes this branch inside
            # torch.no_grad (sd.py:138-162 + decode_latents:205), so its
            # contribution to the parameter gradient is exactly zero.
            de_latents = sch.step(eps_pred, t, latents_noisy)
            imgs = self.vae.apply(
                {"params": gparams["vae"]}, de_latents, method="decode"
            )
            imgs = jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)[0]
            imgs = jax.lax.stop_gradient(imgs)
            zi = self._encode_image_feature(gparams, imgs)
            zr = self._encode_image_feature(gparams, ref_rgb)
            zi = zi / jnp.linalg.norm(zi)
            zr = zr / jnp.linalg.norm(zr)
            l = 10.0 * (-jnp.sum(zi * zr))  # img CLIP (sd.py:158)
            if text_pooled is not None:     # text CLIP (sd.py:159)
                zt = text_pooled / jnp.linalg.norm(text_pooled)
                l = l + 10.0 * (-jnp.sum(zi * zt))
            return jax.lax.stop_gradient(l)

        def sds_grad_branch(_):
            w = sch.sds_weight(t)
            # d(loss)/d(latents) == grad  =>  same update as the
            # reference's latents.backward(gradient=grad). f32 pinned so
            # both lax.cond branches agree under bf16 towers.
            return jnp.nan_to_num(
                w * (eps_pred - noise)).astype(jnp.float32)

        # The guidance result splits into (a) a gradient-carrying bilinear
        # term sum(latents * g_const) and (b) a stop-grad scalar; both
        # constants are checkpoint_name-tagged so a rematerialized
        # backward (make_multiview_step's save_only_these_names policy)
        # keeps them as residuals: the 2x UNet CFG forward, the DDIM
        # decode, and the denoise-branch CLIP towers are all dead code in
        # the recompute graph — only the render + VAE encode chain (the
        # part that actually carries gradient) is recomputed. Loss value
        # and gradients are bitwise those of the single lax.cond form.
        g_const = jax.lax.cond(
            use_denoise,
            lambda _: jnp.zeros_like(latents, dtype=jnp.float32),
            sds_grad_branch, None)
        g_const = checkpoint_name(
            jax.lax.stop_gradient(g_const), "sds_const")
        d_loss = jax.lax.cond(
            use_denoise,
            lambda o: denoise_branch(o).astype(jnp.float32),
            lambda _: jnp.zeros((), jnp.float32), None)
        d_loss = checkpoint_name(
            jax.lax.stop_gradient(d_loss), "sds_const")
        return jnp.sum(latents * g_const) + d_loss

    # ------------------------------------------------------------------
    def produce_latents(self, key, text_z, height=None, width=None,
                        num_inference_steps=50, guidance_scale=7.5,
                        latents=None, gparams=None):
        """Full text-to-image DDIM sampler (reference: sd.py:176-199)."""
        gparams = gparams if gparams is not None else self.params
        lh = (height or self.image_size) // self.latent_factor
        lw = (width or self.image_size) // self.latent_factor
        if latents is None:
            latents = jax.random.normal(key, (1, lh, lw, 4))
        ts = self.scheduler.timesteps(num_inference_steps)

        def body(lat, t):
            lat2 = jnp.concatenate([lat, lat], axis=0)
            eps = self.unet.apply(
                {"params": gparams["unet"]}, lat2,
                jnp.full((2,), t, jnp.int32), text_z,
            )
            e_un, e_tx = eps[0:1], eps[1:2]
            e = e_tx + guidance_scale * (e_tx - e_un)
            lat = self.scheduler.step(e, t, lat, num_inference_steps)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, jnp.asarray(ts))
        return latents

    def decode_latents(self, latents, gparams=None):
        gparams = gparams if gparams is not None else self.params
        imgs = self.vae.apply({"params": gparams["vae"]}, latents,
                              method="decode")
        return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)

    def prompt_to_img(self, prompt, negative="", num_inference_steps=50,
                      guidance_scale=7.5, seed=0):
        """reference: sd.py:222-238 (and the __main__ smoke bench)."""
        text_z = self.get_text_embeds([prompt], [negative])
        key = jax.random.PRNGKey(seed)
        latents = self.produce_latents(
            key, text_z, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
        )
        return np.asarray(self.decode_latents(latents))


if __name__ == "__main__":
    # standalone guidance smoke bench (reference: nerf/sd.py:241-268):
    #   python -m makeit3d_tpu.guidance.sd "a photo of a corgi" --seeds 1
    import argparse

    from ..utils.workspace import save_image_u8

    parser = argparse.ArgumentParser()
    parser.add_argument("prompt", type=str)
    parser.add_argument("--negative", default="", type=str)
    parser.add_argument("--workspace", default="", type=str)
    parser.add_argument("--sd_version", type=str, default="2.0",
                        choices=["1.5", "2.0"])
    parser.add_argument("--seeds", type=int, default=1)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--sd_weights", type=str, default=None,
                        help="local diffusers-layout weight dir")
    parser.add_argument("--tiny", action="store_true",
                        help="miniature random towers (smoke)")
    opt = parser.parse_args()

    outdir = os.path.join("test_bench", opt.workspace)
    os.makedirs(outdir, exist_ok=True)

    sd = StableDiffusionGuidance(sd_version=opt.sd_version,
                                 weights_root=opt.sd_weights, tiny=opt.tiny)
    for seed in range(opt.seeds):
        imgs = sd.prompt_to_img(opt.prompt, opt.negative,
                                num_inference_steps=opt.steps, seed=seed)
        save_image_u8(
            os.path.join(outdir,
                         opt.prompt.replace(" ", "_") + f"_{seed}.png"),
            imgs[0],
        )
        print(f"seed {seed} -> {outdir}")
