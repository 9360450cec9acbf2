"""CLIP-only guidance (the --guidance clip alternative).

reference: nerf/clip.py:9-46. Note the reference's CLIP path is
vestigial and would not actually run (Trainer calls train_step with
StableDiffusion-specific kwargs, nerf/utils.py:516 vs clip.py:37);
here it plugs into the same guidance interface as the SD guidance and
works: the "SDS" slot becomes a plain -cos(image, text) score.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.sd.clip import (
    CLIPTextModel,
    CLIPVisionModel,
    VIT_B16,
    clip_preprocess,
)
from ..models.sd.tokenizer import CLIPTokenizer


class CLIPGuidance:
    def __init__(self, weights_root: Optional[str] = None, seed: int = 0,
                 tiny: bool = False):
        if tiny:
            from .sd import _tiny_clip

            t_cfg, v_cfg = _tiny_clip()
        else:
            t_cfg, v_cfg = VIT_B16
        self.clip_text = CLIPTextModel(t_cfg)
        self.clip_vision = CLIPVisionModel(v_cfg)
        self.clip_image_size = v_cfg.image_size
        self.tokenizer = CLIPTokenizer()
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.params: Dict[str, Any] = {
            "clip_text": self.clip_text.init(
                k1, jnp.zeros((1, 77), jnp.int32))["params"],
            "clip_vision": self.clip_vision.init(
                k2, jnp.zeros((1, v_cfg.image_size, v_cfg.image_size, 3))
            )["params"],
        }
        if weights_root:
            import os

            from ..models.sd.weights import load_torch_state_dict, port_torch_to_flax

            for name in ("clip_vision", "clip_text"):
                p = os.path.join(weights_root, name + ".bin")
                if os.path.exists(p):
                    sd = load_torch_state_dict(p)
                    self.params[name] = port_torch_to_flax(sd, self.params[name])

    def get_text_embeds(self, prompts, negative_prompts=None) -> jnp.ndarray:
        """Normalized pooled text features (negative prompt ignored,
        reference: clip.py:26-34)."""
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        z = self.clip_text.apply({"params": self.params["clip_text"]}, ids)[
            "pooled"
        ]
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def clip_text_embeds(self, text: str) -> jnp.ndarray:
        return self.get_text_embeds([text])[0]

    def _img_feature(self, gparams, rgb):
        x = clip_preprocess(rgb[None], self.clip_image_size)
        z = self.clip_vision.apply(
            {"params": gparams["clip_vision"]}, x)["pooled"][0]
        return z / jnp.linalg.norm(z)

    def clip_losses(self, pred_rgb, gt_rgb, text_pooled, gparams=None):
        gparams = gparams if gparams is not None else self.params
        zp = self._img_feature(gparams, pred_rgb)
        zg = self._img_feature(gparams, gt_rgb)
        zt = text_pooled / jnp.linalg.norm(text_pooled)
        return -jnp.sum(zp * zg) - jnp.sum(zp * zt)

    def train_step_loss(self, key, text_z, pred_rgb, ref_rgb, is_large,
                        guidance_scale=10.0, text_pooled=None, gparams=None):
        """reference: clip.py:37-46 — image/text cosine score."""
        gparams = gparams if gparams is not None else self.params
        zp = self._img_feature(gparams, pred_rgb)
        zt = text_z[0] if text_z.ndim > 1 else text_z
        zt = zt / jnp.linalg.norm(zt)
        return -jnp.sum(zp * zt)
