"""DPT-hybrid monocular depth estimation in flax (TPU-native).

From-scratch rebuild of the reference's depth prior (reference:
DPT/dpt/models.py:26-123 DPT/DPTDepthModel, DPT/dpt/vit.py:351-491
_make_vit_b_rn50_backbone, DPT/dpt/blocks.py:175-383 ResidualConvUnit /
FeatureFusionBlock), invoked by main.py:110-124,196-204 at startup to
estimate the reference image's inverse depth. Architecture:

  ResNetV2 ("BiT") convolutional stem and stages with weight-standardized
  SAME-padded convs + GroupNorm(32)/ReLU (pre-activation bottlenecks)
    -> hooks at stage 1 (/4) and stage 2 (/8)          [layer_1, layer_2]
  1x1 projection of the /16 feature map -> ViT-B tokens (+cls, +pos)
  12 transformer blocks -> hooks at blocks 8 and 11    [layer_3, layer_4]
  project-readout + reassemble to /16 and /32 pyramids
  4x RefineNet-style fusion (residual conv units, x2 bilinear upsample)
  monodepth head -> non-negative inverse depth at half input resolution*2

Module names mirror the HuggingFace `DPTForDepthEstimation` state dict
(Intel/dpt-hybrid-midas — itself converted from the reference checkpoint
dpt_hybrid-midas-501f0c75.pt) so pretrained torch weights port
mechanically; `load_midas_state_dict` additionally translates the
reference's original MiDaS key layout. Numerical parity with the torch
implementation is asserted in tests/test_dpt.py on a tiny random model.

Everything runs in NHWC (TPU-native conv layout), f32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    # BiT backbone
    embedding_size: int = 64
    backbone_hidden_sizes: Tuple[int, ...] = (256, 512, 1024)
    backbone_depths: Tuple[int, ...] = (3, 4, 9)
    num_groups: int = 32
    # neck / head
    backbone_out_indices: Tuple[int, ...] = (2, 5, 8, 11)  # blocks [2:] used
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 768, 768)
    fusion_hidden_size: int = 256
    reassemble_factors: Tuple[float, ...] = (1, 1, 1, 0.5)

    @staticmethod
    def tiny() -> "DPTConfig":
        """Miniature config for parity tests against torch."""
        return DPTConfig(
            image_size=64,
            patch_size=16,
            hidden_size=16,
            num_layers=4,
            num_heads=2,
            intermediate_size=32,
            embedding_size=8,
            backbone_hidden_sizes=(8, 16, 32),
            backbone_depths=(1, 1, 1),
            num_groups=2,
            backbone_out_indices=(0, 1, 2, 3),
            neck_hidden_sizes=(8, 16, 16, 16),
            fusion_hidden_size=8,
        )


def _make_div(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# ---------------------------------------------------------------------------
# resize (exact torch F.interpolate bilinear semantics, both conventions)
# ---------------------------------------------------------------------------


def interpolate_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool
) -> jnp.ndarray:
    """[B, H, W, C] -> [B, out_h, out_w, C], matching torch bilinear."""
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x

    def coords(in_size, out_size):
        if align_corners:
            if out_size == 1:
                return jnp.zeros((1,), jnp.float32)
            return jnp.linspace(0.0, in_size - 1.0, out_size)
        c = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (
            in_size / out_size
        ) - 0.5
        return jnp.clip(c, 0.0, in_size - 1.0)

    ys = coords(H, out_h)
    xs = coords(W, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    v = x[:, y0] * (1 - wy) + x[:, y1] * wy          # [B, oh, W, C]
    return v[:, :, x0] * (1 - wx) + v[:, :, x1] * wx  # [B, oh, ow, C]


def interpolate_bicubic_align(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic upsample with align_corners=True (reference main.py:198-203
    upsamples the 384-res prediction to 512 this way). Keys torch's
    a=-0.75 cubic convolution kernel."""
    B, H, W, C = x.shape

    def kernel(t):
        a = -0.75
        at = jnp.abs(t)
        return jnp.where(
            at <= 1.0,
            (a + 2) * at**3 - (a + 3) * at**2 + 1,
            jnp.where(at < 2.0, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
        )

    def axis_resize(v, in_size, out_size, axis):
        if out_size == 1 or in_size == 1:
            reps = [1] * v.ndim
            reps[axis] = out_size
            return jnp.tile(jnp.take(v, jnp.asarray([0]), axis=axis), reps)
        src = jnp.linspace(0.0, in_size - 1.0, out_size)
        i0 = jnp.floor(src).astype(jnp.int32)
        t = src - i0
        out = 0.0
        for k in range(-1, 3):
            idx = jnp.clip(i0 + k, 0, in_size - 1)
            w = kernel(t - k)
            shape = [1] * v.ndim
            shape[axis] = out_size
            out = out + jnp.take(v, idx, axis=axis) * w.reshape(shape)
        return out

    x = axis_resize(x, H, out_h, 1)
    return axis_resize(x, W, out_w, 2)


# ---------------------------------------------------------------------------
# BiT (ResNetV2) backbone pieces
# ---------------------------------------------------------------------------


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    pad = max((math.ceil(size / s) - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


class WSConv(nn.Module):
    """Weight-standardized conv, TF-SAME padding, no bias (reference DPT's
    backbone uses timm StdConv2dSame; HF mirrors it as
    WeightStandardizedConv2d with eps=1e-8)."""

    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel, self.kernel, in_ch, self.features),
        )
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) * jax.lax.rsqrt(var + 1e-8)
        ph = _same_pads(x.shape[1], self.kernel, self.stride)
        pw = _same_pads(x.shape[2], self.kernel, self.stride)
        return jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), [ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PreActBottleneck(nn.Module):
    """BiT pre-activation bottleneck (stride on the 3x3)."""

    out_channels: int
    stride: int = 1
    num_groups: int = 32
    is_first: bool = False

    @nn.compact
    def __call__(self, x):
        def gn_relu(v, name):
            return nn.relu(
                nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                             name=name)(v)
            )

        mid = _make_div(self.out_channels * 0.25)
        preact = gn_relu(x, "norm1")
        shortcut = x
        if self.is_first:
            shortcut = WSConv(self.out_channels, 1, self.stride,
                              name="downsample.conv")(preact)
        h = WSConv(mid, 1, name="conv1")(preact)
        h = WSConv(mid, 3, self.stride, name="conv2")(gn_relu(h, "norm2"))
        h = WSConv(self.out_channels, 1, name="conv3")(gn_relu(h, "norm3"))
        return h + shortcut


class BitBackbone(nn.Module):
    """Stem + 3 stages; returns the three stage outputs (/4, /8, /16)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        cfg = self.cfg
        h = WSConv(cfg.embedding_size, 7, 2, name="embedder.convolution")(x)
        # max pool 3x3/2, zero-padded SAME (matches the torch dynamic pad
        # with value=0 — NOT -inf; border cells see the zeros)
        ph = _same_pads(h.shape[1], 3, 2)
        pw = _same_pads(h.shape[2], 3, 2)
        h = jnp.pad(h, ((0, 0), ph, pw, (0, 0)))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")

        feats = []
        for s, (depth, width) in enumerate(
            zip(cfg.backbone_depths, cfg.backbone_hidden_sizes)
        ):
            stride = 1 if s == 0 else 2
            for b in range(depth):
                h = PreActBottleneck(
                    width,
                    stride=stride if b == 0 else 1,
                    num_groups=cfg.num_groups,
                    is_first=(b == 0),
                    name=f"encoder.stages_{s}.layers_{b}",
                )(h)
            feats.append(h)
        return feats


# ---------------------------------------------------------------------------
# ViT pieces
# ---------------------------------------------------------------------------


class ViTSelfAttention(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x):
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="attention.query")(x)
        k = nn.Dense(self.hidden, name="attention.key")(x)
        v = nn.Dense(self.hidden, name="attention.value")(x)
        B, N, _ = x.shape
        q = q.reshape(B, N, self.heads, hd)
        k = k.reshape(B, N, self.heads, hd)
        v = v.reshape(B, N, self.heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, N, self.hidden)
        return nn.Dense(self.hidden, name="output.dense")(out)


class ViTBlock(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_before")(x)
        x = x + ViTSelfAttention(cfg.hidden_size, cfg.num_heads,
                                 name="attention")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_after")(x)
        h = nn.Dense(cfg.intermediate_size, name="intermediate.dense")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(cfg.hidden_size, name="output.dense")(h)


# ---------------------------------------------------------------------------
# DPT body / neck / head
# ---------------------------------------------------------------------------


class DPTBody(nn.Module):
    """Hybrid embeddings + ViT encoder. Returns
    [stage1 NHWC, stage2 NHWC, tokens@hook3, tokens@hook4]."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        grid = cfg.image_size // cfg.patch_size
        n_pos = grid * grid + 1

        cls_token = self.param(
            "embeddings.cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size)
        )
        pos = self.param(
            "embeddings.position_embeddings",
            nn.initializers.zeros,
            (1, n_pos, cfg.hidden_size),
        )

        feats = BitBackbone(cfg, name="embeddings.backbone.bit")(pixels)
        fmap = feats[-1]  # [B, h, w, C] at /16
        B, fh, fw, _ = fmap.shape

        tokens = nn.Conv(cfg.hidden_size, (1, 1), name="embeddings.projection")(fmap)
        tokens = tokens.reshape(B, fh * fw, cfg.hidden_size)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.hidden_size)), tokens], axis=1
        )
        if fh * fw + 1 != n_pos:
            old = int(math.sqrt(n_pos - 1))
            grid_pos = pos[:, 1:].reshape(1, old, old, cfg.hidden_size)
            grid_pos = interpolate_bilinear(grid_pos, fh, fw, align_corners=False)
            pos = jnp.concatenate(
                [pos[:, :1], grid_pos.reshape(1, fh * fw, cfg.hidden_size)], axis=1
            )
        x = tokens + pos

        hook3, hook4 = cfg.backbone_out_indices[2], cfg.backbone_out_indices[3]
        hooked = {}
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, name=f"encoder.layer_{i}")(x)
            if i == hook3:
                hooked[3] = x
            if i == hook4:
                hooked[4] = x
        return [feats[0], feats[1], hooked[3], hooked[4]]


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: running stats live as params so porting
    torch checkpoints is a straight copy. Used only by the segmentation
    variant (reference: DPT/dpt/blocks.py ResidualConvUnit_custom bn=True)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv + bias


class ResidualConvUnit(nn.Module):
    features: int
    use_bn: bool = False  # seg model: blocks.py:262-271 (bn after each conv)

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1,
                    use_bias=not self.use_bn, name="convolution1")(h)
        if self.use_bn:
            h = FrozenBatchNorm(self.features, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1,
                    use_bias=not self.use_bn, name="convolution2")(h)
        if self.use_bn:
            h = FrozenBatchNorm(self.features, name="bn2")(h)
        return h + x


class FusionLayer(nn.Module):
    """RefineNet-style fusion (reference: DPT/dpt/blocks.py:318-383)."""

    features: int
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = interpolate_bilinear(
                    residual, x.shape[1], x.shape[2], align_corners=False
                )
            x = x + ResidualConvUnit(self.features, use_bn=self.use_bn,
                                     name="residual_layer1")(residual)
        x = ResidualConvUnit(self.features, use_bn=self.use_bn,
                             name="residual_layer2")(x)
        x = interpolate_bilinear(x, x.shape[1] * 2, x.shape[2] * 2,
                                 align_corners=True)
        return nn.Conv(self.features, (1, 1), name="projection")(x)


class DPTNeck(nn.Module):
    cfg: DPTConfig
    use_bn: bool = False

    @nn.compact
    def __call__(self, hidden_states):
        cfg = self.cfg
        grid = None
        out = []
        for i, h in enumerate(hidden_states):
            if i >= 2:
                # tokens -> grid, project-readout (reference: vit.py:79-91)
                cls, tok = h[:, 0], h[:, 1:]
                B, N, C = tok.shape
                g = int(math.sqrt(N))
                readout = jnp.broadcast_to(cls[:, None, :], tok.shape)
                tok = jnp.concatenate([tok, readout], axis=-1)
                tok = nn.Dense(
                    C, name=f"reassemble_stage.readout_projects_{i}_0"
                )(tok)
                tok = nn.gelu(tok, approximate=False)
                h = tok.reshape(B, g, g, C)
                h = nn.Conv(
                    cfg.neck_hidden_sizes[i], (1, 1),
                    name=f"reassemble_stage.layers_{i}.projection",
                )(h)
                if cfg.reassemble_factors[i] < 1:
                    stride = int(1 / cfg.reassemble_factors[i])
                    h = nn.Conv(
                        cfg.neck_hidden_sizes[i], (3, 3), strides=stride,
                        padding=1, name=f"reassemble_stage.layers_{i}.resize",
                    )(h)
            out.append(
                nn.Conv(cfg.fusion_hidden_size, (3, 3), padding=1,
                        use_bias=False, name=f"convs_{i}")(h)
            )

        # fusion, deepest first (reference: models.py:78-81)
        fused = None
        for j, h in enumerate(out[::-1]):
            layer = FusionLayer(cfg.fusion_hidden_size, use_bn=self.use_bn,
                                name=f"fusion_stage.layers_{j}")
            fused = layer(h) if fused is None else layer(fused, h)
        return fused


class DPTHead(nn.Module):
    """Monodepth head (reference: DPT/dpt/models.py:99-107)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        f = self.cfg.fusion_hidden_size
        x = nn.Conv(f // 2, (3, 3), padding=1, name="head_0")(x)
        x = interpolate_bilinear(x, x.shape[1] * 2, x.shape[2] * 2,
                                 align_corners=True)
        x = nn.Conv(32, (3, 3), padding=1, name="head_2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_4")(x)
        x = nn.relu(x)  # non_negative=True (main.py:115)
        return x[..., 0]


class DPTDepthModel(nn.Module):
    """pixels [B, H, W, 3] (normalized) -> inverse depth [B, H, W]."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, pixels):
        hs = DPTBody(self.cfg, name="dpt")(pixels)
        fused = DPTNeck(self.cfg, name="neck")(hs)
        return DPTHead(self.cfg, name="head")(fused)


class DPTSegHead(nn.Module):
    """ADE20K segmentation head (reference: DPT/dpt/models.py:126-145):
    conv3x3 -> BN -> ReLU -> [dropout, inference no-op] -> conv1x1 to
    num_classes -> 2x bilinear upsample (align_corners)."""

    cfg: DPTConfig
    num_classes: int = 150

    @nn.compact
    def __call__(self, x):
        f = self.cfg.fusion_hidden_size
        x = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="head_0")(x)
        x = FrozenBatchNorm(f, name="head_1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), name="head_4")(x)
        return interpolate_bilinear(x, x.shape[1] * 2, x.shape[2] * 2,
                                    align_corners=True)


class DPTSegmentationModel(nn.Module):
    """pixels [B, H, W, 3] (normalized) -> class logits [B, H, W, K].

    Equivalent of the reference's DPTSegmentationModel
    (DPT/dpt/models.py:126-160): the shared DPT body/neck with BatchNorm
    enabled in the fusion blocks and a 150-class ADE20K head. The torch
    auxlayer (:147-153) only feeds the auxiliary training loss and is
    never used at inference; this inference model omits it.
    """

    cfg: DPTConfig
    num_classes: int = 150

    @nn.compact
    def __call__(self, pixels):
        hs = DPTBody(self.cfg, name="dpt")(pixels)
        fused = DPTNeck(self.cfg, use_bn=True, name="neck")(hs)
        return DPTSegHead(self.cfg, self.num_classes, name="head")(fused)


# ---------------------------------------------------------------------------
# weight porting
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=(), norm=()):
    """Yield (original_path, dot-normalized_path, leaf). Flax module names
    here contain dots ("embeddings.backbone.bit"); the normalized path
    splits them so torch-derived paths can match."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,), norm + tuple(k.split(".")))
    else:
        yield prefix, norm, tree


def port_hf_dpt(torch_sd: Dict[str, np.ndarray], params: Dict[str, Any],
                verbose: bool = False) -> Dict[str, Any]:
    """Fill flax DPT params from a HF DPTForDepthEstimation state dict.

    Torch key "a.b.0.c.weight" maps to the flax path a/b_0/c/kernel (numeric
    segments merge, weight->kernel with layout transpose). Keys with no
    flax home (the unused bit.norm / dpt.layernorm / pooler) are skipped.
    """
    index = {}   # normalized path -> (original path, leaf)
    new = {}     # original path -> value
    for orig, norm, leaf in _flatten(params):
        index[norm] = (orig, leaf)
        new[orig] = leaf
    missed = []
    for tkey, val in torch_sd.items():
        segs = tkey.split(".")
        leaf = segs[-1]
        merged: List[str] = []
        for s in segs[:-1]:
            if s.isdigit() and merged:
                merged[-1] = f"{merged[-1]}_{s}"
            else:
                merged.append(s)
        v = np.asarray(val, np.float32)
        if leaf == "weight":
            cands = [tuple(merged) + ("kernel",), tuple(merged) + ("scale",)]
        elif leaf == "bias":
            cands = [tuple(merged) + ("bias",)]
        elif leaf == "running_mean":  # FrozenBatchNorm stats (seg model)
            cands = [tuple(merged) + ("mean",)]
        elif leaf == "running_var":
            cands = [tuple(merged) + ("var",)]
        else:  # cls_token / position_embeddings: plain params
            cands = [tuple(merged) + (leaf,)]
        hit = next((c for c in cands if c in index), None)
        if hit is None:
            missed.append(tkey)
            continue
        orig, target = index[hit]
        if hit[-1] == "kernel":
            if v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            elif v.ndim == 2:
                v = v.T
        if v.shape != np.shape(target):
            missed.append(f"{tkey} shape {v.shape} vs {np.shape(target)}")
            continue
        new[orig] = jnp.asarray(v)
    if verbose and missed:
        print(f"[dpt port] {len(missed)} torch keys unmatched:")
        for m in missed[:10]:
            print("   ", m)

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return new[prefix]

    return rebuild(params)


def midas_to_hf_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Translate the reference checkpoint's key layout
    (dpt_hybrid-midas-501f0c75.pt: pretrained.model.* / scratch.*) to the
    HF layout consumed by port_hf_dpt. The qkv fused projection splits
    into query/key/value."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v, np.float32)
        if k.startswith("pretrained.model.blocks."):
            rest = k[len("pretrained.model.blocks."):]
            i, sub = rest.split(".", 1)
            base = f"dpt.encoder.layer.{i}"
            if sub.startswith("attn.qkv."):
                leaf = sub.split(".")[-1]
                q, kk, vv = np.split(v, 3, axis=0)
                out[f"{base}.attention.attention.query.{leaf}"] = q
                out[f"{base}.attention.attention.key.{leaf}"] = kk
                out[f"{base}.attention.attention.value.{leaf}"] = vv
            elif sub.startswith("attn.proj."):
                out[f"{base}.attention.output.dense.{sub.split('.')[-1]}"] = v
            elif sub.startswith("norm1."):
                out[f"{base}.layernorm_before.{sub.split('.')[-1]}"] = v
            elif sub.startswith("norm2."):
                out[f"{base}.layernorm_after.{sub.split('.')[-1]}"] = v
            elif sub.startswith("mlp.fc1."):
                out[f"{base}.intermediate.dense.{sub.split('.')[-1]}"] = v
            elif sub.startswith("mlp.fc2."):
                out[f"{base}.output.dense.{sub.split('.')[-1]}"] = v
        elif k == "pretrained.model.cls_token":
            out["dpt.embeddings.cls_token"] = v
        elif k == "pretrained.model.pos_embed":
            out["dpt.embeddings.position_embeddings"] = v
        elif k.startswith("pretrained.model.patch_embed.proj."):
            out[f"dpt.embeddings.projection.{k.split('.')[-1]}"] = v
        elif k.startswith("pretrained.model.patch_embed.backbone.stem.conv."):
            out["dpt.embeddings.backbone.bit.embedder.convolution.weight"] = v
        elif k.startswith("pretrained.model.patch_embed.backbone.stages."):
            rest = k[len("pretrained.model.patch_embed.backbone.stages."):]
            s, _, rest = rest.partition(".")   # "0", "blocks.0.norm1.weight"
            rest = rest.replace("blocks.", "layers.", 1)
            parts = rest.split(".")            # layers, b, mod, leaf
            out[
                "dpt.embeddings.backbone.bit.encoder.stages."
                f"{s}.layers.{parts[1]}.{'.'.join(parts[2:])}"
            ] = v
        elif k.startswith("pretrained.act_postprocess3.0.project.0."):
            out[f"neck.reassemble_stage.readout_projects.2.0.{k.split('.')[-1]}"] = v
        elif k.startswith("pretrained.act_postprocess4.0.project.0."):
            out[f"neck.reassemble_stage.readout_projects.3.0.{k.split('.')[-1]}"] = v
        elif k.startswith("pretrained.act_postprocess3.3."):
            out[f"neck.reassemble_stage.layers.2.projection.{k.split('.')[-1]}"] = v
        elif k.startswith("pretrained.act_postprocess4.3."):
            out[f"neck.reassemble_stage.layers.3.projection.{k.split('.')[-1]}"] = v
        elif k.startswith("pretrained.act_postprocess4.4."):
            out[f"neck.reassemble_stage.layers.3.resize.{k.split('.')[-1]}"] = v
        elif k.startswith("scratch.layer") and "_rn." in k:
            n = int(k[len("scratch.layer")])
            out[f"neck.convs.{n - 1}.weight"] = v
        elif k.startswith("scratch.refinenet"):
            n = int(k[len("scratch.refinenet")])
            rest = k.split(".", 2)[-1]  # resConfUnit1.conv1.weight / out_conv...
            j = 4 - n  # refinenet4 fuses first (models.py:78-81)
            base = f"neck.fusion_stage.layers.{j}"
            rest = (
                rest.replace("resConfUnit", "residual_layer")
                .replace("conv1", "convolution1")
                .replace("conv2", "convolution2")
                .replace("out_conv", "projection")
            )
            out[f"{base}.{rest}"] = v
        elif k.startswith("scratch.output_conv."):
            out[f"head.head.{k[len('scratch.output_conv.'):]}"] = v
        # pretrained.model.patch_embed.backbone.norm / .model.norm: unused
    return out


def load_dpt_params(weights_path: str, verbose: bool = False):
    """weights_path: an HF checkpoint file/dir or the original MiDaS .pt.
    Returns (DPTConfig, params)."""
    import os

    from .sd.weights import load_torch_state_dict

    path = weights_path
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    sd = load_torch_state_dict(path)
    if any(k.startswith("pretrained.model.") for k in sd):
        sd = midas_to_hf_keys(sd)
    cfg = DPTConfig()
    model = DPTDepthModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )["params"]
    params = port_hf_dpt(sd, params, verbose=verbose)
    return cfg, params


def load_dpt_seg_params(weights_path: str, num_classes: int = 150,
                        verbose: bool = False):
    """Port a DPTSegmentationModel checkpoint (dpt_hybrid-ade20k-*.pt,
    pretrained.*/scratch.*/auxlayer.* layout). The auxlayer (training-only
    auxiliary head, DPT/dpt/models.py:147-153) is dropped.
    Returns (DPTConfig, params)."""
    import os

    from .sd.weights import load_torch_state_dict

    path = weights_path
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    sd = load_torch_state_dict(path)
    sd = {k: v for k, v in sd.items() if not k.startswith("auxlayer.")}
    if any(k.startswith("pretrained.model.") for k in sd):
        sd = midas_to_hf_keys(sd)
    cfg = DPTConfig()
    model = DPTSegmentationModel(cfg, num_classes=num_classes)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )["params"]
    params = port_hf_dpt(sd, params, verbose=verbose)
    return cfg, params


# ---------------------------------------------------------------------------
# inference entry point (the preprocessing contract of main.py:196-204)
# ---------------------------------------------------------------------------


def dpt_disparity(ori_rgb: np.ndarray, weights_path: str) -> np.ndarray:
    """[1, H, W, 3] RGB in [0, 1] -> [H, W] raw inverse depth.

    Mirrors reference main.py:119-124,196-203: bilinear resize to 384,
    normalize (x - 0.5) / 0.5, DPT forward, bicubic align-corners upsample
    back to the input size. (The reference's min-max normalization +
    median filter live in utils.image.normalize_depth.)
    """
    cfg, params = load_dpt_params(weights_path)
    model = DPTDepthModel(cfg)
    x = jnp.asarray(ori_rgb, jnp.float32)
    H, W = x.shape[1], x.shape[2]
    x = interpolate_bilinear(x, cfg.image_size, cfg.image_size,
                             align_corners=False)
    x = (x - 0.5) / 0.5
    pred = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, x)
    pred = interpolate_bicubic_align(pred[..., None], H, W)
    return np.asarray(pred[0, ..., 0])
