"""SD-stack numerical parity vs torch (VERDICT round-1 item 5b).

- CLIP text tower: compared against HF `transformers.CLIPTextModel`
  (the exact class the reference loads, nerf/sd.py:43) at tiny size —
  a genuine third-party reference implementation; weights are random
  torch init ported through models/sd/weights.py.
- UNet/VAE blocks: `diffusers` is NOT installed in this environment,
  so block-level mirrors are assembled here from raw torch.nn
  primitives following diffusers' published block structure
  (ResnetBlock2D / BasicTransformerBlock / GEGLU / VAE attention).
  torch.nn does the heavy lifting, so the conventions that actually
  break weight ports — OIHW->HWIO conv transposes, GroupNorm channel
  grouping, attention head-split order, GEGLU chunk order, padding and
  stride layouts — are cross-checked against an independent framework.

Same pattern as tests/test_dpt.py (torch parity for DPT).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from makeit3d_tpu.models.sd.weights import port_torch_to_flax  # noqa: E402


def _port(torch_module, flax_variables):
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_module.state_dict().items()}
    return {"params": port_torch_to_flax(sd, flax_variables["params"])}


def _nchw(x_nhwc):
    return torch.tensor(np.moveaxis(x_nhwc, -1, 1))


# ---------------------------------------------------------------------------
# CLIP text tower vs transformers
# ---------------------------------------------------------------------------


def test_clip_text_matches_transformers():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from makeit3d_tpu.models.sd.clip import CLIPTextConfig, CLIPTextModel

    width, layers, heads, ctx, vocab = 32, 2, 4, 16, 99
    hf = HFModel(HFConfig(
        vocab_size=vocab, hidden_size=width, intermediate_size=width * 4,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=ctx, hidden_act="quick_gelu",
    )).eval()

    ours = CLIPTextModel(CLIPTextConfig(
        vocab_size=vocab, width=width, layers=layers, heads=heads,
        context_length=ctx, act="quick_gelu", projection_dim=None,
    ))
    ids = np.array([[5, 17, 3, 98, 0, 1, 2, 4, 9, 12, 44, 7, 31, 2, 8, 6],
                    [98, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]],
                   np.int32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    variables = _port(hf, variables)

    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                  ).last_hidden_state.numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(ids))
                     ["last_hidden_state"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# UNet / VAE blocks vs torch.nn mirrors (diffusers block structure)
# ---------------------------------------------------------------------------


class TorchResnetBlock2D(torch.nn.Module):
    """diffusers ResnetBlock2D structure from torch.nn primitives."""

    def __init__(self, cin, cout, temb_dim):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(temb_dim, cout)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (torch.nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = torch.nn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(
            torch.nn.functional.silu(temb))[:, :, None, None]
        h = torch.nn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


def test_resnet_block_matches_torch():
    from makeit3d_tpu.models.sd.layers import ResnetBlock2D

    cin, cout, temb_dim = 32, 64, 48
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, cin)).astype(np.float32)
    temb = rng.standard_normal((2, temb_dim)).astype(np.float32)

    tblock = TorchResnetBlock2D(cin, cout, temb_dim).eval()
    ours = ResnetBlock2D(cout)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(temb))
    variables = _port(tblock, variables)

    with torch.no_grad():
        want = tblock(_nchw(x), torch.tensor(temb)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x),
                                jnp.asarray(temb)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1),
                               rtol=1e-4, atol=1e-5)


class TorchGEGLU(torch.nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = torch.nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * torch.nn.functional.gelu(gate)


class TorchAttention(torch.nn.Module):
    """diffusers Attention: head-major reshape, no-bias qkv."""

    def __init__(self, dim, ctx_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = torch.nn.Linear(dim, inner, bias=False)
        self.to_k = torch.nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = torch.nn.Linear(ctx_dim, inner, bias=False)
        self.to_out_0 = torch.nn.Linear(inner, dim)

    def forward(self, x, context=None):
        context = x if context is None else context
        B, N, _ = x.shape
        M = context.shape[1]
        q = self.to_q(x).view(B, N, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(context).view(B, M, self.heads,
                                    self.dim_head).transpose(1, 2)
        v = self.to_v(context).view(B, M, self.heads,
                                    self.dim_head).transpose(1, 2)
        attn = torch.softmax(
            q @ k.transpose(-1, -2) / self.dim_head ** 0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.to_out_0(out)


class TorchBasicTransformerBlock(torch.nn.Module):
    def __init__(self, dim, ctx_dim, heads, dim_head):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TorchAttention(dim, dim, heads, dim_head)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TorchAttention(dim, ctx_dim, heads, dim_head)
        self.norm3 = torch.nn.LayerNorm(dim, eps=1e-5)
        self.ff = torch.nn.Module()
        self.ff.net_0 = TorchGEGLU(dim, dim * 4)
        self.ff.net_2 = torch.nn.Linear(dim * 4, dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        h = self.ff.net_0(self.norm3(x))
        return x + self.ff.net_2(h)


def test_transformer_block_matches_torch():
    from makeit3d_tpu.models.sd.layers import BasicTransformerBlock

    dim, ctx_dim, heads, dim_head = 32, 24, 4, 8
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, ctx_dim)).astype(np.float32)

    tblock = TorchBasicTransformerBlock(dim, ctx_dim, heads, dim_head).eval()
    ours = BasicTransformerBlock(dim, heads, dim_head, ctx_dim)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(ctx))
    variables = _port(tblock, variables)

    with torch.no_grad():
        want = tblock(torch.tensor(x), torch.tensor(ctx)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TorchVaeAttention(torch.nn.Module):
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


def test_vae_attention_matches_torch():
    from makeit3d_tpu.models.sd.layers import VaeAttention

    channels = 32
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 6, channels)).astype(np.float32)

    tblock = TorchVaeAttention(channels).eval()
    ours = VaeAttention(channels)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = _port(tblock, variables)

    with torch.no_grad():
        want = tblock(_nchw(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1),
                               rtol=1e-4, atol=1e-5)


class TorchDownsample2D(torch.nn.Module):
    """diffusers Downsample2D: stride-2 conv, padding 1."""

    def __init__(self, channels):
        super().__init__()
        self.conv = torch.nn.Conv2d(channels, channels, 3, stride=2,
                                    padding=1)

    def forward(self, x):
        return self.conv(x)


def test_downsample_matches_torch():
    from makeit3d_tpu.models.sd.layers import Downsample2D

    channels = 16
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, channels)).astype(np.float32)

    tblock = TorchDownsample2D(channels).eval()
    ours = Downsample2D(channels)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = _port(tblock, variables)

    with torch.no_grad():
        want = tblock(_nchw(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1),
                               rtol=1e-4, atol=1e-5)
