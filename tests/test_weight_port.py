"""Weight porting (models/sd/weights.py): torch state-dict keys must land
on the right flax leaves — especially plain params like CLIP's
position_embedding, which a weight-suffix-only candidate list silently
dropped (random pos-embeds corrupt every prompt embedding)."""

import jax
import jax.numpy as jnp
import numpy as np

from makeit3d_tpu.models.sd.clip import CLIPTextConfig, CLIPTextModel
from makeit3d_tpu.models.sd.weights import port_torch_to_flax


def test_clip_text_port_covers_position_embedding():
    cfg = CLIPTextConfig(vocab_size=64, width=16, layers=1, heads=2,
                         context_length=8)
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]

    rng = np.random.default_rng(0)
    tok = rng.standard_normal((64, 16)).astype(np.float32)
    pos = rng.standard_normal((8, 16)).astype(np.float32)
    torch_sd = {
        "text_model.embeddings.token_embedding.weight": tok,
        "text_model.embeddings.position_embedding.weight": pos,
    }
    ported = port_torch_to_flax(torch_sd, params)

    flat = {
        tuple(getattr(p, "key", str(p)) for p in path): leaf
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(ported)[0]
    }
    tok_keys = [k for k in flat if "token_embedding" in k]
    pos_keys = [k for k in flat if k[-1] == "position_embedding"]
    assert tok_keys and pos_keys
    np.testing.assert_allclose(np.asarray(flat[tok_keys[0]]), tok)
    np.testing.assert_allclose(np.asarray(flat[pos_keys[0]]), pos)


def test_linear_and_norm_mapping():
    cfg = CLIPTextConfig(vocab_size=64, width=16, layers=1, heads=2,
                         context_length=8)
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # pick any Dense kernel leaf and its parent path
    kernel_path = next(
        tuple(getattr(p, "key", str(p)) for p in path)
        for path, leaf in flat
        if tuple(getattr(p, "key", str(p)) for p in path)[-1] == "kernel"
    )
    torch_key = ".".join(kernel_path[:-1]) + ".weight"
    shape = None
    for path, leaf in flat:
        if tuple(getattr(p, "key", str(p)) for p in path) == kernel_path:
            shape = leaf.shape
    w = np.arange(shape[0] * shape[1], dtype=np.float32).reshape(
        shape[1], shape[0])  # torch stores [out, in]
    ported = port_torch_to_flax({torch_key: w}, params)
    got = ported
    for k in kernel_path:
        got = got[k]
    np.testing.assert_allclose(np.asarray(got), w.T)


def test_vae_encoder_tensors_port():
    """Regression: an unconditional drop of 'encoder' path segments (a
    transformers-CLIP flattening hack) orphaned EVERY diffusers
    encoder.* tensor — the flax VAE encoder silently kept its random
    init while the decoder ported fine. Caught via the SDS grad-parity
    fixture's diverging latents."""
    from makeit3d_tpu.models.sd.vae import AutoencoderKL

    vae = AutoencoderKL(block_out_channels=(32, 64))
    params = vae.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 3)),
                      jax.random.PRNGKey(1))["params"]

    rng = np.random.default_rng(0)
    conv = rng.standard_normal((32, 3, 3, 3)).astype(np.float32)  # OIHW
    norm = rng.standard_normal((32,)).astype(np.float32)
    torch_sd = {
        "encoder.conv_in.weight": conv,
        "encoder.down_blocks_0_resnets_0.norm1.weight": norm,
        # diffusers dotted-numeric form must land on the same leaves
        "encoder.down_blocks.0.resnets.1.norm1.weight": norm * 2.0,
    }
    ported = port_torch_to_flax(torch_sd, params)
    np.testing.assert_allclose(
        np.asarray(ported["encoder"]["conv_in"]["kernel"]),
        conv.transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(
            ported["encoder"]["down_blocks_0_resnets_0"]["norm1"]["scale"]),
        norm)
    np.testing.assert_allclose(
        np.asarray(
            ported["encoder"]["down_blocks_0_resnets_1"]["norm1"]["scale"]),
        norm * 2.0)
