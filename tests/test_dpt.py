"""DPT-hybrid parity tests: flax port vs torch (HF transformers) on a tiny
random model, plus key-mapping round trips.

The torch reference here is transformers' DPTForDepthEstimation(is_hybrid)
— the converted form of the reference checkpoint layout
(DPT/dpt/models.py DPTDepthModel, dpt_hybrid-midas-501f0c75.pt).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from makeit3d_tpu.models.dpt import (
    DPTConfig,
    DPTDepthModel,
    interpolate_bilinear,
    interpolate_bicubic_align,
    midas_to_hf_keys,
    port_hf_dpt,
)


def _tiny_torch_model():
    from transformers import DPTConfig as HFDPTConfig
    from transformers import DPTForDepthEstimation
    from transformers.models.bit import BitConfig

    bit = BitConfig(
        num_channels=3, embedding_size=8, hidden_sizes=[8, 16, 32],
        depths=[1, 1, 1], layer_type="preactivation", hidden_act="relu",
        num_groups=2, global_padding="SAME", embedding_dynamic_padding=True,
        out_features=["stage1", "stage2", "stage3"],
    )
    cfg = HFDPTConfig(
        is_hybrid=True, backbone_config=bit, image_size=64, patch_size=16,
        hidden_size=16, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=32, backbone_out_indices=[0, 1, 2, 3],
        readout_type="project", neck_hidden_sizes=[8, 16, 16, 16],
        fusion_hidden_size=8, reassemble_factors=[1, 1, 1, 0.5],
        backbone_featmap_shape=[1, 32, 4, 4], neck_ignore_stages=[0, 1],
    )
    torch.manual_seed(0)
    m = DPTForDepthEstimation(cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def ported():
    import jax
    import jax.numpy as jnp

    tm = _tiny_torch_model()
    cfg = DPTConfig.tiny()
    model = DPTDepthModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )["params"]
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = port_hf_dpt(sd, params)
    return tm, model, params


def test_dpt_forward_parity(ported):
    tm, model, params = ported
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()
    out = np.asarray(model.apply({"params": params}, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_port_covers_all_used_keys(ported):
    tm, model, params = ported
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # every torch key except the known-unused ones must land in the tree.
    # (fusion layer 0 = refinenet4 never receives a residual, so torch's
    # residual_layer1 there is dead weight — the reference has the same
    # dead resConfUnit1 in refinenet4, DPT/dpt/models.py:78)
    unused = ("bit.norm.", "dpt.layernorm.", "pooler",
              "fusion_stage.layers.0.residual_layer1.")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        port_hf_dpt(sd, params, verbose=True)
    report = buf.getvalue()
    for k in sd:
        if any(u in k for u in unused):
            continue
        assert k not in report, f"used torch key failed to port: {k}"


def test_bilinear_matches_torch_both_conventions():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 7, 9, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for align in (True, False):
        for oh, ow in ((14, 18), (13, 5), (3, 21)):
            ref = torch.nn.functional.interpolate(
                xt, size=(oh, ow), mode="bilinear", align_corners=align
            ).numpy().transpose(0, 2, 3, 1)
            out = np.asarray(interpolate_bilinear(x, oh, ow, align))
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5,
                                       err_msg=f"align={align} {oh}x{ow}")


def test_bicubic_align_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 12, 12, 1)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(
        xt, size=(32, 32), mode="bicubic", align_corners=True
    ).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(interpolate_bicubic_align(x, 32, 32))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_midas_key_translation_shapes():
    """The MiDaS-layout translator must produce HF keys that port into the
    flax tree (exercised on synthetic tensors with the tiny dims)."""
    # Build a synthetic MiDaS-style state dict for the tiny config.
    sd = {
        "pretrained.model.cls_token": np.zeros((1, 1, 16)),
        "pretrained.model.pos_embed": np.zeros((1, 17, 16)),
        "pretrained.model.patch_embed.proj.weight": np.zeros((16, 32, 1, 1)),
        "pretrained.model.patch_embed.proj.bias": np.zeros((16,)),
        "pretrained.model.patch_embed.backbone.stem.conv.weight":
            np.zeros((8, 3, 7, 7)),
        "pretrained.model.patch_embed.backbone.stages.0.blocks.0.norm1.weight":
            np.zeros((8,)),
        "pretrained.model.blocks.0.attn.qkv.weight": np.zeros((48, 16)),
        "pretrained.model.blocks.0.attn.qkv.bias": np.zeros((48,)),
        "pretrained.model.blocks.0.attn.proj.weight": np.zeros((16, 16)),
        "pretrained.model.blocks.0.mlp.fc1.weight": np.zeros((32, 16)),
        "scratch.layer1_rn.weight": np.zeros((8, 8, 3, 3)),
        "scratch.refinenet4.out_conv.weight": np.zeros((8, 8, 1, 1)),
        "scratch.refinenet3.resConfUnit1.conv1.weight": np.zeros((8, 8, 3, 3)),
        "scratch.refinenet1.resConfUnit2.conv2.bias": np.zeros((8,)),
        "scratch.output_conv.0.weight": np.zeros((4, 8, 3, 3)),
        "pretrained.act_postprocess3.0.project.0.weight": np.zeros((16, 32)),
        "pretrained.act_postprocess3.3.weight": np.zeros((16, 16, 1, 1)),
        "pretrained.act_postprocess4.4.weight": np.zeros((16, 16, 3, 3)),
    }
    hf = midas_to_hf_keys(sd)
    expected = {
        "dpt.embeddings.cls_token",
        "dpt.embeddings.position_embeddings",
        "dpt.embeddings.projection.weight",
        "dpt.embeddings.projection.bias",
        "dpt.embeddings.backbone.bit.embedder.convolution.weight",
        "dpt.embeddings.backbone.bit.encoder.stages.0.layers.0.norm1.weight",
        "dpt.encoder.layer.0.attention.attention.query.weight",
        "dpt.encoder.layer.0.attention.attention.key.bias",
        "dpt.encoder.layer.0.attention.output.dense.weight",
        "dpt.encoder.layer.0.intermediate.dense.weight",
        "neck.convs.0.weight",
        "neck.fusion_stage.layers.0.projection.weight",
        "neck.fusion_stage.layers.1.residual_layer1.convolution1.weight",
        "neck.fusion_stage.layers.3.residual_layer2.convolution2.bias",
        "head.head.0.weight",
        "neck.reassemble_stage.readout_projects.2.0.weight",
        "neck.reassemble_stage.layers.2.projection.weight",
        "neck.reassemble_stage.layers.3.resize.weight",
    }
    assert expected <= set(hf)
    assert hf["dpt.encoder.layer.0.attention.attention.query.weight"].shape == (16, 16)

    # and these keys must actually land in the flax tree
    import jax
    import jax.numpy as jnp

    cfg = DPTConfig.tiny()
    model = DPTDepthModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        port_hf_dpt(hf, params, verbose=True)
    for k in expected:
        assert k not in buf.getvalue(), f"translated key failed to port: {k}"
