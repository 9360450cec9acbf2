"""Attention implementation dispatch (models/sd/layers.scaled_attention).

The SDS towers' attention dispatches between the einsum reference
formulation and the Pallas flash kernel per call site
(docs/TPU_NOTES.md 2026-08-19: the kernel wins only on the VAE
mid-block's single-head d=512 shape; the UNet's d=64 heads stay on
einsum). These tests pin the einsum path's math and the eligibility
gate; kernel-vs-einsum numerical parity on real shapes is measured on
TPU by scripts/probe_attention.py (max_abs_diff ~1e-3 in bf16).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makeit3d_tpu.models.sd import layers as L


def naive_attention(q, k, v, scale):
    """softmax(q k^T * scale) v in f64, one head at a time."""
    B, N, h, d = q.shape
    M = k.shape[1]
    out = np.zeros((B, N, h, d))
    qf, kf, vf = (np.asarray(a, np.float64) for a in (q, k, v))
    for b in range(B):
        for hh in range(h):
            s = qf[b, :, hh] @ kf[b, :, hh].T * scale
            s = np.exp(s - s.max(-1, keepdims=True))
            s /= s.sum(-1, keepdims=True)
            out[b, :, hh] = s @ vf[b, :, hh]
    return out.reshape(B, N, h * d)


@pytest.mark.parametrize("B,N,M,h,d", [(2, 16, 16, 4, 8), (1, 8, 24, 1, 32)])
def test_einsum_path_matches_naive(B, N, M, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, N, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, M, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, M, h, d)), jnp.float32)
    scale = 1.0 / math.sqrt(d)
    L.set_attention_impl("einsum")
    try:
        got = np.asarray(L.scaled_attention(q, k, v, scale, jnp.float32))
    finally:
        L.set_attention_impl("auto")
    want = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_eligibility_gate():
    L.set_attention_impl("einsum")
    try:
        assert not L._flash_eligible(4096, 4096, 512)
    finally:
        L.set_attention_impl("auto")
    L.set_attention_impl("flash")
    try:
        assert L._flash_eligible(7, 5, 3)  # forced: kernel asserts later
    finally:
        L.set_attention_impl("auto")
    if jax.default_backend() != "tpu":
        # auto never picks the TPU kernel off-TPU
        assert not L._flash_eligible(4096, 4096, 512)
    else:
        assert L._flash_eligible(4096, 4096, 512)   # VAE mid-block
        assert not L._flash_eligible(4096, 4096, 64)   # UNet heads: einsum
        assert not L._flash_eligible(4096, 77, 512)    # text cross-attn
        assert not L._flash_eligible(256, 256, 512)    # too small to win


def test_impl_setter_rejects_unknown():
    with pytest.raises(AssertionError):
        L.set_attention_impl("fused")
    assert L.get_attention_impl() == "auto"
