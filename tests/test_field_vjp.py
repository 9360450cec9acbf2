"""Custom-VJP chunked field evaluators must match plain autodiff.

The chunked evaluators (models/field.py _chunked_field_vjp) replace
jax.checkpoint-based remat with a hand-rolled VJP that replays chunks
from materialized position residuals — a workaround for a v5e Mosaic
miscompile (see the docstring there). These tests pin the numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.config import Config
from makeit3d_tpu.models.field import (
    SHADING_LAMBERTIAN,
    apply_field,
    apply_field_chunked,
    make_field,
    sigma_albedo_normal,
    sigma_albedo_normal_chunked,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(guidance="none", hash_levels=4, log2_hashmap_size=12)
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    # Scale the hash table away from its tiny U(-1e-4, 1e-4) init: at init
    # the finite-difference sigma deltas are ~1e-6 and safe_normalize's
    # derivative there is enormous and chaotic, which makes ANY two
    # gradient evaluation orders disagree (autodiff vs autodiff vs
    # numerical all differ). A trained-scale table keeps normals
    # well-conditioned so the comparison is meaningful.
    params = jax.tree.map(
        lambda a: a * 1e3 if a.ndim == 3 else a, params
    )
    M = 1024
    x = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (M, 3))
    ct = jax.random.normal(jax.random.PRNGKey(3), (M,))
    return field, params, x, d, ct


def _assert_tree_close(g1, g2):
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5 * scale)


def test_apply_field_chunked_grads_match(setup):
    field, params, x, d, ct = setup
    ld = jnp.asarray([0.0, 0.0, -1.0])

    def loss_ref(p):
        s, c, n = apply_field(field, p, x, d, ld, 0.3, SHADING_LAMBERTIAN)
        return jnp.sum(s * ct) + jnp.sum(c * 1.7) + jnp.sum(n * 0.3)

    def loss_chunked(p):
        s, c, n = apply_field_chunked(field, p, x, d, ld, 0.3,
                                      SHADING_LAMBERTIAN, chunk=256)
        return jnp.sum(s * ct) + jnp.sum(c * 1.7) + jnp.sum(n * 0.3)

    v1, g1 = jax.value_and_grad(loss_ref)(params)
    v2, g2 = jax.value_and_grad(loss_chunked)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    _assert_tree_close(g1, g2)


def test_sigma_albedo_normal_chunked_grads_match(setup):
    field, params, x, d, ct = setup

    def l_ref(p):
        s, a, n = sigma_albedo_normal(field, p, x)
        return jnp.sum(s * ct) + jnp.sum(a) + jnp.sum(n * 0.3)

    def l_chunked(p):
        s, a, n = sigma_albedo_normal_chunked(field, p, x, chunk=256)
        return jnp.sum(s * ct) + jnp.sum(a) + jnp.sum(n * 0.3)

    v1, g1 = jax.value_and_grad(l_ref)(params)
    v2, g2 = jax.value_and_grad(l_chunked)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    _assert_tree_close(g1, g2)


def test_chunked_with_padding_tail(setup):
    """M not a multiple of chunk: the pad must not leak into outputs/grads."""
    field, params, x, d, ct = setup
    x2, d2, ct2 = x[:1000], d[:1000], ct[:1000]
    ld = jnp.asarray([0.0, 0.0, -1.0])

    def loss(chunk):
        def f(p):
            s, c, n = apply_field_chunked(field, p, x2, d2, ld, 1.0,
                                          SHADING_LAMBERTIAN, chunk=chunk)
            return jnp.sum(s * ct2) + jnp.sum(c)
        return f

    v1, g1 = jax.value_and_grad(loss(2048))(params)  # single-shot path
    v2, g2 = jax.value_and_grad(loss(256))(params)   # padded chunked path
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    _assert_tree_close(g1, g2)


def test_unshaded_matches_albedo_shading(setup):
    """shaded=False (no FD probes, reference network_tcnn.py:141-144)
    must produce the same sigma/color values and gradients as the shaded
    program evaluated in ALBEDO mode."""
    from makeit3d_tpu.models.field import SHADING_ALBEDO

    field, params, x, d, ct = setup
    ld = jnp.asarray([0.0, 0.0, -1.0])

    def loss_shaded(p):
        s, c, n = apply_field_chunked(field, p, x, d, ld, 1.0,
                                      SHADING_ALBEDO, chunk=256)
        return jnp.sum(s * ct) + jnp.sum(c * 1.7)

    s_, c_, n_ = apply_field_chunked(field, params, x, d, ld, 1.0,
                                     SHADING_ALBEDO, chunk=256,
                                     shaded=False)
    assert np.allclose(np.asarray(n_), 0.0)

    def loss_albedo(p):
        s, c, n = apply_field_chunked(field, p, x, d, ld, 1.0,
                                      SHADING_ALBEDO, chunk=256,
                                      shaded=False)
        return jnp.sum(s * ct) + jnp.sum(c * 1.7)

    v1, g1 = jax.value_and_grad(loss_shaded)(params)
    v2, g2 = jax.value_and_grad(loss_albedo)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    _assert_tree_close(g1, g2)


def test_bf16_field_close_to_f32():
    """--fp16 (bf16 MLP compute) must track the f32 field loosely: same
    params (f32), outputs within bf16 tolerance."""
    from makeit3d_tpu.models.field import make_field

    cfg32 = Config(guidance="none", hash_levels=4, log2_hashmap_size=12)
    cfg16 = cfg32.replace(fp16=True)
    f32 = make_field(cfg32)
    f16 = make_field(cfg16)
    key = jax.random.PRNGKey(0)
    params = f32.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    # params are f32 in both (param_dtype default); reuse across fields
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1,
                           maxval=1)
    d32 = f32.apply(params, x, method="density")
    d16 = f16.apply(params, x, method="density")
    assert d16["sigma"].dtype == jnp.float32  # output cast back
    np.testing.assert_allclose(
        np.asarray(d16["albedo"]), np.asarray(d32["albedo"]), atol=0.03
    )
    s32, s16 = np.asarray(d32["sigma"]), np.asarray(d16["sigma"])
    np.testing.assert_allclose(s16, s32, rtol=0.1, atol=0.05)


def test_safe_normalize_extreme_magnitudes():
    """Normals must stay unit (or zero) for any FD-delta magnitude —
    an exploded field (sigma ~ 1e23) used to produce 1e7-magnitude
    "normals" through the old sum-sq clip."""
    from makeit3d_tpu.models.field import safe_normalize

    x = jnp.asarray([
        [1e23, -2e23, 0.5e23],
        [1e-18, 2e-18, -1e-18],
        [0.0, 0.0, 0.0],
        [1.0, 2.0, -2.0],
        [np.inf, 1.0, 0.0],
    ])
    n = np.asarray(safe_normalize(x))
    norms = np.linalg.norm(np.nan_to_num(n), axis=-1)
    assert abs(norms[0] - 1.0) < 1e-5
    assert abs(norms[1] - 1.0) < 1e-5
    assert norms[2] == 0.0
    assert abs(norms[3] - 1.0) < 1e-5
    # inf rows become NaN and are cleaned by the callers' nan_to_num
    assert norms[4] <= 1.0 + 1e-5

    # gradient stays finite at normal magnitudes
    g = jax.grad(lambda v: jnp.sum(safe_normalize(v)))(
        jnp.asarray([[0.3, -0.4, 0.5]]))
    assert np.all(np.isfinite(np.asarray(g)))
