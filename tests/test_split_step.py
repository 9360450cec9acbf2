"""Encode-split train step (training/split_step.py): numerical parity
with the fused single-program step, and the explicit table-gradient
scatter vs autodiff.

The split exists to dodge the axon-v5e fused probes+scatter backward
fault (docs/TPU_NOTES.md); it must be a pure re-partitioning of the
same math.
"""

import jax
import numpy as np
import pytest

from makeit3d_tpu.config import Config


def test_grad_table_matches_autodiff():
    """HashGridEncoder.grad_table == vjp of the forward encode wrt the
    table, including the chunked/padded path."""
    from makeit3d_tpu.ops.encoding import HashGridEncoder

    enc = HashGridEncoder(n_levels=4, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, desired_resolution=32)
    table = enc.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    dfeat = jax.random.normal(jax.random.PRNGKey(2), (257, enc.output_dim))

    _, vjp = jax.vjp(lambda t: enc(t, x), table)
    (want,) = vjp(dfeat)
    got = enc.grad_table(x, dfeat, chunk=64)  # 5 chunks, padded tail
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)
    # the single-scatter-per-chunk formulation computes the same thing
    flat = enc.grad_table_flat(x, dfeat, chunk=64)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


CFG_KW = dict(
    h=32, w=32,
    max_steps=64,
    train_samples_per_ray=16,
    eval_samples_per_ray=16,
    grid_size=32,
    hash_levels=4,
    log2_hashmap_size=12,
    desired_resolution=64,
    # per-sample shading: the encode split cannot take the deferred
    # branch (renderer deferred gate requires the plain evaluators), so
    # fused-vs-split parity is only defined with deferred off (the
    # round-5 default flip broke this test until pinned)
    deferred_shading=False,
    albedo_iters=0,        # novel steps go shaded immediately
    diff_iters=10_000,
    iters=50,
    guidance="none",
)


class _ForceShaded:
    """Pins Trainer's host shading draw to the lambertian branch."""

    @staticmethod
    def random():
        return 0.45


def _make_trainer(ws, split_encode, lambda_smooth):
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(workspace=str(ws), split_encode=split_encode,
                 lambda_smooth=lambda_smooth, **CFG_KW)
    tr = Trainer(cfg, workspace=cfg.workspace, use_checkpoint="scratch",
                 seed=7)
    tr._host_rng = _ForceShaded()
    return tr


def test_split_step_matches_fused(tmp_path):
    """Lockstep novel-view shaded training: fused vs two-program split
    from identical seeds must agree to float32 reassociation noise
    (smooth off — the split clips the smooth center, a documented
    intentional difference covered by the test below)."""
    from makeit3d_tpu.cameras import ViewSampler

    tr_a = _make_trainer(tmp_path / "fused", False, 0.0)
    tr_b = _make_trainer(tmp_path / "split", True, 0.0)
    # same seed -> identical init params
    for a, b in zip(jax.tree.leaves(tr_a.params), jax.tree.leaves(tr_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg = tr_a.cfg
    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=16,
                          seed=1)
    first_metrics = []
    for i in range(3):
        view = sampler.get(2 * i + 1)  # odd index -> novel view
        m_a, _ = tr_a.step(view)
        m_b, _ = tr_b.step(view)
        if i == 0:
            first_metrics = (m_a, m_b)

    m_a, m_b = first_metrics
    assert set(m_a) == set(m_b)
    for k in m_a:
        np.testing.assert_allclose(
            float(m_a[k]), float(m_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} diverged on step 1")

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(tr_a.params),
        jax.tree_util.tree_leaves_with_path(tr_b.params),
    ):
        # Adan's eps-normalized update amplifies f32 reassociation noise
        # on near-zero second moments; observed max rel diff ~8e-3 on
        # <0.01% of table entries after 3 steps
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4,
            err_msg=f"param {jax.tree_util.keystr(pa)} diverged")


def test_split_albedo_step_matches_fused(tmp_path):
    """The ALBEDO-mode encode split (centers only, no probe blocks —
    exists so the table scatter can take the sorted-segment-sum path on
    TPU) is a pure re-partitioning of the fused albedo program."""
    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.training.trainer import Trainer

    kw = dict(CFG_KW, albedo_iters=10_000)  # every step albedo-mode
    trainers = []
    for name, split in (("fused", False), ("split", True)):
        cfg = Config(workspace=str(tmp_path / name), split_encode=split,
                     scatter_impl="vjp" if split else None, **kw)
        tr = Trainer(cfg, workspace=cfg.workspace, use_checkpoint="scratch",
                     seed=7)
        trainers.append(tr)
    tr_a, tr_b = trainers
    # force the albedo split variant to actually build (on CPU the
    # resolve gates would pick the fused program); key = (front, shaded,
    # with_sds)
    from makeit3d_tpu.training.split_step import make_split_encode_step

    tr_b._train_step[(False, False, False)] = make_split_encode_step(
        tr_b.cfg, tr_b.field, tr_b.optimizer, tr_b.settings_train, None,
        is_front=False, with_sds=False, shaded=False)

    sampler = ViewSampler(tr_a.cfg, type="train", H=tr_a.cfg.h,
                          W=tr_a.cfg.w, size=16, seed=1)
    view = sampler.get(1)  # novel view, albedo phase
    m_a, _ = tr_a.step(view)
    m_b, _ = tr_b.step(view)
    assert set(m_a) == set(m_b)
    for k in m_a:
        np.testing.assert_allclose(
            float(m_a[k]), float(m_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} diverged")
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(tr_a.params),
        jax.tree_util.tree_leaves_with_path(tr_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4,
            err_msg=f"param {jax.tree_util.keystr(pa)} diverged")


def test_split_step_updates_table_with_smooth(tmp_path):
    """With the smooth loss ON, the split step runs both probe blocks,
    produces finite metrics, and actually moves the hash table (the
    grad merge finds the table leaf — a silent path-match failure
    would freeze the encoder forever)."""
    from makeit3d_tpu.cameras import ViewSampler

    tr = _make_trainer(tmp_path / "smooth", True, 0.01)
    table_before = np.asarray(tr.params["params"]["hash_table"]).copy()

    cfg = tr.cfg
    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=8,
                          seed=2)
    metrics, _ = tr.step(sampler.get(1))
    assert "loss_smooth" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"

    table_after = np.asarray(tr.params["params"]["hash_table"])
    assert not np.allclose(table_before, table_after), (
        "hash table unchanged after a split step: table gradient merge "
        "is not reaching the optimizer")
