"""MLP field backbones (vanilla parity + fourier TPU flagship).

vanilla: reference nerf/network.py parity tier. fourier: the MXU-native
flagship — same math family, MXU-aligned width, bf16 matmuls, analytic
normals (docs/TPU_NOTES.md "scatter ceiling" rationale). Round-1 never
trained an MLP backbone through the Trainer (VanillaField lacked
__call__, so Trainer.init crashed); these tests pin the whole path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.config import Config

CFG_KW = dict(
    h=24, w=24,
    max_steps=64,
    train_samples_per_ray=16,
    eval_samples_per_ray=16,
    grid_size=32,
    albedo_iters=0,
    diff_iters=10_000,
    iters=50,
    guidance="none",
)


@pytest.mark.parametrize("backbone", ["vanilla", "fourier"])
def test_mlp_backbone_trains(tmp_path, backbone):
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(workspace=str(tmp_path), backbone=backbone,
                 mlp_hidden=32, mlp_layers=3, mlp_multires=4, **CFG_KW)
    tr = Trainer(cfg, workspace=cfg.workspace, use_checkpoint="scratch",
                 seed=3)
    # pin the host shading draw to the lambertian branch so step() takes
    # the shaded (normal-computing) program
    tr._host_rng = type("R", (), {"random": staticmethod(lambda: 0.45)})()
    from makeit3d_tpu.cameras import ViewSampler

    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=8,
                          seed=0)
    losses = []
    for i in range(4):
        metrics, _ = tr.step(sampler.get(i))
        losses.append(float(np.asarray(metrics["loss"])))
    assert np.isfinite(losses).all()


def test_fourier_analytic_normals_unit_and_differentiable():
    """Analytic normals are unit-norm and the orient-style loss
    backprops into the MLP params (reference network.py:186-191
    create_graph=True equivalence)."""
    from makeit3d_tpu.models.field import make_field, sigma_albedo_normal

    cfg = Config(backbone="fourier", mlp_hidden=32, mlp_layers=3,
                 mlp_multires=4)
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    x = jax.random.uniform(key, (64, 3), minval=-0.8, maxval=0.8)

    sigma, albedo, normal = sigma_albedo_normal(field, params, x)
    assert sigma.shape == (64,)
    n = np.linalg.norm(np.asarray(normal), axis=-1)
    # safe_normalize leaves near-zero gradients at ~0 norm; elsewhere 1
    assert ((np.abs(n - 1) < 1e-4) | (n < 1e-3)).all()

    def loss(p):
        _, _, nrm = sigma_albedo_normal(field, p, x)
        return jnp.sum(nrm[:, 2] ** 2)  # orient-like: depends on normals

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_fourier_mxu_alignment():
    """The flagship's Dense layers are MXU-tile aligned (width % 128 == 0
    at the production config)."""
    cfg = Config(backbone="fourier")
    assert cfg.mlp_hidden % 128 == 0
