"""Deferred shading (Config.deferred_shading; renderer.py deferred branch).

The TPU-native variant of the reference's per-sample shading
(network_tcnn.py:156-168) and per-sample orient/smooth regularizers
(nerf/renderer.py:513-524): composite albedo first, then run the normal
chain only at the per-ray surface expectation. These tests pin

  1. albedo-mode equivalence: with shading_mode=albedo the deferred
     program must reproduce the standard path bit-for-bit-ish (the shade
     selector is the identity there, so the only difference is which
     field program ran);
  2. gradient health: the shaded deferred step differentiates to finite,
     nonzero field gradients through both the sigma (composite) and the
     normal (shade/orient/smooth) chains;
  3. the loss surface exists: orient/smooth losses are finite and the
     lambertian image differs from the albedo image (the ray-level shade
     actually did something);
  4. eval/test renders and the field_eval-override (encode-split) path
     ignore the flag.
"""

import dataclasses

import numpy as np

from makeit3d_tpu.config import Config


def _setup(deferred: bool):
    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.models.field import make_field
    from makeit3d_tpu.models.renderer import RenderSettings
    from makeit3d_tpu.ops.grid import init_density_grid

    cfg = Config(h=24, w=24, max_steps=64, train_samples_per_ray=16,
                 grid_size=32, guidance="none", backbone="fourier",
                 mlp_hidden=32, mlp_layers=3, mlp_multires=4,
                 deferred_shading=deferred)
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                        jnp.zeros((8, 3)))
    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    grid = grid._replace(occ=jnp.ones_like(grid.occ))
    v = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=4,
                    seed=0).get(1)
    ro = jnp.asarray(v.rays_o.reshape(-1, 3))
    rd = jnp.asarray(v.rays_d.reshape(-1, 3))
    s = RenderSettings.from_config(cfg, training=True)
    return field, params, grid, ro, rd, s


def _render(field, params, grid, ro, rd, s, mode, key=0):
    import jax

    from makeit3d_tpu.models.renderer import render_occupancy

    return render_occupancy(
        field, params, grid, ro, rd, s, jax.random.PRNGKey(key),
        training=True, shading_mode=mode, ambient_ratio=0.1,
        bg_color=1.0, perturb=False)


def test_albedo_mode_matches_standard_path():
    field, params, grid, ro, rd, s = _setup(deferred=True)
    s_std = dataclasses.replace(s, deferred_shading=False)
    out_d = _render(field, params, grid, ro, rd, s, mode=0)
    out_s = _render(field, params, grid, ro, rd, s_std, mode=0)
    np.testing.assert_allclose(np.asarray(out_d["image"]),
                               np.asarray(out_s["image"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d["depth"]),
                               np.asarray(out_s["depth"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d["weights_sum"]),
                               np.asarray(out_s["weights_sum"]),
                               rtol=1e-4, atol=1e-5)


def test_deferred_losses_and_shade():
    field, params, grid, ro, rd, s = _setup(deferred=True)
    out_alb = _render(field, params, grid, ro, rd, s, mode=0)
    out_lam = _render(field, params, grid, ro, rd, s, mode=1)
    for k in ("loss_orient", "loss_smooth"):
        assert np.isfinite(float(out_lam[k])), k
        assert float(out_lam[k]) >= 0.0, k
    # the ray-level lambertian shade moved the image
    diff = np.abs(np.asarray(out_lam["image"])
                  - np.asarray(out_alb["image"])).max()
    assert diff > 1e-4, f"lambertian deferred shade was a no-op ({diff})"
    # textureless / normal-viz modes stay premultiplied: bg rays (ws~0)
    # must stay at bg_color, not lambert
    out_tex = _render(field, params, grid, ro, rd, s, mode=2)
    ws = np.asarray(out_tex["weights_sum"])
    img = np.asarray(out_tex["image"])
    bg_rows = ws < 1e-3
    if bg_rows.any():
        np.testing.assert_allclose(img[bg_rows], 1.0, atol=1e-3)


def test_deferred_grads_flow_both_chains():
    import jax
    import jax.numpy as jnp

    field, params, grid, ro, rd, s = _setup(deferred=True)

    def loss_fn(p):
        out = _render(field, p, grid, ro, rd, s, mode=1)
        return (jnp.mean(out["image"]) + out["loss_orient"]
                + out["loss_smooth"])

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0.0, "no gradient reached the field parameters"


def test_eval_path_ignores_flag():
    import jax

    from makeit3d_tpu.models.renderer import render_occupancy

    field, params, grid, ro, rd, s = _setup(deferred=True)
    s_eval = dataclasses.replace(s, deferred_shading=True)
    out = render_occupancy(
        field, params, grid, ro, rd, s_eval, jax.random.PRNGKey(0),
        training=False, shading_mode=0, ambient_ratio=1.0,
        bg_color=1.0, perturb=False)
    # eval renders keep the composite normal image (reference
    # renderer.py:547-549) — the deferred branch must not fire
    assert "normal" in out
    assert np.isfinite(np.asarray(out["image"])).all()
