"""2-D data x model mesh (parallel/mesh.make_mesh_2d + shard_mv_tp_step).

The v4-8 scale-out shape for the SDS hot loop: novel views data-parallel
over "data" while the frozen guidance towers tensor-shard over "model"
(BASELINE.md scale-out note; SURVEY §2.3). Validated on the 8-device
virtual CPU mesh as a (2 data) x (4 model) grid with the tiny random
UNet standing in for SD2 (SURVEY §4), through a step function with the
production signature: per-view latents -> UNet -> loss mean over views
-> gradient update of a trainable param.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.models.sd.unet import tiny_unet
from makeit3d_tpu.parallel.mesh import make_mesh_2d, shard_mv_tp_step

BATCH_KEYS = ("latents", "gparams")
VIEW_KEYS = ("latents",)


@pytest.fixture(scope="module")
def setup():
    unet = tiny_unet()
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (4, 16, 16, 4))  # 4 views
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32))
    gparams = unet.init(key, lat[:1], jnp.asarray(500.0), ctx)
    # a trainable scale applied to the latents: its grad flows through
    # the sharded UNet exactly like the field params do through SDS
    params = {"scale": jnp.asarray(1.5)}

    def step_fn(params, opt_state, grid, key, batch):
        def loss(p):
            def per_view(z):
                eps = unet.apply(batch["gparams"], (p["scale"] * z)[None],
                                 jnp.asarray(300.0), ctx)
                return jnp.mean(eps ** 2)

            return jnp.mean(jax.vmap(per_view)(batch["latents"]))

        l, g = jax.value_and_grad(loss)(params)
        new = jax.tree.map(lambda a, b: a - 0.1 * b, params, g)
        return new, opt_state, {"loss": l}, None

    return unet, params, gparams, lat, step_fn


def test_mesh2d_shape():
    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh_2d(4, 4)  # only 8 devices on the test mesh


def test_mv_tp_step_matches_unsharded(setup):
    unet, params, gparams, lat, step_fn = setup
    opt_state, grid, key = (), (), jax.random.PRNGKey(7)
    batch = {"latents": lat, "gparams": gparams}

    want, _, wm, _ = jax.jit(step_fn)(params, opt_state, grid, key, batch)

    mesh = make_mesh_2d(2, 4)
    jitted, b_shard = shard_mv_tp_step(step_fn, mesh, BATCH_KEYS,
                                       VIEW_KEYS, gparams)
    placed = {k: jax.device_put(batch[k], b_shard[k]) for k in batch}
    # views physically split over the data axis, towers over model
    assert any(
        s.data.shape[0] == lat.shape[0] // 2
        for s in placed["latents"].addressable_shards)
    got, _, gm, _ = jitted(params, opt_state, grid, key, placed)

    np.testing.assert_allclose(float(gm["loss"]), float(wm["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["scale"]),
                               np.asarray(want["scale"]), rtol=1e-5)


def test_multiview_step_rejects_model_axis_without_guidance(setup):
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import make_field
    from makeit3d_tpu.models.renderer import RenderSettings
    from makeit3d_tpu.training.optimizer import (
        make_lr_schedule, make_optimizer,
    )
    from makeit3d_tpu.training.trainer import make_multiview_step

    cfg = Config(h=16, w=16, guidance="none", backbone="fourier",
                 mlp_hidden=32, mlp_layers=3, mlp_multires=4)
    field = make_field(cfg)
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    settings = RenderSettings.from_config(cfg, training=True)
    with pytest.raises(ValueError, match="model"):
        make_multiview_step(cfg, field, optimizer, settings, None,
                            shaded=False, with_sds=False,
                            mesh=make_mesh_2d(2, 4))
