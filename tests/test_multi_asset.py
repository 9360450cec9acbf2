"""Multi-asset sharding on the virtual 8-device CPU mesh
(BASELINE.json config 5: batched multi-asset throughput)."""

import jax
import jax.numpy as jnp
import numpy as np

from makeit3d_tpu.cameras import ViewSampler
from makeit3d_tpu.config import Config
from makeit3d_tpu.models.field import make_field, SHADING_ALBEDO
from makeit3d_tpu.models.renderer import RenderSettings
from makeit3d_tpu.ops.grid import init_density_grid
from makeit3d_tpu.parallel.mesh import (
    make_mesh,
    shard_multi_asset_step,
    stack_assets,
    unstack_assets,
)
from makeit3d_tpu.training.optimizer import make_lr_schedule, make_optimizer
from makeit3d_tpu.training.trainer import build_train_step


def _tiny_cfg():
    return Config(
        h=8, w=8, max_steps=32, train_samples_per_ray=8,
        eval_samples_per_ray=8, grid_size=8, hash_levels=2,
        log2_hashmap_size=8, desired_resolution=32, guidance="none",
    )


def test_multi_asset_step_independent_and_matches_single():
    n_assets = 8
    assert len(jax.devices()) >= n_assets
    cfg = _tiny_cfg()
    field = make_field(cfg)
    optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
    settings = RenderSettings.from_config(cfg, training=True)
    step_fn = build_train_step(cfg, field, optimizer, settings, None,
                               is_front=True)

    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=4, seed=0)
    view = sampler.get(0)

    def make_state(i):
        params = field.init(jax.random.PRNGKey(i), jnp.zeros((8, 3)),
                            jnp.zeros((8, 3)))
        return params, optimizer.init(params)

    def make_batch(i):
        return {
            "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
            "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
            "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
            "ref_rgba": jnp.full((512, 512, 4), (i + 1) / 10.0),
            "ref_depth": jnp.full((512, 512), 0.5),
            "obj_mask": jnp.ones((512, 512)),
            "is_large": jnp.asarray(0.0),
            "diff_phase": jnp.asarray(0.0),
            "shading_mode": jnp.asarray(SHADING_ALBEDO, jnp.int32),
            "ambient_ratio": jnp.asarray(1.0),
        }

    states = [make_state(i) for i in range(n_assets)]
    batches = [make_batch(i) for i in range(n_assets)]
    grids = [init_density_grid(cfg.cascade, cfg.grid_size)
             for _ in range(n_assets)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(n_assets)]

    params_s = stack_assets([s[0] for s in states])
    opt_s = stack_assets([s[1] for s in states])
    grid_s = stack_assets(grids)
    key_s = stack_assets(keys)
    batch_s = stack_assets(batches)

    mesh = make_mesh(n_assets)
    with mesh:
        jitted = shard_multi_asset_step(step_fn, mesh)
        p2, o2, metrics, _ = jitted(params_s, opt_s, grid_s, key_s, batch_s)
        losses = np.asarray(metrics["loss"])

    assert losses.shape == (n_assets,)
    assert np.isfinite(losses).all()
    # assets have different references -> different losses (independence)
    assert len(np.unique(np.round(losses, 6))) > 1

    # asset 3's sharded update must equal its single-asset update exactly
    i = 3
    p_single, o_single, m_single, _ = jax.jit(step_fn)(
        states[i][0], states[i][1], grids[i], keys[i], batches[i]
    )
    p_multi = unstack_assets(p2, n_assets)[i]
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_multi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(m_single["loss"]), float(losses[i]),
                               rtol=1e-5)
