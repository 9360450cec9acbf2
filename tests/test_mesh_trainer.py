"""CLI-reachable data-parallel training (cfg.mesh_data > 1): the
sharded Trainer must match single-device numerics on the virtual
8-device CPU mesh (VERDICT round-1 item 5 / SURVEY.md §2.3).

The reference's analogue is DDP scaffolding that never activates
(nerf/utils.py:255-264); here --mesh_data wires real shardings into the
same train step.
"""

import jax
import numpy as np

from makeit3d_tpu.config import Config

CFG_KW = dict(
    h=32, w=32,
    max_steps=64,
    train_samples_per_ray=16,
    eval_samples_per_ray=16,
    grid_size=32,
    hash_levels=4,
    log2_hashmap_size=12,
    desired_resolution=64,
    lambda_smooth=0.0,
    albedo_iters=10_000,   # albedo-only: keep the CPU programs small
    diff_iters=10_000,
    iters=50,
    guidance="none",
    split_encode=False,
)


def _make_trainer(ws, mesh_data):
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(workspace=str(ws), mesh_data=mesh_data, **CFG_KW)
    return Trainer(cfg, workspace=cfg.workspace, use_checkpoint="scratch",
                   seed=11)


def test_sharded_trainer_matches_single_device(tmp_path):
    from makeit3d_tpu.cameras import ViewSampler

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    tr_1 = _make_trainer(tmp_path / "single", 1)
    tr_8 = _make_trainer(tmp_path / "mesh8", 8)
    assert tr_8.mesh is not None and tr_8.mesh.devices.size == 8

    cfg = tr_1.cfg
    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=16,
                          seed=5)
    for i in range(4):
        view = sampler.get(i)  # mix of front (i%4==0) and novel views
        m1, _ = tr_1.step(view)
        m8, _ = tr_8.step(view)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=1e-4, atol=1e-6,
            err_msg=f"loss diverged at step {i}")

    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(tr_1.params),
        jax.tree_util.tree_leaves_with_path(tr_8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4,
            err_msg=f"param {jax.tree_util.keystr(pa)} diverged "
                    f"(sharded vs single)")

    # the sharded step's outputs must be replicated (directly usable by
    # checkpointing / host snapshots without cross-device gathers)
    leaf = jax.tree.leaves(tr_8.params)[0]
    assert leaf.sharding.is_fully_replicated
