"""Device-mesh parallelism.

The reference has DDP scaffolding that never activates (reference:
nerf/utils.py:255-264; torch.distributed is imported and unused — see
SURVEY.md §2.3). Here multi-chip is first-class and greenfield:

- axis "data": rays within a view (and, for multi-asset training,
  whole views/assets) are sharded across devices. The field parameters,
  occupancy grid, and frozen priors are replicated; XLA inserts the
  gradient psum over ICI automatically because parameters are replicated
  while the ray batch is sharded.
- The train step is the SAME pure function as single-chip
  (training.trainer.build_train_step); only in_shardings differ. No
  NCCL-style explicit communication anywhere.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None) -> Mesh:
    """1-D mesh over the data axis."""
    devs = jax.devices()
    n = n_data or len(devs)
    return Mesh(np.asarray(devs[:n]), ("data",))


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """2-D data x model mesh: views/rays shard over "data", the frozen
    guidance towers tensor-shard over "model" (parallel/tp.py). The
    "model" axis is the minor (fastest-varying) dimension so a TP group's
    all-reduces ride adjacent-chip ICI links."""
    devs = jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(n_data, n_model),
                ("data", "model"))


def batch_shardings(mesh: Mesh, batch) -> Dict:
    """Shard per-ray arrays over "data"; replicate scalars and reference
    images (they are small and read by every device).

    `batch`: the batch dict itself OR just its key names (the Trainer
    builds shardings at jit-construction time, before any batch exists).
    """
    sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    keys = batch.keys() if hasattr(batch, "keys") else batch
    return {
        k: sharded if k in ("rays_o", "rays_d", "depth_scale") else replicated
        for k in keys
    }


def shard_train_step(step_fn, mesh: Mesh, batch: Dict, gparams=None):
    """jit the train step with data-sharded rays + replicated state.

    Returns (jitted_fn, placed_batch_shardings). Parameters/optimizer
    state/grid are replicated: grads come out of a sharded loss reduced
    over data (XLA emits the psum over ICI); the Adan update then runs
    replicated on every device.

    `gparams` (only meaningful on a 2-D mesh with a "model" axis): the
    frozen guidance tower params. Their batch entry then gets the
    tensor-parallel shardings from parallel/tp.py instead of replication,
    so the single-view steps run the same data x model partitioning as
    the multi-view path (shard_mv_tp_step).
    """
    repl = NamedSharding(mesh, P())
    b_shard = batch_shardings(mesh, batch)
    if gparams is not None and "model" in mesh.axis_names \
            and "gparams" in b_shard:
        from .tp import tp_param_shardings

        b_shard["gparams"] = tp_param_shardings(gparams, mesh, axis="model")
    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, repl, b_shard),
        out_shardings=(repl, repl, repl, repl),
    )
    return jitted, b_shard


def shard_mv_tp_step(step_fn, mesh: Mesh, batch_keys, view_keys, gparams):
    """2-D jit of the multi-view step: the view axis shards over "data"
    while the frozen guidance tower params ("gparams" in the batch)
    tensor-shard over "model" (parallel/tp.py heuristics). Field
    params / optimizer state / grid stay replicated, so the view-mean
    gradient psums over "data" and every TP matmul pair all-reduces over
    "model" — both placed by XLA's SPMD partitioner, no hand collectives.

    This is the v4-8 scale-out shape for the SDS hot loop (BASELINE.md):
    data-parallel novel views x tensor-parallel UNet.
    """
    from .tp import tp_param_shardings

    repl = NamedSharding(mesh, P())
    view = NamedSharding(mesh, P("data"))
    b_shard = {}
    for k in batch_keys:
        if k == "gparams":
            b_shard[k] = tp_param_shardings(gparams, mesh, axis="model")
        elif k in view_keys:
            b_shard[k] = view
        else:
            b_shard[k] = repl
    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, repl, b_shard),
        out_shardings=(repl, repl, repl, repl),
    )
    return jitted, b_shard


# ---------------------------------------------------------------------------
# multi-asset training: N independent optimizations sharded over the slice
# ---------------------------------------------------------------------------


def stack_assets(trees):
    """Stack per-asset pytrees (params, opt states, grids, batches) along a
    new leading asset axis."""
    import jax.numpy as jnp

    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *trees)


def unstack_assets(tree, n_assets: int):
    """Inverse of stack_assets: one pytree per asset."""
    return [jax.tree.map(lambda leaf: leaf[i], tree) for i in range(n_assets)]


def shard_multi_asset_step(step_fn, mesh: Mesh):
    """Batched multi-asset throughput (BASELINE.json config 5): each asset
    is a fully independent optimization (own params / optimizer state /
    occupancy grid / reference image), embarrassingly parallel across the
    slice — the TPU-native replacement for running N reference processes
    on N GPUs. The step vmaps over the leading asset axis and shards that
    axis over the mesh's "data" dimension, so with n_assets == n_devices
    each chip advances exactly its own asset and NO collectives are
    emitted (frozen prior weights, when used, are the only replicated
    operands).

    step_fn: the single-asset train step (params, opt_state, grid, key,
    batch) -> (params, opt_state, metrics, aux). All inputs must carry a
    leading asset axis (see stack_assets).
    """
    asset = NamedSharding(mesh, P("data"))
    vstep = jax.vmap(step_fn)
    jitted = jax.jit(
        vstep,
        in_shardings=(asset, asset, asset, asset, asset),
        out_shardings=(asset, asset, asset, asset),
    )
    return jitted
