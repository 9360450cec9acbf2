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


def batch_shardings(mesh: Mesh, batch: Dict) -> Dict:
    """Shard per-ray arrays over "data"; replicate scalars and reference
    images (they are small and read by every device)."""
    sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if k in ("rays_o", "rays_d", "depth_scale"):
            out[k] = sharded
        else:
            out[k] = replicated
    return out


def shard_train_step(step_fn, mesh: Mesh, batch: Dict):
    """jit the train step with data-sharded rays + replicated state.

    Returns (jitted_fn, placed_batch_shardings). Parameters/optimizer
    state/grid are replicated: grads come out of a sharded loss reduced
    over data (XLA emits the psum over ICI); the Adan update then runs
    replicated on every device.
    """
    repl = NamedSharding(mesh, P())
    b_shard = batch_shardings(mesh, batch)
    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, repl, b_shard),
        out_shardings=(repl, repl, repl, repl),
    )
    return jitted, b_shard
