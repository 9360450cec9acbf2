"""Tensor-parallel sharding for the frozen guidance towers (SD UNet/VAE/CLIP).

The SD UNet dominates the SDS hot loop's FLOPs (reference
nerf/sd.py:117-174; the reference never shards it — single GPU). On a
TPU slice the towers can be tensor-sharded over a `model` mesh axis the
idiomatic XLA way: annotate the parameter pytree with `NamedSharding`s
and let the SPMD partitioner place the all-reduces on ICI (the
scaling-book recipe — no hand-written collectives).

Megatron-style pairing by parameter name:
  - column-parallel (shard the OUTPUT features dim): attention
    `to_q`/`to_k`/`to_v`, the GEGLU up-projection `ff/net_0/proj`,
    conv kernels (cout);
  - row-parallel (shard the INPUT features dim, so the partial products
    of the preceding column-sharded matmul reduce with ONE all-reduce):
    attention out-proj `to_out_0`, the FFN down-projection `ff/net_2`;
  - everything 1-D (biases, norm scales) and small/indivisible tensors:
    replicated.

Any annotation is *correct* under SPMD; pairing only minimizes
communication volume. Dims that don't divide the axis size fall back to
replication, so the same function works for the full SD2 towers and the
tiny random test towers.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# input-dim-sharded projections: the matmul BEFORE them is column-sharded,
# so sharding their input contracts the partial sums into one all-reduce
_ROW_PARALLEL = ("to_out_0", "net_2")


def make_tp_mesh(n_devices: int, axis: str = "model") -> Mesh:
    import numpy as np

    devs = jax.devices()
    if len(devs) < n_devices:
        # jax.devices()[:n] would silently yield a smaller mesh (TP=4
        # when --mesh_model 8 was asked for); fail loudly like
        # make_mesh_2d does
        raise ValueError(
            f"need {n_devices} devices for tensor parallelism, "
            f"have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


def _spec_for(path_names, leaf, n: int) -> P:
    if leaf.ndim < 2:
        return P()
    # exact path-component match (not substring of the joined path: a
    # future param named e.g. net_20 must not be mis-tagged row-parallel)
    if any(tag in path_names for tag in _ROW_PARALLEL):
        # kernel [din, dout]: shard din
        if leaf.shape[-2] % n == 0:
            return P(*([None] * (leaf.ndim - 2) + ["model", None]))
        return P()
    # column-parallel default: shard the output-features (last) dim —
    # covers to_q/k/v, GEGLU proj, proj_in/out, and conv cout
    if leaf.shape[-1] % n == 0:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def tp_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree mirroring `params` for tensor parallelism."""
    n = mesh.shape[axis]

    def f(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k)))
                 for k in path]
        spec = _spec_for([str(x) for x in names], leaf, n)
        # rename the generic 'model' axis tag to the mesh's actual axis
        spec = P(*[axis if s == "model" else s for s in spec])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_guidance_params(params, mesh: Mesh, axis: str = "model"):
    """device_put the frozen tower params with TP shardings.

    Passing the result into a jitted step makes XLA partition every
    matmul/conv that touches them; activations stay batch-replicated and
    the partitioner inserts the pairing collectives over ICI.
    """
    shardings = tp_param_shardings(params, mesh, axis)
    return jax.device_put(params, shardings)


def sharded_fraction(params, shardings) -> float:
    """Diagnostic: fraction of parameter BYTES that got a non-replicated
    spec (1.0 = fully sharded, 0.0 = fully replicated)."""
    import numpy as np

    tot, sh = 0, 0
    for leaf, s in zip(jax.tree.leaves(params),
                       jax.tree.leaves(shardings, is_leaf=lambda x: isinstance(x, NamedSharding))):
        b = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        tot += b
        if any(ax is not None for ax in s.spec):
            sh += b
    return sh / max(tot, 1)
