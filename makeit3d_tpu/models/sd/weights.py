"""Pretrained-weight porting: torch/safetensors state dicts -> flax trees.

The flax modules in this package name their submodules after the
diffusers / transformers state-dict keys, so porting is a mechanical
rename + transpose:

  torch "down_blocks.0.resnets.1.conv1.weight"  (OIHW)
   -> flax ("down_blocks_0_resnets_1", "conv1", "kernel")  (HWIO)

Rules:
  - numeric path segments merge into their predecessor (a.0.b -> a_0.b)
  - Linear weight -> kernel, transposed; Conv weight -> kernel, OIHW->HWIO
  - norm weight -> scale; Embedding weight -> embedding
Works for the VAE, the UNet, and HF CLIP text/vision models.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors / .bin / .pt state dict to numpy."""
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return dict(load_file(path))
        except ImportError:
            from safetensors.torch import load_file  # pragma: no cover

            return {k: v.numpy() for k, v in load_file(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _merge_numeric(segments):
    out = []
    for s in segments:
        if s.isdigit() and out:
            out[-1] = f"{out[-1]}_{s}"
        else:
            out.append(s)
    return out


# torch key prefixes stripped before mapping (wrapper module names)
_STRIP_PREFIXES = ("text_model.", "vision_model.", "model.", "module.")


def _walk_path(trie, segs, leaf=None):
    """Match merged torch segments against the flax-path trie, joining
    adjacent segments with '_' where the flax module name is flat
    ("down_blocks_0_resnets_1" is ONE flax module for the diffusers
    nesting "down_blocks.0.resnets.1"). Returns the matched flax path
    tuple — which must end on a parameter leaf — or None.

    `leaf` is a SYNTHESIZED candidate name ("kernel"/"scale"/...), not a
    torch segment: it matches as a strict final trie level and never
    '_'-joins into a module name (otherwise segs ["foo"] + "kernel"
    could bind to an unrelated module literally named "foo_kernel",
    bounded only by the shape check)."""

    def dfs(node, i, acc):
        if i == len(segs):
            if leaf is not None:
                child = node.get(leaf)
                return (tuple(acc + [leaf])
                        if child is not None and not child else None)
            return tuple(acc) if not node else None  # leaf == empty dict
        name = None
        for j in range(i, len(segs)):
            name = segs[i] if j == i else name + "_" + segs[j]
            child = node.get(name)
            if child is not None:
                r = dfs(child, j + 1, acc + [name])
                if r is not None:
                    return r
        return None

    return dfs(trie, 0, [])


# torch buffers that are bookkeeping, not weights: excluded from the
# match-fraction denominator (they have no flax leaf by design)
_NON_PARAM_SUFFIXES = ("position_ids", "num_batches_tracked")


def port_torch_to_flax(
    torch_sd: Dict[str, np.ndarray],
    flax_params: Dict[str, Any],
    verbose: bool = False,
    min_match: float = 0.5,
) -> Dict[str, Any]:
    """Fill a flax params template from a torch state dict.

    Unmatched torch keys are reported and skipped; unmatched flax leaves
    keep their initialization. Returns a NEW params tree.

    A one-line match summary always prints, and the call RAISES when the
    matched fraction falls below `min_match` — a whole submodule silently
    keeping random init is exactly the failure mode that bites last
    (downstream parity drift instead of a loud load error). Pass
    min_match=0 to port a deliberately partial state dict.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    flax_index: Dict[tuple, Any] = {}
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        flax_index[keys] = leaf

    # Trie over the flax paths. Matching walks it consuming 1..k merged
    # torch segments joined by "_" per level, because the flax modules
    # use FLAT names ("down_blocks_0_resnets_1" is ONE module) while
    # diffusers keys nest ("down_blocks.0.resnets.1"). The previous
    # exact-tuple lookup only ever matched twins whose torch attribute
    # names were pre-flattened; real diffusers keys missed silently, and
    # an unconditional drop of 'encoder' segments (a transformers-CLIP
    # hack) orphaned the VAE encoder entirely (caught by
    # tests/test_sds_grad_parity.py via diverging latents).
    trie: Dict[str, Any] = {}
    for keys in flax_index:
        node = trie
        for k in keys:
            node = node.setdefault(k, {})

    new_leaves = dict(flax_index)
    matched, missed = 0, []

    for tkey, val in torch_sd.items():
        key = tkey
        for pref in _STRIP_PREFIXES:
            if key.startswith(pref):
                key = key[len(pref):]
        raw = key.split(".")
        # exact path first; the flattened variant serves transformers
        # CLIP, whose embeddings.*/encoder.layers.* wrappers have no
        # flax module
        variants = [raw]
        flat_segs = [s for s in raw if s not in ("embeddings", "encoder")]
        if flat_segs != raw:
            variants.append(flat_segs)

        hit = None
        for segs_v in variants:
            leaf_name = segs_v[-1]
            segs = _merge_numeric(segs_v[:-1])
            if leaf_name == "weight":
                # () covers modules storing the tensor as a plain param
                # named by the parent segment, e.g. transformers CLIP
                # "position_embedding.weight" -> (..., "position_embedding")
                candidates = ("kernel", "scale", "embedding", None)
            elif leaf_name == "bias":
                candidates = ("bias",)
            else:  # plain parameters keep their own name
                candidates = (leaf_name, None)
            for cand in candidates:
                # a successful walk must end on a LEAF node ({} in trie);
                # synthesized candidates bind as a strict final level
                path = _walk_path(trie, segs, leaf=cand)
                if path is not None and path in flax_index:
                    hit = path
                    break
            if hit is not None:
                break
        if hit is None:
            missed.append(tkey)
            continue

        target = flax_index[hit]
        v = np.asarray(val)
        if hit[-1] == "kernel":
            if v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            elif v.ndim == 2:
                v = v.T
        if v.shape != target.shape:
            # position embeddings stored [1, N, C] vs [N, C], etc.
            if v.squeeze().shape == tuple(target.shape):
                v = v.squeeze()
            else:
                missed.append(f"{tkey} (shape {v.shape} vs {target.shape})")
                continue
        new_leaves[hit] = v.astype(np.asarray(target).dtype)
        matched += 1

    missed = [m for m in missed
              if not m.split(" ")[0].endswith(_NON_PARAM_SUFFIXES)]
    total = matched + len(missed)
    print(f"[port] matched {matched}/{total} torch tensors"
          + (f" ({len(missed)} unmatched)" if missed else ""))
    if verbose:
        for m in missed[:20]:
            print("  [miss]", m)
    if total and matched / total < min_match:
        raise ValueError(
            f"weight port matched only {matched}/{total} torch tensors "
            f"(< min_match={min_match}); first misses: {missed[:8]}. "
            f"Pass min_match=0 to accept a partial port."
        )

    # rebuild the tree
    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return new_leaves[prefix]

    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: new_leaves[
            tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        ],
        flax_params,
    )


def find_weight_file(root: str, subfolder: str) -> str:
    """Locate a diffusers-layout weight file under root/subfolder."""
    cand = []
    sub = os.path.join(root, subfolder)
    for name in (
        "diffusion_pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "model.safetensors",
        "pytorch_model.bin",
    ):
        cand.append(os.path.join(sub, name))
    for c in cand:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(f"no weight file under {sub}")
