"""Encode-split train step: the shaded program as two XLA executables.

Why this exists (docs/TPU_NOTES.md + scripts/ablate128.py): on the axon
v5e relay, the fused backward of (batched FD normal probes -> hash
encode -> MLP) *together with* the hash-table scatter-add reliably
compiles to a program that kills the TPU worker at runtime on sparse
occupancy grids at 128x128. The round-2 ablation matrix isolated the
trigger: `albedo` (scatter, no probes) survives, `froztab` (probes, no
scatter) survives, batched probes + scatter faults at step 1.

So the shaded step runs as two programs that each keep one half of the
toxic pair:

  Program A (grad_program): march -> probe positions -> hash encode
    FORWARD (feats is computed outside the differentiated function, so
    this graph contains only gathers, never the table scatter) -> the
    full loss with `feats` as an explicit differentiated input ->
    value_and_grad over (params, feats). Emits the non-table param
    grads plus the per-sample feature cotangents `dfeats`. This is
    exactly the `froztab` program shape that survived the ablations.

  Program B (scatter_program x K + update_program): the explicit
    table-gradient scatter (HashGridEncoder.grad_table) over row slices,
    then the grads merge + Adan update. No probe math in these graphs.

The XLA program boundary is the point: the two halves of the fused
backward can no longer end up in one Mosaic kernel.

Why the scatter is SLICED across K invocations of one executable
(scripts/probe_scatter.py, 2026-08-17): a single scatter program over
all 22M probe rows of a 128x128 step crashes the v5e worker in BOTH
formulations tried (hand scatter-add and jax.vjp of the encode
forward), while the identical hand formulation over 1.5M rows survives
— matching the albedo program, whose fused scatter handles only the
1.5M center rows and has always survived. Row count per executed
program is the trigger variable, so each invocation stays at a proven
size; invocations pipeline (no host syncs between them), costing
dispatch overhead only.

Numerical parity with the fused single-program step is exact up to
reassociation (tested in tests/test_split_step.py): PRNG streams are
mirrored by re-deriving the march/smooth keys exactly as
build_loss_fn -> render_occupancy would split them, and the injected
feats-consuming evaluators (models/field.py make_split_evals) reuse the
same probe-position construction (probe_positions) as the in-module
batched eval. One intentional difference: the smooth-loss perturbed
CENTER is clipped to [-bound, bound] (the fused path leaves x+noise
unclipped into the encoder; clipping keeps the materialized positions
in-domain for grad_table's index math).

Reference context: this replaces nothing in the reference — CUDA tcnn
computes the table gradient inside its fused kernel
(nerf/network_tcnn.py:54-65). The split is a TPU-deployment artifact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.renderer import march_stage
from ..ops.encoding import HashGridEncoder


def resolve_scatter_impl(cfg, shaded: bool = True) -> str:
    """Which table-gradient scatter formulation the split uses.
    None = auto, regime-dependent since round 5: the Pallas
    sorted-segment-sum pipeline on TPU only for SHADED programs (the
    7-probe row flood where it beats the XLA scatter-add ceiling
    ~1.7x, TPU_NOTES round 4); the pure-XLA vjp formulation for albedo
    programs and off-TPU. The round-5 same-process step A/B
    (results/log_bench_r5_warm2.txt) showed the sorted path LOSES the
    full 128^2 albedo step 2x (0.048 vs 0.095 it/s, same grid) — at
    albedo row counts the radix sort dominates, and the fused XLA
    albedo program both survives the v5e and wins. This also closes
    the round-4 "0.095 -> 0.048 regression": it was the auto-impl
    switch, not a perf loss."""
    impl = getattr(cfg, "scatter_impl", None)
    if impl is None:
        impl = ("sorted" if (jax.default_backend() == "tpu" and shaded)
                else "vjp")
    assert impl in ("sorted", "vjp"), impl
    return impl


def build_probe_layout(field, settings, flat_x, k_smooth,
                       shaded: bool = True):
    """All field-eval positions of one step, as one [P, 3] array.

    Shaded layout: [7M main-probe rows | 7M smooth-probe rows] with M =
    flat_x.shape[0]; probe order within each block follows
    probe_positions (center, +x, -x, +y, -y, +z, -z). The smooth block
    exists only when settings.compute_smooth. make_split_evals slices
    by this exact layout. Albedo layout (shaded=False): just the M
    center rows — no FD probes, no smooth eval.
    """
    from ..models.field import probe_positions

    if not shaded:
        return flat_x
    eps = field.fd_epsilon
    parts = probe_positions(flat_x, eps, field.bound)
    if settings.compute_smooth:
        noise = jax.random.normal(k_smooth, flat_x.shape) * settings.smooth_sigma
        center = jnp.clip(flat_x + noise, -field.bound, field.bound)
        parts = parts + probe_positions(center, eps, field.bound)
    return jnp.concatenate(parts, axis=0)


def encode_chunked(field, params, x, chunk: int):
    """Forward-only hash encode over [P, 3] rows, chunked via lax.map so
    one chunk's gather temporaries live at a time."""
    P = x.shape[0]
    if P <= chunk:
        return field.apply(params, x, method="encode")
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    feats = jax.lax.map(
        lambda c: field.apply(params, c, method="encode"),
        xp.reshape(n_chunks, chunk, 3),
    )
    return feats.reshape(n_chunks * chunk, -1)[:P]


def make_split_encode_step(cfg, field, optimizer, settings, guidance,
                           is_front: bool, salt: int = 0,
                           with_sds: bool = True, shaded: bool = True):
    """Two-program train step; drop-in for make_train_step's
    (params, opt_state, grid, key, batch) -> (params, opt_state,
    metrics, aux) contract. Only valid for hash-grid backbones
    (needs the encode / common_from_feats split).

    shaded=False builds the albedo-mode split: center rows only (no FD
    probes, no smooth block). The fused albedo program SURVIVES on the
    v5e — the albedo split exists purely so the table scatter can route
    through the sorted-segment-sum pipeline (cfg.scatter_impl="sorted"),
    which the fused program's XLA-autodiff scatter cannot."""
    from .trainer import build_loss_fn

    loss_fn = build_loss_fn(cfg, field, settings, guidance, is_front,
                            shaded=shaded, with_sds=with_sds)
    bound = float(field.bound)
    encoder = HashGridEncoder(
        n_levels=field.hash_levels,
        n_features=field.hash_features,
        log2_hashmap_size=field.log2_hashmap_size,
        base_resolution=field.base_resolution,
        desired_resolution=field.desired_resolution,
        bound=field.bound,
    )

    @jax.jit
    def grad_program(params, grid, key, batch):
        # Mirror the fused path's PRNG derivations exactly:
        # build_loss_fn splits key -> (k_render, k_bg, k_guide), then
        # render_occupancy splits k_render -> (_, k_march, k_light,
        # k_smooth). Re-derive k_march/k_smooth here and hand the
        # ORIGINAL key to loss_fn so every other stream matches the
        # single-program step bit-for-bit.
        k_render = jax.random.split(key, 3)[0]
        sub = jax.random.split(k_render, 4)
        k_march, k_smooth = sub[1], sub[3]

        m = march_stage(grid, batch["rays_o"], batch["rays_d"], settings,
                        k_march, perturb=True)
        flat_x = m.xyzs.reshape(-1, 3)
        positions = build_probe_layout(field, settings, flat_x, k_smooth,
                                       shaded=shaded)
        # computed OUTSIDE the differentiated function: autodiff below
        # never sees the table -> no scatter in this program's backward
        feats = encode_chunked(field, params, positions,
                               settings.field_chunk)

        def inner(p, f):
            loss, (metrics, aux) = loss_fn(
                p, grid, key, batch, marched=m, feats=f,
                positions=positions)
            if salt:
                # see make_train_step: f32-surviving executable nonce
                loss = loss * (1.0 + 1e-6 * salt)
            return loss, (metrics, aux)

        gfn = jax.value_and_grad(inner, argnums=(0, 1), has_aux=True)
        (_, (metrics, aux)), (gparams, dfeats) = gfn(params, feats)
        return gparams, dfeats, positions, metrics, aux

    # per-invocation scatter size: 1.5M rows is the probed-surviving
    # scale (the albedo program's own scatter size); 2^20 leaves margin
    slice_rows = int(getattr(cfg, "scatter_slice_rows", 0) or (1 << 20))

    # gtab is donated: the accumulator aliases in-place across the K
    # invocations instead of copying the [L, T, F] table (64 MB at
    # defaults) every slice.
    #
    # Formulation: jax.vjp of the encode FORWARD — the exact backward
    # shape XLA generates inside the fused albedo program. Probed on the
    # v5e (scripts/probe_scatter.py, 2026-08-17): at 1M rows it survives
    # AND runs ~2.3x faster than the hand flat-scatter (5.4s vs 12.5s;
    # all formulations ride the ~20M-rows/s XLA scatter ceiling,
    # docs/TPU_NOTES.md). The encode is linear in the table, so the vjp
    # is taken at a zero table — no dependence on live params.
    table0 = jnp.zeros(
        (encoder.n_levels, encoder.table_size, encoder.n_features),
        jnp.float32)
    chunk = settings.field_chunk

    scatter_impl = resolve_scatter_impl(cfg, shaded=shaded)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_program(gtab, pos_slice, df_slice):
        # same [0,1] mapping as HashGridField.encode
        x01 = (pos_slice + bound) / (2.0 * bound)
        if scatter_impl == "sorted":
            return gtab + encoder.grad_table_sorted(
                x01, df_slice.astype(jnp.float32), chunk=min(chunk, 1 << 16)
            ).astype(gtab.dtype)
        P = x01.shape[0]
        n_chunks = max(-(-P // chunk), 1)
        pad = n_chunks * chunk - P
        xp = jnp.pad(x01, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
        dp = jnp.pad(df_slice.astype(jnp.float32),
                     ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)

        def chunk_grad(carry, inp):
            xx, dd = inp
            _, vjp = jax.vjp(lambda t: encoder(t, xx), table0)
            (g,) = vjp(dd)
            return carry + g, None

        add, _ = jax.lax.scan(chunk_grad, jnp.zeros_like(gtab), (xp, dp))
        return gtab + add

    @jax.jit
    def update_program(params, opt_state, gparams, gtab):
        def merge(path, g):
            # the table leaf's grad from program A is exactly zero (the
            # graph never reads it); add keeps this shape-general
            if any(getattr(p, "key", None) == "hash_table" for p in path):
                return g + gtab.astype(g.dtype)
            return g

        grads = jax.tree_util.tree_map_with_path(merge, gparams)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state

    @jax.jit
    def slice_pad(dfeats, positions):
        P = positions.shape[0]
        K = -(-P // slice_rows)
        pad = K * slice_rows - P
        # zero-cotangent pad rows contribute nothing to the table grad
        df = jnp.pad(dfeats, ((0, pad), (0, 0)))
        pos = jnp.pad(positions, ((0, pad), (0, 0)))
        return (df.reshape(K, slice_rows, -1),
                pos.reshape(K, slice_rows, 3))

    gtab_shape = (encoder.n_levels, encoder.table_size, encoder.n_features)

    def stepped(params, opt_state, grid, key, batch):
        gparams, dfeats, positions, metrics, aux = grad_program(
            params, grid, key, batch)
        df_s, pos_s = slice_pad(dfeats, positions)
        gtab = jnp.zeros(gtab_shape, jnp.float32)
        for k in range(df_s.shape[0]):
            # K same-executable invocations; async dispatch pipelines them
            gtab = scatter_program(gtab, pos_s[k], df_s[k])
        params, opt_state = update_program(params, opt_state, gparams, gtab)
        return params, opt_state, metrics, aux

    # exposed for fault-isolation probes (scripts/), tests, and the
    # bench's per-program FLOP accounting
    stepped.grad_program = grad_program
    stepped.scatter_program = scatter_program
    stepped.update_program = update_program
    stepped.scatter_slice_rows = slice_rows
    stepped.gtab_shape = gtab_shape
    return stepped
