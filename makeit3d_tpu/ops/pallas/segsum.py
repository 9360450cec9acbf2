"""Sorted-segment-sum scatter: the Pallas attempt at the XLA:TPU
scatter-add ceiling (round-2 verdict item 4; docs/TPU_NOTES.md
"scatter ceiling": every XLA scatter formulation — naive .at[].add,
scan-of-scans, folded single-scatter, vjp-of-gather, sorted
segment_sum — lands at ~16-25M rows/s because XLA serializes the
row updates; CUDA pays the same rows as global atomics at memory
speed, tiny-cuda-nn's fused backward included,
/root/reference/nerf/network_tcnn.py:54-65).

The idea XLA cannot express: once rows are SORTED by table index,
a block of R consecutive rows touches a narrow contiguous slot range,
so the segment reduction becomes an MXU matmul against an in-VMEM
one-hot — no serialized scatter unit anywhere:

  1. (XLA) sort rows by index — measured 50M rows/s, 2 payloads.
  2. (Pallas, this file) for each block of R sorted rows: build the
     one-hot [SPAN, R] of local slot offsets against the block's
     aligned base window, and matmul vals x one-hot^T -> a dense
     [F, SPAN] partial. SPAN = 3 aligned windows: the production hash
     workload's fine levels run ~1 row/slot, where a 1024-row block
     spans ~1024 slots — 2 windows overflowed on half the blocks at
     worst alignment and fired the repair on every call. Rows whose
     slot still falls outside (density cliffs, 30-sigma outliers) are
     dropped here and repaired exactly in step 4.
  3. (XLA) combine the [n_blocks, N_WIN, W, F] partials into the table
     with ONE scatter of N_WIN*n_blocks FAT rows ([W, F] slabs) —
     thousands of rows instead of hundreds of millions, so the scatter
     unit's per-row serialization is off the critical path.
  4. (XLA) exact repair: rows dropped in step 2 (count is computed with
     elementwise compares, no scatter) go through a plain .at[].add
     under lax.cond, so the fallback's cost is paid only when it
     actually fires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

# rows per kernel block and aligned window width (slots). A block's
# partial covers [base, base + N_WIN*WINDOW) with base =
# floor(idx[0]/W)*W, guaranteeing (N_WIN-1)*W + 1 slots past the first
# row at the worst alignment. N_WIN=3 because the production fine-level
# hash density is ~1 row/slot (a 1024-row block spans ~1024 +- 32
# slots): 2 windows guaranteed only W+1 = 1025 slots and overflowed on
# roughly half the blocks, firing the repair fallback every call —
# measured 5.0M rows/s e2e on the 8.4M-rows/8.4M-slots prod-chunk
# probe, LOSING 0.83x to plain XLA (round-4 forensics). 3 windows
# guarantee 2049 slots (~30 sigma above the span mean at 1 row/slot).
BLOCK_ROWS = 1024
WINDOW = 1024
N_WIN = 3
SPAN = N_WIN * WINDOW


def _segsum_kernel(idx_ref, val_ref, out_ref):
    idx = idx_ref[0, :]                      # [R] i32, sorted
    vals = val_ref[...]                      # [F, R] f32 (feature-major)
    # the block's aligned window base derives from its own first row —
    # no side input (the XLA combine recomputes the same formula)
    base = (idx[0] // WINDOW) * WINDOW
    local = idx - base                       # >= 0 by sortedness
    R = idx.shape[0]
    # one-hot [SPAN, R] via 2-D iota compare, built lane-natural (idx
    # was read along lanes, so local[None, :] needs no relayout);
    # out-of-window rows match no row and drop out (repaired exactly by
    # the XLA fallback)
    rows = jax.lax.broadcasted_iota(jnp.int32, (SPAN, R), 0)
    onehot_t = (rows == local[None, :]).astype(jnp.float32)
    # MXU (NT gemm): [F, R] x [SPAN, R] contracting the shared lane dim
    # R -> [F, SPAN]. Emitted feature-major so the output block keeps
    # SPAN in the lane dim (a [.., SPAN, F] layout would pad F=2 lanes
    # to 128 — a measured 64x HBM expansion of the partials buffer).
    # Precision HIGHEST: the default TPU matmul truncates f32 operands
    # to bf16 (measured max_abs_diff 0.027 vs XLA's exact scatter on the
    # dense hash workload); the onehot is exact in any precision, so the
    # f32x3 decomposition recovers the values' full mantissa.
    out_ref[...] = jax.lax.dot_general(
        vals, onehot_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def sorted_segment_sum(sorted_idx: jax.Array, sorted_vals: jax.Array,
                       table: jax.Array) -> jax.Array:
    """table.at[sorted_idx].add(sorted_vals), exact, for SORTED idx.

    sorted_idx: [M] int32, non-decreasing, in [0, T).
    sorted_vals: [M, F] float32.
    table: [T, F] float32 accumulator (returned updated).
    """
    M, F = sorted_vals.shape
    T = table.shape[0]
    R = BLOCK_ROWS
    n_blocks = -(-M // R)
    pad = n_blocks * R - M
    # pad rows: index T (one past the table) never lands in any block's
    # window unless the last block's base reaches T - 2W... route pads to
    # a dedicated overflow slot instead: extend table by 2*WINDOW slots.
    idx_p = jnp.pad(sorted_idx, (0, pad), constant_values=T + WINDOW)
    # feature dim padded to the 8-sublane tile so the kernel's [Fp, 2W]
    # output block lowers (zero columns cost nothing on the MXU)
    Fp = max(-(-F // 8) * 8, 8)
    # Inputs go in layouts whose LANE dim is the row axis M: idx as
    # [1, M] (sublane dim 1 == the overall dim, so the (1, R) block
    # lowers; HBM pads 1->8 sublanes, 8x on 4-byte idx) and vals
    # transposed to feature-major [Fp, M] (tiles exactly). The previous
    # [M, 1] / [M, Fp] forms were forced by the custom call's layout
    # constraint into T(8,128) with 128x / 16x lane padding — a measured
    # 24G of HLO temps that OOM'd the 25M-row probe case (round-4
    # forensics, /tmp probe_sorted_scatter_r4b OOM dump).
    val_p = jnp.pad(sorted_vals, ((0, pad), (0, Fp - F))).T

    # per-block aligned window bases (XLA gather — trivial; the kernel
    # derives the same value from its own first row)
    bases = (idx_p[::R] // WINDOW) * WINDOW          # [n_blocks] i32

    partials = pl.pallas_call(
        _segsum_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Fp, SPAN), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * Fp, SPAN),
                                       jnp.float32),
        interpret=interpret_mode(),
    )(idx_p.reshape(1, -1), val_p)

    # combine: ONE scatter of N_WIN*n_blocks fat [W, F] slabs. Window
    # ids can collide across consecutive blocks (same window revisited),
    # so this must be an add-scatter — but it serializes over thousands
    # of slab rows, not millions of element rows.
    n_win = T // WINDOW + N_WIN + 3  # table windows + pad-slot margin
    wb = bases // WINDOW
    win_ids = jnp.stack([wb + j for j in range(N_WIN)], axis=1)
    # [n_blocks*Fp, SPAN] -> [N_WIN*n_blocks, W, F] slabs (kernel layout)
    slabs = partials.reshape(n_blocks, Fp, N_WIN, WINDOW)[:, :F].transpose(
        0, 2, 3, 1).reshape(n_blocks * N_WIN, WINDOW, F)
    ext = jnp.zeros((n_win, WINDOW, F), table.dtype).at[
        win_ids.reshape(-1)].add(slabs, mode="drop")
    out = table + ext.reshape(-1, F)[:T]

    # exact repair of dropped rows (block span exceeded SPAN — needs a
    # <1-row-per-slot block plus a 30-sigma span outlier, or a block
    # straddling a density cliff such as a hash level boundary;
    # gradients must not depend on luck). Two tiers so the cost tracks
    # the number of dropped rows, not M: up to REPAIR_K rows go through
    # a compacted scatter (~ms); only a pathological overflow pays the
    # full-length masked scatter (the old single tier fired on every
    # prod-chunk call and cost 1.4 s — round-4 forensics).
    block_base = jnp.repeat(bases, R)[:M]
    dropped = sorted_idx - block_base >= SPAN
    n_drop = jnp.sum(dropped)
    REPAIR_K = min(16384, M)

    def repair_small(t):
        pos = jnp.where(dropped, size=REPAIR_K, fill_value=M)[0]
        safe = jnp.minimum(pos, M - 1)
        g_idx = jnp.where(pos < M, sorted_idx[safe], T)
        g_val = jnp.where((pos < M)[:, None], sorted_vals[safe], 0.0)
        return t.at[g_idx].add(g_val, mode="drop")

    def repair_full(t):
        return t.at[jnp.where(dropped, sorted_idx, T)].add(
            jnp.where(dropped[:, None], sorted_vals, 0.0), mode="drop")

    return jax.lax.cond(
        n_drop > 0,
        lambda t: jax.lax.cond(n_drop <= REPAIR_K, repair_small,
                               repair_full, t),
        lambda t: t, out)


@functools.partial(jax.jit, donate_argnums=(2,))
def scatter_add_sorted(idx: jax.Array, vals: jax.Array,
                       table: jax.Array) -> jax.Array:
    """Unsorted scatter-add via sort + block-matmul segment sum.

    Drop-in for table.at[idx].add(vals): sorts (XLA sort, the measured
    50M rows/s path), then reduces with the Pallas kernel above.
    """
    order = jnp.argsort(idx)
    return sorted_segment_sum(idx[order].astype(jnp.int32),
                              vals[order], table)
