"""Pallas sorted-segment-sum scatter (ops/pallas/segsum.py): exact
parity with XLA's .at[].add on random, skewed, and adversarially
sparse workloads — the correctness half of the round-2 verdict item 4
attempt at the scatter-add ceiling (docs/TPU_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.ops.pallas.segsum import (
    BLOCK_ROWS,
    SPAN,
    WINDOW,
    scatter_add_sorted,
    sorted_segment_sum,
)


def _check(idx, vals, T):
    idx = jnp.asarray(idx, jnp.int32)
    vals = jnp.asarray(vals, jnp.float32)
    want = jnp.zeros((T, vals.shape[1])).at[idx].add(vals)
    got = scatter_add_sorted(idx, vals, jnp.zeros((T, vals.shape[1])))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_random_dense_workload(rng):
    # hash-workload regime: rows >> slots (every slot hit many times)
    M, T, F = 8192, 256, 2
    _check(rng.integers(0, T, M), rng.normal(size=(M, F)), T)


def test_skewed_hot_slots(rng):
    # coarse-level regime: a handful of hot cells take most rows
    M, T, F = 4096, 4096, 2
    idx = np.where(rng.random(M) < 0.9, rng.integers(0, 8, M),
                   rng.integers(0, T, M))
    _check(idx, rng.normal(size=(M, F)), T)


def test_sparse_block_span_repair(rng):
    # adversarial: indices spaced > 2*WINDOW apart within one block, so
    # the kernel MUST drop them and the lax.cond repair must fire
    M, F = BLOCK_ROWS, 2
    T = 8 * WINDOW * BLOCK_ROWS // 128  # huge sparse table
    idx = (np.arange(M) * (3 * WINDOW)) % T
    _check(np.sort(idx), rng.normal(size=(M, F)), T)


def test_uniform_1_row_per_slot_never_drops(rng):
    """The production fine-level hash regime: M rows uniform over T=M
    slots (~1 row/slot, block span ~BLOCK_ROWS). Round-4 forensics: at
    SPAN=2 windows this overflowed on ~half the blocks and fired the
    full-length repair scatter on every call (5.0M rows/s e2e, losing
    0.83x to plain XLA on the 8.4M-row prod-chunk probe). SPAN=3
    guarantees 2*WINDOW+1 slots past each block's first row — assert
    zero dropped rows via the module's own base/span formula, plus
    parity."""
    M = 8 * BLOCK_ROWS
    T = M
    idx = np.sort(rng.integers(0, T, M)).astype(np.int32)
    bases = (idx[::BLOCK_ROWS] // WINDOW) * WINDOW
    dropped = idx - np.repeat(bases, BLOCK_ROWS)[:M] >= SPAN
    assert dropped.sum() == 0, (
        f"{dropped.sum()} rows overflow the {SPAN}-slot block coverage "
        "at 1 row/slot — the repair fallback would fire on the hot path")
    _check(idx, rng.normal(size=(M, 2)), T)


def test_unpadded_tail_and_tiny_table(rng):
    # M not a multiple of BLOCK_ROWS; T smaller than one window
    M, T, F = BLOCK_ROWS + 37, 100, 2
    _check(rng.integers(0, T, M), rng.normal(size=(M, F)), T)


def test_sorted_input_path(rng):
    M, T, F = 4096, 512, 2
    idx = np.sort(rng.integers(0, T, M)).astype(np.int32)
    vals = rng.normal(size=(M, F)).astype(np.float32)
    want = jnp.zeros((T, F)).at[jnp.asarray(idx)].add(jnp.asarray(vals))
    got = sorted_segment_sum(jnp.asarray(idx), jnp.asarray(vals),
                             jnp.zeros((T, F)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grad_table_sorted_matches_grad_table():
    """HashGridEncoder.grad_table_sorted (the production wiring of this
    kernel, training/split_step.py scatter_impl="sorted") == the plain
    scatter formulation, including the chunked/padded path."""
    from makeit3d_tpu.ops.encoding import HashGridEncoder

    enc = HashGridEncoder(n_levels=2, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, desired_resolution=16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    dfeat = jax.random.normal(jax.random.PRNGKey(2), (300, enc.output_dim))
    want = enc.grad_table(x, dfeat, chunk=128)
    got = enc.grad_table_sorted(x, dfeat, chunk=128)  # padded tail
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
