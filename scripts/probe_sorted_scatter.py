"""Measure the Pallas sorted-segment-sum scatter against the XLA
scatter-add ceiling on the real TPU (round-2 verdict item 4).

Round-2 data (docs/TPU_NOTES.md): every XLA scatter formulation runs at
~16-25M rows/s; sort runs at 50M rows/s; gather at 115-130M rows/s. The
untried formulation is sort (XLA) + block-matmul segment sum (Pallas,
ops/pallas/segsum.py) + fat-slab combine (one scatter of thousands of
[WINDOW, F] rows). This script times each stage and the end-to-end
drop-in on the albedo-step workload shape (hash backward: 1.5M samples
x 8 corners x 16 levels = 200M scattered rows; probed here per-level
and at the flattened [L*T] scale).

All timings chain data-dependently and end with ONE host fetch
(block_until_ready is not a barrier through the axon relay).

Usage: python scripts/probe_sorted_scatter.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=3, fetch=lambda out: float(np.asarray(out).sum())):
    out = fn(*args)
    _ = fetch(out)  # compile + warm
    t0 = time.time()
    for _i in range(iters):
        out = fn(*args)
    _ = fetch(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from makeit3d_tpu.ops.pallas.segsum import (
        scatter_add_sorted, sorted_segment_sum,
    )

    quick = "--quick" in sys.argv
    F = 2
    results = []
    cases = [
        ("per-level", 2_097_152, 1 << 19),
        ("per-level-12M", 12_582_912, 1 << 19),
        # grad_table_sorted's actual per-scan-chunk scatter: 8 corners x
        # 16 levels x 65536 rays = 8.4M rows into the flattened L*T
        # (16<<19) slot space. A 25M-row stress case OOMs at 25.5G HBM
        # (HLO temps from the parity-check double pipeline) — the
        # production chunking never builds one that large.
        ("prod-chunk", 8_388_608, 16 << 19),
    ]
    if quick:
        cases = cases[:1]

    rng = np.random.default_rng(0)
    for name, M, T in cases:
        idx = jnp.asarray(rng.integers(0, T, M), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(M, F)), jnp.float32)
        row = {"case": name, "rows": M, "slots": T}

        # (a) XLA baseline: the measured ~16-25M rows/s ceiling
        base = jax.jit(lambda i, v: jnp.zeros((T, F)).at[i].add(v))
        dt = bench(base, idx, vals)
        row["xla_at_add_s"] = round(dt, 3)
        row["xla_at_add_rows_per_s"] = round(M / dt / 1e6, 1)

        # (b) sort stage alone (argsort + 2 payload gathers)
        sort_fn = jax.jit(lambda i, v: (lambda o: (i[o], v[o]))(
            jnp.argsort(i)))
        dt = bench(sort_fn, idx, vals,
                   fetch=lambda out: float(np.asarray(out[0][-1])))
        row["sort_s"] = round(dt, 3)
        row["sort_rows_per_s"] = round(M / dt / 1e6, 1)

        # (c) Pallas segment sum alone (pre-sorted input)
        order = jnp.argsort(idx)
        sidx, svals = idx[order], vals[order]
        seg = jax.jit(lambda i, v: sorted_segment_sum(
            i, v, jnp.zeros((T, F))))
        dt = bench(seg, sidx, svals)
        row["pallas_segsum_s"] = round(dt, 3)
        row["pallas_segsum_rows_per_s"] = round(M / dt / 1e6, 1)

        # (d) end-to-end drop-in (sort + kernel + combine)
        e2e = jax.jit(lambda i, v: scatter_add_sorted(
            i, v, jnp.zeros((T, F))))
        dt = bench(e2e, idx, vals)
        row["e2e_s"] = round(dt, 3)
        row["e2e_rows_per_s"] = round(M / dt / 1e6, 1)
        row["speedup_vs_xla"] = round(
            row["xla_at_add_s"] / row["e2e_s"], 2)

        # parity spot check (device-side compare, one scalar fetch)
        diff = jax.jit(lambda i, v: jnp.max(jnp.abs(
            scatter_add_sorted(i, v, jnp.zeros((T, F)))
            - jnp.zeros((T, F)).at[i].add(v))))(idx, vals)
        row["max_abs_diff"] = float(np.asarray(diff))

        print(json.dumps(row), flush=True)
        results.append(row)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
