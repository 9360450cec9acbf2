"""Probe scatter formulations for the encode-split apply program.

The fault isolation (scripts/probe_encsplit.py, 2026-08-17) attributed
the encsplit fault to apply_program — the grad_table scatter + Adan
update executable. This probe runs ONE candidate formulation per
process (a worker fault poisons the process) against the real data
regime: positions marched from the round-1 teddy checkpoint's occupancy
grid at 128x128, random feature cotangents.

  opt          -- optimizer.update + param add only (no scatter)
  scatter      -- HashGridEncoder.grad_table as written (hand scatter,
                  uint32 indices, chunked scan)
  scatter_i32  -- same but int32 indices
  scatter_vjp  -- table cotangent via jax.vjp of the encode FORWARD
                  (the exact scatter shape XLA generates inside the
                  fused albedo program, which survives this regime)

Usage: python scripts/probe_scatter.py VARIANT [n_iters] [max_rows]

max_rows truncates the probe-row count (scale hypothesis: the albedo
program's surviving scatter handles 1.5M rows; the encsplit apply
program's handles 22M).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant = sys.argv[1]
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.models.field import make_field
    from makeit3d_tpu.models.renderer import RenderSettings, march_stage
    from makeit3d_tpu.ops.encoding import HashGridEncoder
    from makeit3d_tpu.training.split_step import build_probe_layout

    cfg = Config(h=128, w=128, guidance="none")
    field = make_field(cfg)
    settings = RenderSettings.from_config(cfg, training=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import load_snapshot_grid  # noqa: E402  (repo root on path)

    grid, path = load_snapshot_grid(cfg)
    assert grid is not None, "no trained checkpoint grid found"
    print(f"[{variant}] grid from {path} "
          f"(occ={float(np.asarray(grid.occ).mean()):.2%})", flush=True)

    sampler = ViewSampler(cfg, type="train", H=128, W=128, size=10, seed=3)
    view = sampler.get(1)
    key = jax.random.PRNGKey(0)

    march = jax.jit(lambda g, ro, rd, k: march_stage(
        g, ro, rd, settings, k, perturb=True))
    m = march(grid, jnp.asarray(view.rays_o.reshape(-1, 3)),
              jnp.asarray(view.rays_d.reshape(-1, 3)), key)
    flat_x = m.xyzs.reshape(-1, 3)
    positions = jax.jit(
        lambda fx, k: build_probe_layout(field, settings, fx, k)
    )(flat_x, key)
    max_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    if max_rows:
        positions = positions[:max_rows]
    P = positions.shape[0]
    print(f"[{variant}] P={P} probe rows "
          f"(valid={float(jnp.mean(m.valid)):.1%})", flush=True)

    enc = HashGridEncoder(
        n_levels=field.hash_levels, n_features=field.hash_features,
        log2_hashmap_size=field.log2_hashmap_size,
        base_resolution=field.base_resolution,
        desired_resolution=field.desired_resolution, bound=field.bound)
    dfeats = jax.random.normal(key, (P, enc.output_dim)) * 1e-3
    x01 = (positions + field.bound) / (2.0 * field.bound)
    jax.block_until_ready(dfeats)

    if variant == "opt":
        from makeit3d_tpu.training.optimizer import (
            make_lr_schedule, make_optimizer,
        )

        params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
        optimizer = make_optimizer(cfg, make_lr_schedule(cfg))
        opt_state = optimizer.init(params)

        @jax.jit
        def apply_only(params, opt_state):
            grads = jax.tree.map(jnp.ones_like, params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return jax.tree.map(lambda p, u: p + u, params, updates), opt_state

        fn = lambda: apply_only(params, opt_state)  # noqa: E731
    elif variant == "scatter":
        fn = lambda: enc.grad_table(x01, dfeats)  # noqa: E731
    elif variant == "scatter_i32":
        fn = lambda: enc.grad_table(  # noqa: E731
            x01, dfeats, index_dtype=jnp.int32)
    elif variant == "scatter_flat":
        fn = lambda: enc.grad_table_flat(x01, dfeats)  # noqa: E731
    elif variant == "scatter_vjp":
        chunk = settings.field_chunk
        n_chunks = -(-P // chunk)
        pad = n_chunks * chunk - P
        xp = jnp.pad(x01, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
        dp = jnp.pad(dfeats, ((0, pad), (0, 0))).reshape(
            n_chunks, chunk, enc.output_dim)
        table0 = enc.init_params(key)

        @jax.jit
        def vjp_grad(xp, dp, table):
            def chunk_grad(carry, inp):
                xx, dd = inp
                _, vjp = jax.vjp(lambda t: enc(t, xx), table)
                (g,) = vjp(dd)
                return carry + g, None

            g0 = jnp.zeros_like(table)
            gtab, _ = jax.lax.scan(chunk_grad, g0, (xp, dp))
            return gtab

        fn = lambda: vjp_grad(xp, dp, table0)  # noqa: E731
    else:
        raise SystemExit(f"unknown variant {variant}")

    for i in range(n_iters):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        print(f"[{variant}] iter {i + 1}/{n_iters} ok "
              f"({time.time() - t0:.3f}s)", flush=True)
    print(f"[{variant}] SURVIVED {n_iters} iters", flush=True)


if __name__ == "__main__":
    main()
