"""Fault-isolation probe for the encode-split pipeline at 128x128.

Runs the split step's two programs (plus the grid-update program) with a
block_until_ready after EACH, so a worker crash is attributed to the
exact executable that triggered it (scripts/ablate128.py only syncs at
the grid cadence, which smears the attribution over 16 steps and 3
programs).

Usage: python scripts/probe_encsplit.py [n_steps] [h]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.training.split_step import make_split_encode_step
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(h=h, w=h, guidance="none", workspace="results",
                 albedo_iters=0, iters=10**9, split_encode=True)
    print(f"[probe] building trainer ...", flush=True)
    tr = Trainer(cfg, name="probe_encsplit",
                 use_checkpoint="results/teddy_tpu/checkpoints/df_ep0010.ckpt")
    print(f"[probe] ready (occ={float(np.asarray(tr.grid.occ).mean()):.2%})",
          flush=True)

    step = make_split_encode_step(
        cfg, tr.field, tr.optimizer, tr.settings_train, None,
        is_front=False, with_sds=False)
    grad_p = step.grad_program

    sampler = ViewSampler(cfg, type="train", H=h, W=h, size=100, seed=3)
    params, opt_state, grid, key = tr.params, tr.opt_state, tr.grid, tr.key

    stage = "none"
    i = 0
    try:
        for i in range(n_steps):
            t0 = time.time()
            if i % cfg.update_extra_interval == 0:
                stage = "update_grid"
                key, k = jax.random.split(key)
                grid = tr._update_grid(params, grid, k)
                jax.block_until_ready(grid.occ)
            view = sampler.get((2 * i + 1) % 100)  # odd -> novel view
            import jax.numpy as jnp
            from makeit3d_tpu.models.field import (
                SHADING_LAMBERTIAN,
            )

            batch = {
                "rays_o": jnp.asarray(view.rays_o.reshape(-1, 3)),
                "rays_d": jnp.asarray(view.rays_d.reshape(-1, 3)),
                "depth_scale": jnp.asarray(view.depth_scale.reshape(-1)),
                "ref_rgba": tr.ref_rgba,
                "ref_depth": tr.ref_depth,
                "obj_mask": tr.obj_mask,
                "is_large": jnp.asarray(0.0),
                "diff_phase": jnp.asarray(0.0),
                "shading_mode": jnp.asarray(SHADING_LAMBERTIAN, jnp.int32),
                "ambient_ratio": jnp.asarray(0.1, jnp.float32),
            }
            key, k = jax.random.split(key)

            stage = "grad_program"
            gparams, dfeats, positions, metrics, aux = grad_p(
                params, grid, k, batch)
            jax.block_until_ready(metrics["loss"])

            stage = "apply_program"
            params, opt_state = apply_p(params, opt_state, gparams,
                                        dfeats, positions)
            jax.block_until_ready(jax.tree.leaves(params)[0])
            print(f"[probe] step {i + 1}/{n_steps} "
                  f"loss={float(metrics['loss']):.3f} "
                  f"({time.time() - t0:.2f}s)", flush=True)
    except Exception as e:
        print(f"[probe] FAULT in stage '{stage}' at step {i + 1}: "
              f"{type(e).__name__}: {e}", flush=True)
        raise SystemExit(1)
    print(f"[probe] SURVIVED {n_steps} steps at {h}x{h}", flush=True)


if __name__ == "__main__":
    main()
