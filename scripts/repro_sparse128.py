"""128x128 sparse-grid fault repro / soak test (docs/TPU_NOTES.md).

Loads the round-1 trained teddy checkpoint (realistically sparse
field-derived occupancy, the regime that faulted the v5e at step 1) and
runs N consecutive 128^2 train steps with NO elastic recovery, so any
worker fault surfaces immediately.

Usage: python scripts/repro_sparse128.py [n_steps] [h]
Exit 0 = survived every step; the fault reproduces as JaxRuntimeError.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(
        h=h, w=h, guidance="none", workspace="results",
        albedo_iters=1000, iters=10000,
    )
    trainer = Trainer(
        cfg, name="repro128",
        use_checkpoint="results/teddy_tpu/checkpoints/df_ep0010.ckpt",
    )
    occ = np.asarray(trainer.grid.occ)
    print(f"grid occupancy: {occ.mean():.4%} "
          f"(global_step={trainer.global_step})", flush=True)

    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w, size=100,
                          seed=3)
    t0 = time.time()
    last = t0
    for i in range(n_steps):
        if trainer.global_step % cfg.update_extra_interval == 0:
            key, k = jax.random.split(trainer.key)
            trainer.grid = trainer._update_grid(trainer.params, trainer.grid, k)
            trainer.key = key
        view = sampler.get(i % sampler.size)
        metrics, _ = trainer.step(view)
        if (i + 1) % 100 == 0:
            loss = float(metrics["loss"])
            now = time.time()
            print(f"step {i + 1}/{n_steps} loss={loss:.4f} "
                  f"({100 / (now - last):.1f} it/s)", flush=True)
            last = now
            assert np.isfinite(loss), f"non-finite loss at step {i + 1}"
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    print(f"SURVIVED {n_steps} steps at {h}x{h} in {dt:.1f}s "
          f"({n_steps / dt:.1f} it/s)", flush=True)


if __name__ == "__main__":
    main()
