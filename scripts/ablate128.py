"""128x128 fault ablation matrix (docs/TPU_NOTES.md forensics, round 2).

Runs one program variant for N steps against the round-1 trained teddy
checkpoint (the faulting data regime) with no recovery. Variants:

  full       -- the production mixed-shading schedule (known to fault)
  albedo     -- every step uses the albedo program (no FD normal probes)
  shaded     -- every step uses the shaded program (FD probes + orient/smooth)
  froztab    -- shaded, but stop_gradient on the hash table (no scatter bwd)
  splitprobe -- shaded, FD probes as 7 separate field evals
                (cfg.split_probes; 7 independent gather->MLP->scatter
                backward chains instead of one fused [7N] chain)
  encsplit   -- shaded via the two-program encode-split pipeline
                (cfg.split_encode; training/split_step.py): froztab-
                shaped grad program + separate scatter/update program

Round-2 results (v5e, teddy ep10 ckpt): full faults at step 1, shaded
faults at step 1, splitprobe faults at step 1, albedo survives 75+,
froztab survives 50 -> the fault is the batched-probe backward FUSED
with the hash-table scatter-add. encsplit is the production fix built
on that finding.

Usage: python scripts/ablate128.py VARIANT [n_steps] [h]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import jax

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.training.trainer import Trainer

    albedo_iters = 10**9 if variant == "albedo" else 0
    cfg = Config(h=h, w=h, guidance="none", workspace="results",
                 albedo_iters=albedo_iters, iters=10**9,
                 split_probes=(variant == "splitprobe"),
                 split_encode=(variant == "encsplit"))
    print(f"[{variant}] building trainer ...", flush=True)
    t0 = time.time()
    tr = Trainer(cfg, name=f"repro_{variant}",
                 use_checkpoint="results/teddy_tpu/checkpoints/df_ep0010.ckpt")
    print(f"[{variant}] trainer ready in {time.time() - t0:.0f}s "
          f"(occ={float(np.asarray(tr.grid.occ).mean()):.2%})", flush=True)

    if variant == "froztab":
        # stop table gradients: rebuild the step with a wrapped field
        import jax.numpy as jnp
        from makeit3d_tpu.training import trainer as T

        class FrozenTableField:
            def __init__(self, f):
                self._f = f
                self.lambert_min = f.lambert_min

            def apply(self, variables, *a, **k):
                variables = jax.tree_util.tree_map_with_path(
                    lambda path, v: (
                        jax.lax.stop_gradient(v)
                        if any(getattr(p, "key", None) == "hash_table"
                               for p in path) else v),
                    variables,
                )
                return self._f.apply(variables, *a, **k)

            def __getattr__(self, name):
                return getattr(self._f, name)

        wrapped = FrozenTableField(tr.field)
        tr._train_step = {
            key: T.make_train_step(
                cfg, wrapped, tr.optimizer, tr.settings_train, None,
                is_front=key[0], salt=0, shaded=key[1], with_sds=False)
            for key in ((True, False, False), (False, False, False),
                        (False, True, False))
        }

    if variant in ("shaded", "froztab", "splitprobe", "encsplit"):
        # force the shaded program on every novel step
        tr._host_rng = type("R", (), {"random": staticmethod(lambda: 0.45)})()

    sampler = ViewSampler(cfg, type="train", H=h, W=h, size=100, seed=3)
    t0 = time.time()
    last = t0
    for i in range(n_steps):
        if tr.global_step % cfg.update_extra_interval == 0:
            key, k = jax.random.split(tr.key)
            tr.grid = tr._update_grid(tr.params, tr.grid, k)
            tr.key = key
        metrics, _ = tr.step(sampler.get(i % 100))
        if i == 0 or (i + 1) % 25 == 0:
            loss = float(metrics["loss"])
            now = time.time()
            print(f"[{variant}] step {i + 1}/{n_steps} loss={loss:.3f} "
                  f"({25 / max(now - last, 1e-9):.1f} it/s)", flush=True)
            last = now
    jax.block_until_ready(metrics["loss"])
    print(f"[{variant}] SURVIVED {n_steps} steps at {h}x{h} "
          f"in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
