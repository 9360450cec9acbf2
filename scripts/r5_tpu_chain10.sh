#!/bin/bash
# Round-5 TPU work queue #10: price the opt-in boxed EVAL march — frame
# latency (drive_eval_skip, 800²) and oracle agreement (fidelity with
# FIDELITY_EVAL_BOXED=1), both on the converged sigma-cap asset.
# Waits for chain9.
cd /root/repo

if [ -f /tmp/chain9.pid ]; then
  while kill -0 "$(cat /tmp/chain9.pid)" 2>/dev/null; do sleep 60; done
fi

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain10] relay healthy (probe $i)"; return 0
    fi
    echo "[chain10] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain10] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== boxed eval frame timing (800^2) ==="
timeout 2700 env DRIVE_EVAL_BOXED=1 python scripts/drive_eval_skip.py \
  results/teddy_r5/checkpoints/df_best.ckpt 2>&1 | tee results/log_drive_eval_boxed.txt

wait_healthy || exit 1
echo "=== occupancy eval frame timing, same window (control) ==="
timeout 2700 python scripts/drive_eval_skip.py \
  results/teddy_r5/checkpoints/df_best.ckpt 2>&1 | tee results/log_drive_eval_occ.txt

wait_healthy || exit 1
echo "=== boxed eval fidelity vs pure oracle ==="
timeout 3600 env FIDELITY_BACKBONE=fourier FIDELITY_EVAL_BOXED=1 \
  FIDELITY_OUT=results/fidelity_boxed_eval_r5 \
  python scripts/fidelity.py results/teddy_r5/checkpoints/df_best.ckpt 5 256 \
  2>&1 | tee results/log_fidelity_boxed_eval.txt
echo "=== chain10 done ==="
