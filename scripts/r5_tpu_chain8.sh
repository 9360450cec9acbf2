#!/bin/bash
# Round-5 TPU work queue #8: convergence evidence for the boxed-march
# default — a full 2000-iter coarse asset trained boxed, its fidelity
# harness run, and an eval-render orbit. Waits for chain7.
cd /root/repo

if [ -f /tmp/chain7.pid ]; then
  while kill -0 "$(cat /tmp/chain7.pid)" 2>/dev/null; do sleep 60; done
fi

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain8] relay healthy (probe $i)"; return 0
    fi
    echo "[chain8] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain8] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== 2000-iter boxed-march coarse asset ==="
timeout 7200 python -m makeit3d_tpu.main \
  --ref_path /root/reference/demo/teddy.png --workspace teddy_boxed_r5 \
  --iters 2000 --guidance none --backbone fourier --h 128 --w 128 \
  --eval_ref_hit

wait_healthy || exit 1
echo "=== fidelity harness on the boxed asset ==="
timeout 3600 env FIDELITY_BACKBONE=fourier FIDELITY_OUT=results/fidelity_boxed_r5 \
  python scripts/fidelity.py results/teddy_boxed_r5/checkpoints/df_best.ckpt 5 256 \
  2>&1 | tee results/log_fidelity_boxed_r5.txt
echo "=== chain8 done ==="
