#!/bin/bash
# Round-5 TPU work queue #4: runs after r5_tpu_chain3.sh (waits for its
# pid to exit). Stages: conv batch-scaling addendum, fidelity harness on
# the round-5 sigma-cap asset, and a warm full bench (the .jax_cache now
# holds every tracked-phase program, so the discretionary phases — hash
# A/B, mv-SDS, multi-asset — should land inside the budget this time).
cd /root/repo

if [ -f /tmp/chain3.pid ]; then
  while kill -0 "$(cat /tmp/chain3.pid)" 2>/dev/null; do sleep 60; done
fi

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain4] relay healthy (probe $i)"; return 0
    fi
    echo "[chain4] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain4] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== conv batch-scaling addendum ==="
timeout 1800 python scripts/probe_conv_batch.py 2>&1 | tee results/log_probe_conv_batch_r5.txt

wait_healthy || exit 1
echo "=== fidelity harness on teddy_r5 (sigma-cap asset) ==="
timeout 3600 env FIDELITY_BACKBONE=fourier FIDELITY_OUT=results/fidelity_teddy_r5 \
  python scripts/fidelity.py results/teddy_r5/checkpoints/df_best.ckpt 5 256 \
  2>&1 | tee results/log_fidelity_r5.txt

wait_healthy || exit 1
echo "=== warm full bench ==="
timeout 2400 python bench.py 2>&1 | tee results/log_bench_r5_warm.txt
echo "=== chain4 done ==="
