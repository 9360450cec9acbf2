#!/bin/bash
# Round-5 TPU work queue #6: K-difference conv re-measurement (cancels
# the scanned-harness's fixed per-program cost that contaminated the
# first two conv probes), after chain5's refine demo finishes.
cd /root/repo

if [ -f /tmp/chain5.pid ]; then
  while kill -0 "$(cat /tmp/chain5.pid)" 2>/dev/null; do sleep 60; done
fi

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain6] relay healthy (probe $i)"; return 0
    fi
    echo "[chain6] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain6] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== conv K-diff re-measurement ==="
timeout 2400 python scripts/probe_conv_kdiff.py 2>&1 | tee results/log_probe_conv_kdiff_r5.txt
echo "=== chain6 done ==="
