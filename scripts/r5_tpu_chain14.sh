#!/bin/bash
# Round-5 TPU work queue #14: one retry of the mv-SDS probe in a fresh
# window (the previous attempt RESOURCE_EXHAUSTED even in a clean
# process — suspected relay-worker-held HBM).
cd /root/repo
if [ -f /tmp/chain13.pid ]; then
  while kill -0 "$(cat /tmp/chain13.pid)" 2>/dev/null; do sleep 60; done
fi
wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain14] relay healthy (probe $i)"; return 0
    fi
    echo "[chain14] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain14] relay never recovered"; return 1
}
set -x
sleep 600   # give the relay worker time to recycle after the OOM burst
wait_healthy || exit 1
echo "=== mv-SDS probe retry ==="
timeout 2400 python scripts/probe_mv_sds.py --quick 2>&1 | tee results/log_probe_mv_r5b.txt
echo "=== chain14 done ==="
