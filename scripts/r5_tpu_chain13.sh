#!/bin/bash
# Round-5 TPU work queue #13: the multi-asset datum in a clean process
# (no towers, no refine buffers), then one more mv-SDS attempt alone.
cd /root/repo
if [ -f /tmp/chain12.pid ]; then
  while kill -0 "$(cat /tmp/chain12.pid)" 2>/dev/null; do sleep 60; done
fi
wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain13] relay healthy (probe $i)"; return 0
    fi
    echo "[chain13] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain13] relay never recovered"; return 1
}
set -x
wait_healthy || exit 1
echo "=== multi-asset probe ==="
timeout 2400 python scripts/probe_multi_asset.py 2>&1 | tee results/log_probe_multi_asset.txt
wait_healthy || exit 1
echo "=== mv-SDS probe (clean process) ==="
timeout 2400 python scripts/probe_mv_sds.py --quick 2>&1 | tee results/log_probe_mv_r5.txt
echo "=== chain13 done ==="
