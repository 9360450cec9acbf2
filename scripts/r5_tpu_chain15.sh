#!/bin/bash
# Round-5 TPU work queue #15: isolate the mv-SDS OOM — same probe under
# the occupancy march (MV_MARCH_MODE=occupancy). If it fits, the boxed
# program's liveness is the cause and the mv step should pin occupancy.
cd /root/repo
if [ -f /tmp/chain14.pid ]; then
  while kill -0 "$(cat /tmp/chain14.pid)" 2>/dev/null; do sleep 60; done
fi
wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain15] relay healthy (probe $i)"; return 0
    fi
    echo "[chain15] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain15] relay never recovered"; return 1
}
set -x
wait_healthy || exit 1
echo "=== mv-SDS probe, occupancy march ==="
timeout 2400 env MV_MARCH_MODE=occupancy python scripts/probe_mv_sds.py --quick \
  2>&1 | tee results/log_probe_mv_r5_occ.txt
echo "=== chain15 done ==="
