#!/bin/bash
# Round-5 TPU work queue #11: one fully-warm bench run — every program
# (incl. the new boxed-march SDS towers) is now in .jax_cache, so the
# discretionary phases (hash BOTH legs, mv-SDS, multi-asset) should all
# land inside the budget. Waits for chain11.
cd /root/repo

if [ -f /tmp/chain11.pid ]; then
  while kill -0 "$(cat /tmp/chain11.pid)" 2>/dev/null; do sleep 60; done
fi

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain12] relay healthy (probe $i)"; return 0
    fi
    echo "[chain12] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain12] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== warm full bench (all discretionary phases) ==="
timeout 2400 python bench.py 2>&1 | tee results/log_bench_r5_warm4.txt
echo "=== chain12 done ==="
