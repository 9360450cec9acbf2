#!/bin/bash
# Round-5 TPU work queue #7: price + quality-gate the gather-free boxed
# march, re-run the refine demo with the opening ref-hit filter, then a
# final instrumented full bench. Waits for chain6.
cd /root/repo

if [ -f /tmp/chain6.pid ]; then
  while kill -0 "$(cat /tmp/chain6.pid)" 2>/dev/null; do sleep 60; done
fi

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain7] relay healthy (probe $i)"; return 0
    fi
    echo "[chain7] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain7] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== march-mode speed probe ==="
timeout 2400 python scripts/probe_march_mode.py 2>&1 | tee results/log_probe_march_mode.txt

wait_healthy || exit 1
echo "=== boxed quality A/B (3 seeds, shaded steps active) ==="
timeout 5400 env AB_OVERRIDES='{"albedo_iters":100,"march_mode":"boxed"}' \
  AB_SEEDS=0,1,2 AB_TAG=_boxed python scripts/quality_ab.py 400 64 fourier \
  2>&1 | tee results/log_ab_boxed_r5.txt

wait_healthy || exit 1
echo "=== refine demo r5c: opening ref-hit point cloud ==="
mkdir -p results/teddy_refine_r5c/checkpoints
cp -n results/teddy_r5/checkpoints/*.ckpt results/teddy_refine_r5c/checkpoints/ || true
timeout 10800 python -m makeit3d_tpu.main \
  --ref_path /root/reference/demo/teddy.png --workspace teddy_refine_r5c \
  --iters 2000 --guidance stable-diffusion --tiny_guidance --fp16 \
  --backbone fourier --h 256 --w 256 --refine --refine_iters 600 \
  --eval_ref_hit --text "a teddy bear"

wait_healthy || exit 1
echo "=== final instrumented full bench ==="
timeout 2400 python bench.py 2>&1 | tee results/log_bench_r5_final.txt
echo "=== chain7 done ==="
