#!/bin/bash
# Round-5 TPU work queue, self-gated on relay health: the axon relay's
# execute latency oscillates ~100x on hour scales (docs/TPU_NOTES.md);
# this waits for a healthy window before each stage instead of burning
# stage timeouts on a degraded relay.
cd /root/repo

wait_healthy() {
  for i in $(seq 1 120); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain2] relay healthy (probe $i)"; return 0
    fi
    echo "[chain2] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain2] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== drive eval skip, production dust 0.005 ==="
timeout 2700 env DRIVE_DUST=0.005 python scripts/drive_eval_skip.py \
  results/teddy_r5/checkpoints/df_best.ckpt

wait_healthy || exit 1
echo "=== drive eval skip, dominant-component dust 0.5 ==="
timeout 2700 env DRIVE_DUST=0.5 python scripts/drive_eval_skip.py \
  results/teddy_r5/checkpoints/df_best.ckpt

wait_healthy || exit 1
echo "=== conv roofline (scanned, relay-latency-amortized) ==="
timeout 1800 python scripts/probe_conv_roofline.py

wait_healthy || exit 1
echo "=== refine demo phase B (tiny guidance towers) ==="
timeout 7200 python -m makeit3d_tpu.main \
  --ref_path /root/reference/demo/teddy.png --workspace teddy_r5 \
  --iters 2000 --guidance stable-diffusion --tiny_guidance --fp16 \
  --backbone fourier --h 128 --w 128 --refine --refine_iters 600 \
  --eval_dust_frac 0.5 --text "a teddy bear"
echo "=== chain2 done ==="
