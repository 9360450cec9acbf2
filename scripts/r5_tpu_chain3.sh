#!/bin/bash
# Round-5 TPU work queue #3 (continuation of r5_tpu_chain2.sh, which was
# killed mid-conv-roofline when the driver recycled the session). Same
# relay-health gating: the axon relay's execute latency oscillates ~100x
# on hour scales (docs/TPU_NOTES.md); wait for a healthy window before
# each stage instead of burning stage timeouts on a degraded relay.
cd /root/repo

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain3] relay healthy (probe $i)"; return 0
    fi
    echo "[chain3] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain3] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== conv roofline (scanned, relay-latency-amortized) ==="
timeout 2400 python scripts/probe_conv_roofline.py 2>&1 | tee results/log_probe_conv_r5.txt

wait_healthy || exit 1
echo "=== full bench (tracked floors + hash A/B + multi-asset) ==="
timeout 2400 python bench.py 2>&1 | tee results/log_bench_r5.txt

wait_healthy || exit 1
echo "=== refine demo end-to-end (coarse teddy_r5 -> mvimg -> refine 600) ==="
mkdir -p results/teddy_refine_r5/checkpoints
cp -n results/teddy_r5/checkpoints/*.ckpt results/teddy_refine_r5/checkpoints/ || true
timeout 10800 python -m makeit3d_tpu.main \
  --ref_path /root/reference/demo/teddy.png --workspace teddy_refine_r5 \
  --iters 2000 --guidance stable-diffusion --tiny_guidance --fp16 \
  --backbone fourier --h 256 --w 256 --refine --refine_iters 600 \
  --eval_dust_frac 0.5 --text "a teddy bear"
echo "=== chain3 done ==="
