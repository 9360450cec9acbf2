#!/bin/bash
# Round-5 TPU work queue #5: refine demo re-run with the reference-view
# first-hit eval filter (--eval_ref_hit). The first demo run
# (results/teddy_refine_r5) fused its point cloud from mvimg renders that
# marched junk components the dust keep-rule could not separate
# (TPU_NOTES round 5); this run rebuilds the cloud from first-hit-
# validated renders so the before/after orbit is eyeball-checkable.
cd /root/repo

if [ -f /tmp/chain4.pid ]; then
  while kill -0 "$(cat /tmp/chain4.pid)" 2>/dev/null; do sleep 60; done
fi

wait_healthy() {
  for i in $(seq 1 180); do
    if timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024)); _ = float(np.asarray((x @ x).sum()))
" >/dev/null 2>&1; then
      echo "[chain5] relay healthy (probe $i)"; return 0
    fi
    echo "[chain5] relay degraded, waiting (probe $i)"; sleep 120
  done
  echo "[chain5] relay never recovered"; return 1
}

set -x
wait_healthy || exit 1
echo "=== refine demo, ref-hit point cloud (coarse teddy_r5 -> mvimg -> refine 600) ==="
mkdir -p results/teddy_refine_r5b/checkpoints
cp -n results/teddy_r5/checkpoints/*.ckpt results/teddy_refine_r5b/checkpoints/ || true
timeout 10800 python -m makeit3d_tpu.main \
  --ref_path /root/reference/demo/teddy.png --workspace teddy_refine_r5b \
  --iters 2000 --guidance stable-diffusion --tiny_guidance --fp16 \
  --backbone fourier --h 256 --w 256 --refine --refine_iters 600 \
  --eval_ref_hit --text "a teddy bear"
echo "=== chain5 done ==="
