"""Conv batch-scaling addendum to probe_conv_roofline.py (round 5).

The roofline probe found the SD2 UNet's resnet convs sustain only
12-16 TFLOP/s bf16 (6-8% of the 197 TF v5e peak, ~10% of the chip's
measured 153 TF big-matmul rate) at batch 2 — and the same-FLOPs
matmul twin is equally slow, so it is not a conv-lowering tax. Two
hypotheses remain:

  (1) small-M inefficiency: the CFG pair's batch-2 feature maps give
      the MXU too few rows; more views per step (mv-SDS) would recover
      MFU — but the measured mv-SDS datum (B=4: 0.93x per-view) says
      batching does NOT help, contradicting this;
  (2) the ~15 TF rate is the chip/XLA ceiling for these K,N shapes
      regardless of M, in which case the SDS MFU 0.106 is structural
      and the remaining lever is fewer UNet invocations, not faster
      ones.

This probe decides: the 64x64x320 conv at batch {2, 8, 32} (M = 8k,
32k, 131k rows) plus a 2048^3 matmul anchor in the SAME process/window
(so relay health cannot confound the comparison). All timings via the
scanned-program harness (per-dispatch latency amortized; one host
fetch per program).

Reference hot loop this feeds: /root/reference/nerf/sd.py:138-151.

Usage: python scripts/probe_conv_batch.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scanned(apply_fn, x0, K=32, iters=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, _):
            y = apply_fn(c)
            return (y * 1e-3).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(np.asarray(run(x0)))  # compile + warm
    t0 = time.time()
    for _i in range(iters):
        _ = float(np.asarray(run(x0)))
    return (time.time() - t0) / (iters * K)


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    key = jax.random.PRNGKey(0)
    out = []

    # --- anchor: 2048^3 bf16 matmul in this same window ---
    w = jax.random.normal(key, (2048, 2048), jnp.bfloat16)
    ms = bench_scanned(lambda x: x @ w, w) * 1e3
    tf = 2.0 * 2048**3 / (ms * 1e-3) / 1e12
    row = {"anchor": "2048^3 bf16 matmul", "ms": round(ms, 3),
           "tflops": round(tf, 1)}
    print(json.dumps(row), flush=True)
    out.append(row)

    class ConvOnly(nn.Module):
        C: int

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.C, (3, 3), padding=1, dtype=jnp.bfloat16,
                           name="conv")(x)

    H = W = 64
    C = 320
    for B in (2, 8, 32):
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        m = ConvOnly(C=C)
        p = m.init(key, x)
        flops = 2.0 * B * H * W * C * C * 9
        ms = bench_scanned(lambda z: m.apply(p, z), x) * 1e3
        tf = flops / (ms * 1e-3) / 1e12
        row = {"shape": f"{B}x{H}x{W}x{C}", "conv_bf16_ms": round(ms, 3),
               "tflops": round(tf, 1), "mfu_vs_197": round(tf / 197.0, 3)}
        print(json.dumps(row), flush=True)
        out.append(row)

    # same-FLOPs GEMM twin at the batch-32 M (131k rows): if the GEMM
    # recovers at big M but the conv does not, the tax is conv lowering
    # after all (contradicting the batch-2 twin measurement).
    M, K_, N = 32 * H * W, 9 * C, C
    a = jax.random.normal(key, (M, K_), jnp.bfloat16)
    wt = jax.random.normal(key, (K_, N), jnp.bfloat16)
    pad = jnp.zeros((M, K_ - N), jnp.bfloat16)

    def gemm(z):
        y = z @ wt
        return jnp.concatenate([y, pad], axis=1)

    ms = bench_scanned(gemm, a) * 1e3
    tf = 2.0 * M * K_ * N / (ms * 1e-3) / 1e12
    row = {"shape": f"gemm {M}x{K_}x{N}", "ms": round(ms, 3),
           "tflops": round(tf, 1)}
    print(json.dumps(row), flush=True)
    out.append(row)

    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
