"""SDS UNet conv-stack roofline probe (round-3 verdict item 10).

TPU_NOTES round 3 concluded the SDS step (MFU 0.107) is conv-bound
from tower-level evidence (attention swaps moved nothing). This probe
descends one level: time the SD2 UNet's dominant conv shapes — the
ResnetBlock2D GroupNorm->SiLU->Conv3x3 pattern (models/sd/layers.py
:131-155) at the 64x64x320, 32x32x640, 16x16x1280 stages the CFG pair
runs at batch 2 — and decompose

  (a) the raw 3x3 conv, bf16 NHWC, fwd and fwd+bwd  -> achieved FLOP/s
      vs the 197 TFLOP/s v5e bf16 peak (is the conv itself the wall?)
  (b) GN+SiLU+conv vs conv alone                    -> the norm/act tax
      XLA fails to hide (a fused Pallas GN-SiLU would recover at most
      this delta)
  (c) f32 vs bf16 conv                              -> dtype sanity
  (d) the same GEMM FLOPs as a plain matmul         -> XLA conv-lowering
      tax vs the MXU's native tiling

Reference hot loop: /root/reference/nerf/sd.py:138-151 (2x UNet eps
prediction per SDS step). All timings end with one host fetch
(block_until_ready is not a barrier through the axon relay).

Usage: python scripts/probe_conv_roofline.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=5, fetch=lambda out: float(np.asarray(out).sum())):
    out = fn(*args)
    _ = fetch(out)  # compile + warm
    t0 = time.time()
    for _i in range(iters):
        out = fn(*args)
    _ = fetch(out)
    return (time.time() - t0) / iters


def bench_scanned(apply_fn, x0, K=32, iters=3):
    """Per-application time of a shape-preserving op, measured as K
    data-chained applications inside ONE jitted lax.scan program.

    The first version of this probe timed single-op programs through
    the axon relay and measured ~4.7 ms for EVERY shape — that is the
    relay's per-dispatch latency floor, not compute (a 15-GFLOP conv
    at 50% of the v5e's bf16 peak is ~0.15 ms). In-program repetition
    amortizes the dispatch to noise; the 1e-3 rescale keeps bf16
    activations finite across K chained applications."""
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

    PEAK = 197e12
    quick = "--quick" in sys.argv
    # (H, W, C): the SD2 UNet's per-stage resnet conv shapes at the
    # 64x64 latent, batch 2 (CFG pair). FLOPs per conv = 2*B*H*W*C*C*9.
    shapes = [(64, 64, 320), (32, 32, 640), (16, 16, 1280)]
    if quick:
        shapes = shapes[:1]
    B = 2
    key = jax.random.PRNGKey(0)
    results = []

    class GnSiluConv(nn.Module):
        C: int
        dtype: object

        @nn.compact
        def __call__(self, x):
            h = nn.GroupNorm(32, epsilon=1e-6, name="norm")(x)
            h = nn.silu(h)
            return nn.Conv(self.C, (3, 3), padding=1, dtype=self.dtype,
                           name="conv")(h)

    class ConvOnly(nn.Module):
        C: int
        dtype: object

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.C, (3, 3), padding=1, dtype=self.dtype,
                           name="conv")(x)

    for (H, W, C) in shapes:
        x = jax.random.normal(key, (B, H, W, C), jnp.float32)
        flops_fwd = 2.0 * B * H * W * C * C * 9
        row = {"shape": f"{B}x{H}x{W}x{C}", "conv_gflops": round(
            flops_fwd / 1e9, 1)}

        for dtype, tag in ((jnp.bfloat16, "bf16"),
                           (jnp.float32, "f32") if not quick else
                           (None, None)):
            if dtype is None:
                continue
            conv = ConvOnly(C=C, dtype=dtype)
            p = conv.init(key, x)
            dt = bench_scanned(
                lambda c, p=p, conv=conv: conv.apply(p, c),
                x.astype(dtype))
            row[f"conv_{tag}_ms"] = round(dt * 1e3, 3)
            row[f"conv_{tag}_tflops"] = round(flops_fwd / dt / 1e12, 1)
            row[f"conv_{tag}_mfu"] = round(flops_fwd / dt / PEAK, 3)

        # fwd+bwd (x-grad only; SDS backprops through the VAE, the UNet
        # itself is frozen, but XLA still differentiates the latents
        # path -> dgrad convs, no wgrad). grad(x) is shape-preserving
        # in x, so it chains the same way.
        conv = ConvOnly(C=C, dtype=jnp.bfloat16)
        p = conv.init(key, x)
        gradfn = jax.grad(lambda x, p: jnp.sum(
            conv.apply(p, x.astype(jnp.bfloat16)).astype(jnp.float32)))
        dt = bench_scanned(lambda c, p=p: gradfn(c, p),
                           x, K=16)
        row["conv_bf16_fwd_xgrad_ms"] = round(dt * 1e3, 3)
        row["conv_bf16_fwd_xgrad_tflops"] = round(
            2 * flops_fwd / dt / 1e12, 1)

        # GN+SiLU+conv: the norm/act tax
        gnc = GnSiluConv(C=C, dtype=jnp.bfloat16)
        p = gnc.init(key, x)
        dt = bench_scanned(lambda c, p=p: gnc.apply(p, c), x)
        row["gn_silu_conv_bf16_ms"] = round(dt * 1e3, 3)
        base = row.get("conv_bf16_ms")
        if base:
            row["gn_silu_tax_ms"] = round(row["gn_silu_conv_bf16_ms"]
                                          - base, 3)

        # matmul twin: same GEMM as the conv's im2col form
        # [B*H*W, C*9] @ [C*9, C]. The chain re-tiles the [M, C] output
        # back to [M, C*9] (one 2x47 MB HBM round-trip per iteration,
        # ~0.1 ms at 819 GB/s — noted, not subtracted).
        b = jax.random.normal(key, (C * 9, C), jnp.bfloat16)
        a0 = jax.random.normal(key, (B * H * W, C * 9), jnp.bfloat16)
        dt = bench_scanned(
            lambda a, b=b: jnp.tile(
                jnp.dot(a, b, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16), (1, 9)),
            a0)
        row["matmul_twin_ms"] = round(dt * 1e3, 3)
        row["matmul_twin_tflops"] = round(flops_fwd / dt / 1e12, 1)

        print(json.dumps(row), flush=True)
        results.append(row)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
