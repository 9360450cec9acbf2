"""Flash-attention probe: Pallas fused kernel vs the einsum reference
on the SD2 UNet's attention shapes (round-2 verdict item 10).

The SDS hot loop (reference: nerf/sd.py:117-174) runs the UNet with a
CFG batch of 2 at a 64x64 latent; the self-attention score matrices at
the three attended resolutions are [2, h, N, N] with N in {4096, 1024,
256} — the einsum path writes/reads them through HBM (~670 MB f32 at
N=4096 per layer), the Pallas flash kernel never materializes them
(ops dispatch: models/sd/layers.py:scaled_attention).

Stages:
  1. micro: per-shape fwd timing + parity (flash vs einsum), bf16;
  2. unet: full SD2 UNet forward (CFG batch 2) with impl=einsum vs auto;
  3. vae: VAE encode fwd+bwd (the grad-path attention) einsum vs auto.

All timings chain data-dependently and end with ONE host fetch
(block_until_ready is not a barrier through the axon relay).

Usage: python scripts/probe_attention.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=5, fetch=None):
    fetch = fetch or (lambda out: float(np.asarray(out).ravel()[0]))
    out = fn(*args)
    _ = fetch(out)  # compile + warm
    t0 = time.time()
    for _i in range(iters):
        out = fn(*args)
    _ = fetch(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from makeit3d_tpu.models.sd import layers as L

    quick = "--quick" in sys.argv
    rng = np.random.default_rng(0)
    report = {}

    # --- stage 1: per-shape attention micro ---
    shapes = [  # (B, N, heads, d) — SD2 self-attn at 64^2/32^2 latents
        (2, 4096, 5, 64),
        (2, 1024, 10, 64),
    ]
    if not quick:
        shapes.append((2, 4096, 1, 512))  # VAE mid-block shape
    micro = []
    for B, N, h, d in shapes:
        q = jnp.asarray(rng.normal(size=(B, N, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, N, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, N, h, d)), jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)

        def run(impl, q, k, v):
            L.set_attention_impl(impl)
            try:
                fn = jax.jit(lambda q, k, v: L.scaled_attention(
                    q, k, v, scale, jnp.bfloat16))
                dt = bench(fn, q, k, v)
                out = np.asarray(fn(q, k, v), np.float32)
            finally:
                L.set_attention_impl("auto")
            return dt, out

        dt_e, out_e = run("einsum", q, k, v)
        dt_f, out_f = run("flash", q, k, v)
        micro.append({
            "shape": f"B{B}xN{N}xh{h}xd{d}",
            "einsum_ms": round(dt_e * 1e3, 2),
            "flash_ms": round(dt_f * 1e3, 2),
            "speedup": round(dt_e / dt_f, 2),
            "max_abs_diff": float(np.max(np.abs(out_e - out_f))),
        })
        print(json.dumps(micro[-1]), flush=True)
    report["micro"] = micro

    # --- stage 2: full SD2 UNet forward, CFG batch 2 ---
    from makeit3d_tpu.models.sd.unet import sd2_base_unet

    unet = sd2_base_unet(jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    lat = jnp.asarray(rng.normal(size=(2, 64, 64, 4)), jnp.bfloat16)
    t = jnp.asarray([500.0, 500.0])
    ctx = jnp.asarray(rng.normal(size=(2, 77, 1024)), jnp.bfloat16)
    uparams = unet.init(key, lat[:1, :8, :8], t[:1], ctx[:1])

    for impl in ("einsum", "auto"):
        L.set_attention_impl(impl)
        try:
            fn = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
            dt = bench(fn, uparams, lat, t, ctx, iters=5)
        finally:
            L.set_attention_impl("auto")
        report[f"unet_fwd_{impl}_ms"] = round(dt * 1e3, 1)
        print(json.dumps({f"unet_fwd_{impl}_ms": report[f"unet_fwd_{impl}_ms"]}),
              flush=True)

    # --- stage 3: VAE encode fwd+bwd (attention in the grad path) ---
    if not quick:
        from makeit3d_tpu.models.sd.vae import AutoencoderKL

        vae = AutoencoderKL(dtype=jnp.bfloat16)
        img = jnp.asarray(rng.normal(size=(1, 512, 512, 3)), jnp.bfloat16)
        vparams = vae.init(key, jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                           method="encode_moments")

        for impl in ("einsum", "auto"):
            L.set_attention_impl(impl)
            try:
                def loss(x):
                    mean, _ = vae.apply(vparams, x, method="encode_moments")
                    return jnp.sum(mean.astype(jnp.float32) ** 2)

                fn = jax.jit(jax.grad(loss))
                dt = bench(fn, img, iters=3,
                           fetch=lambda g: float(np.asarray(
                               g.astype(jnp.float32).ravel()[0])))
            finally:
                L.set_attention_impl("auto")
            report[f"vae_encode_grad_{impl}_ms"] = round(dt * 1e3, 1)
            print(json.dumps({f"vae_encode_grad_{impl}_ms":
                              report[f"vae_encode_grad_{impl}_ms"]}),
                  flush=True)

    print(json.dumps({"summary": report}))


if __name__ == "__main__":
    main()
