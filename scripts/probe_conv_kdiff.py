"""K-difference re-measurement of the conv roofline (round 5).

probe_conv_batch.py exposed a harness artifact: its own 2048^3 bf16
matmul anchor measured 21.4 TF on a chip that does 153 TF on the same
shape — the scanned-program harness divides a fixed per-PROGRAM cost
(relay execute/fetch latency, ~20-25 ms) by K=32 applications, adding
~0.7 ms to every per-op time. All absolute numbers in the first two
conv probes are inflated by that constant; only differences are clean.

Fix: time the same scanned program at K1=32 and K2=160 and report
  (t(K2) - t(K1)) / (K2 - K1)
— the fixed program cost cancels exactly, leaving the marginal per-
application time. Anchor first: if the 2048^3 matmul lands near 153 TF
the method is sound in this window.

Reference hot loop: /root/reference/nerf/sd.py:138-151.

Usage: python scripts/probe_conv_kdiff.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scanned(apply_fn, x0, K):
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
    iters = 3
    for _i in range(iters):
        _ = float(np.asarray(run(x0)))
    return (time.time() - t0) / iters


def kdiff_ms(apply_fn, x0, K1=32, K2=160):
    t1 = scanned(apply_fn, x0, K1)
    t2 = scanned(apply_fn, x0, K2)
    return (t2 - t1) / (K2 - K1) * 1e3, (t1 - (t2 - t1) / (K2 - K1) * K1) * 1e3


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

    w = jax.random.normal(key, (2048, 2048), jnp.bfloat16)
    ms, fixed = kdiff_ms(lambda x: x @ w, w)
    row = {"anchor": "2048^3 bf16 matmul", "ms_marginal": round(ms, 4),
           "tflops": round(2.0 * 2048**3 / (ms * 1e-3) / 1e12, 1),
           "fixed_program_ms": round(fixed, 1)}
    print(json.dumps(row), flush=True)
    out.append(row)

    class GnSiluConv(nn.Module):
        C: int
        gn: bool

        @nn.compact
        def __call__(self, x):
            h = x
            if self.gn:
                h = nn.GroupNorm(32, epsilon=1e-6, name="norm")(h)
                h = nn.silu(h)
            return nn.Conv(self.C, (3, 3), padding=1, dtype=jnp.bfloat16,
                           name="conv")(h)

    # SD2 UNet resnet stages at CFG batch 2, plus the batch sweep at 64^2
    for (B, H, W, C) in ((2, 64, 64, 320), (2, 32, 32, 640),
                         (2, 16, 16, 1280), (8, 64, 64, 320),
                         (32, 64, 64, 320)):
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        flops = 2.0 * B * H * W * C * C * 9
        m = GnSiluConv(C=C, gn=False)
        p = m.init(key, x)
        ms, _ = kdiff_ms(lambda z: m.apply(p, z), x)
        mg = GnSiluConv(C=C, gn=True)
        pg = mg.init(key, x)
        msg, _ = kdiff_ms(lambda z: mg.apply(pg, z), x)
        row = {"shape": f"{B}x{H}x{W}x{C}",
               "conv_ms": round(ms, 4),
               "tflops": round(flops / (ms * 1e-3) / 1e12, 1),
               "mfu_vs_197": round(flops / (ms * 1e-3) / 197e12, 3),
               "gn_silu_tax_ms": round(msg - ms, 4)}
        print(json.dumps(row), flush=True)
        out.append(row)

    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
