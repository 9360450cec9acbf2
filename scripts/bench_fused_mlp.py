"""Fused ReLU-MLP kernel vs XLA twin on the real chip: parity + timing.

Sizes mirror the 128^2 flagship step: M = 16384*96 samples, H=256,
6 layers, Din padded to 128. Fetch-based timing (block_until_ready is
not a completion barrier through the axon relay).

Usage: python scripts/bench_fused_mlp.py [M] [n_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, n, flops=None):
    out = fn(0)
    _ = float(np.asarray(out))
    t0 = time.time()
    for i in range(n):
        out = fn(i + 1)
    _ = float(np.asarray(out))
    dt = (time.time() - t0) / n
    extra = f"  ({flops / dt / 1e12:6.1f} TFLOP/s)" if flops else ""
    print(f"  {name:22s} {dt * 1e3:9.2f} ms{extra}", flush=True)
    return dt


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 16384 * 96
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.ops.pallas.fused_mlp import (
        OUT_PAD, fused_relu_mlp, relu_mlp_reference,
    )

    DIN, H, NH = 128, 256, 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    s = 1.0 / np.sqrt(H)
    w0 = jax.random.normal(ks[0], (DIN, H)) * s
    b0 = jax.random.normal(ks[1], (H,)) * 0.02
    wh = jax.random.normal(ks[2], (NH, H, H)) * s
    bh = jax.random.normal(ks[3], (NH, H)) * 0.02
    wo = jax.random.normal(ks[4], (H, OUT_PAD)) * s
    bo = jax.random.normal(ks[5], (OUT_PAD,)) * 0.02
    e = jax.random.normal(ks[6], (M, DIN))
    c_out = jax.random.normal(ks[7], (M, OUT_PAD)) * 1e-3
    c_ge = jax.random.normal(ks[7], (M, DIN)) * 1e-3
    params = (w0, b0, wh, bh, wo, bo)

    mm = 2 * H * H  # FLOPs per sample per HxH matmul
    fwd_flops = M * (2 * DIN * H * 2 + NH * mm + 2 * H * OUT_PAD)
    grad_flops = fwd_flops * 2          # + q-chain
    bwd_flops = fwd_flops * 5           # recompute + r/s chains + outers

    print(f"[fused_mlp] M={M / 1e6:.2f}M H={H} NH={NH} "
          f"backend={jax.default_backend()}", flush=True)

    # --- parity on this backend (bf16 kernel vs f32 reference) ---
    # NB: slice OUTSIDE jit and pass as an argument. A zero-arg jit
    # closure over `e` bakes the full [M, 128] array into the HLO as a
    # constant — an ~800MB upload through the remote-compile relay that
    # looks like a compile hang.
    e4 = jax.block_until_ready(e[:4096])
    co4, cg4 = c_out[:4096], c_ge[:4096]
    out_k, ge_k = jax.jit(
        lambda e_: fused_relu_mlp(*params, e_, with_grad=True))(e4)
    out_r, ge_r = jax.jit(
        lambda e_: relu_mlp_reference(*params, e_, with_grad=True,
                                      compute_dtype=jnp.bfloat16))(e4)
    err_o = float(jnp.max(jnp.abs(out_k[:, :4] - out_r[:, :4])))
    err_g = float(jnp.max(jnp.abs(ge_k - ge_r)))
    scale = float(jnp.max(jnp.abs(out_r[:, :4])))
    print(f"  parity: |d out| {err_o:.3e} (scale {scale:.2f}), "
          f"|d ge| {err_g:.3e}", flush=True)

    # --- fwd only ---
    f_nog = jax.jit(lambda e_: jnp.sum(
        fused_relu_mlp(*params, e_, with_grad=False)[0]))
    timed("kernel fwd", lambda i: f_nog(e * (1 + 1e-7 * i)), n, fwd_flops)

    r_nog = jax.jit(lambda e_: jnp.sum(relu_mlp_reference(
        *params, e_, with_grad=False, compute_dtype=jnp.bfloat16)[0]))
    timed("xla fwd", lambda i: r_nog(e * (1 + 1e-7 * i)), n, fwd_flops)

    # --- fwd + input-gradient ---
    f_g = jax.jit(lambda e_: sum(jnp.sum(o) for o in fused_relu_mlp(
        *params, e_, with_grad=True)))
    timed("kernel fwd+ge", lambda i: f_g(e * (1 + 1e-7 * i)), n, grad_flops)

    r_g = jax.jit(lambda e_: sum(jnp.sum(o) for o in relu_mlp_reference(
        *params, e_, with_grad=True, compute_dtype=jnp.bfloat16)))
    timed("xla fwd+ge", lambda i: r_g(e * (1 + 1e-7 * i)), n, grad_flops)

    # --- training-style backward (cotangents on out AND ge) ---
    def loss_k(w0, b0, wh, bh, wo, bo, e_, co, cg):
        out, ge = fused_relu_mlp(w0, b0, wh, bh, wo, bo, e_,
                                 with_grad=True)
        return jnp.sum(out * co) + jnp.sum(ge * cg)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5)))

    def run_k(i):
        g = gk(*params, e * (1 + 1e-7 * i), c_out, c_ge)
        return g[0][0, 0]

    timed("kernel train bwd", run_k, n, grad_flops + bwd_flops)

    def loss_r(w0, b0, wh, bh, wo, bo, e_, co, cg):
        out, ge = relu_mlp_reference(w0, b0, wh, bh, wo, bo, e_,
                                     with_grad=True,
                                     compute_dtype=jnp.bfloat16)
        return jnp.sum(out * co) + jnp.sum(ge * cg)

    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5)))

    def run_r(i):
        g = gr(*params, e * (1 + 1e-7 * i), c_out, c_ge)
        return g[0][0, 0]

    timed("xla train bwd", run_r, n, grad_flops + bwd_flops)

    # --- grad parity (kernel bwd vs autodiff of the twin, f32) ---
    gk32 = jax.grad(
        lambda *p: jnp.sum(
            fused_relu_mlp(*p, e[:4096], with_grad=True,
                           compute_dtype=jnp.float32)[0]
            * c_out[:4096])
        + jnp.sum(fused_relu_mlp(*p, e[:4096], with_grad=True,
                                 compute_dtype=jnp.float32)[1]
                  * c_ge[:4096]),
        argnums=(0, 2, 4))(*params)
    gr32 = jax.grad(
        lambda *p: jnp.sum(relu_mlp_reference(
            *p, e[:4096], with_grad=True)[0] * c_out[:4096])
        + jnp.sum(relu_mlp_reference(
            *p, e[:4096], with_grad=True)[1] * c_ge[:4096]),
        argnums=(0, 2, 4))(*params)
    for nm, a, b in zip(("dw0", "dwh", "dwo"), gk32, gr32):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"  grad parity {nm}: rel {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
