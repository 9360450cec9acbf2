"""Fused ReLU-MLP field kernel: forward + analytic input-gradient +
hand-derived parameter backward, each as ONE Pallas program.

The TPU flagship's hot loop is a frequency-encoded MLP evaluated on
~1.6M marched samples per 128^2 step, plus its analytic normal
(-grad_x sigma) and the training backward through both. Under XLA each
of those is a chain of [M, 256] matmuls whose activations round-trip
HBM between layers (~40 TFLOP/s measured end-to-end). This kernel keeps
a sample tile's activations in VMEM through the whole chain and feeds
the MXU back-to-back, tiny-cuda-nn style (equivalent tier: the fully
fused MLP of tcnn consumed by the reference at nerf/network_tcnn.py:54-65).

Why a PLAIN ReLU chain (no LayerNorm/residual): relu'' == 0 almost
everywhere, so the double backward the training loss needs through the
analytic normal degenerates into mask-gated matmul chains that can be
hand-derived and fused (below). The reference's own primary backbone
pairs tcnn's plain-ReLU fused MLP with finite-difference normals
(network_tcnn.py:30-32,115-130); this kernel keeps plain-ReLU but
upgrades to ANALYTIC normals, computed in the same forward program.

Math. Layers (n = n_hidden):
    z_0 = e W_0 + b_0,  h_0 = relu(z_0)
    z_i = h_{i-1} Wh_{i-1} + bh_{i-1},  h_i = relu(z_i)     i = 1..n
    out = h_n W_o + b_o
Input-gradient chain (g_e = d out[..., 0] / d e), masks d_i = [z_i > 0]:
    q_n = d_n * W_o[:, 0]
    q_{i-1} = d_{i-1} * (q_i Wh_{i-1}^T)
    g_e = q_0 W_0^T
Backward of  L = <c_out, out> + <c_ge, g_e>  w.r.t. parameters (masks
are a.e. constant, so no second-order terms survive):
    r-chain:  r_n = c_out W_o^T;  delta_i = d_i * r_i;
              r_{i-1} = delta_i Wh_{i-1}^T
    s-chain:  s_0 = c_ge W_0;     sig_i = d_i * s_i;
              s_i = sig_{i-1} Wh_{i-1}
    dW_o  = h_n^T c_out            + e_col0 @ sum_rows(sig_n)
    dWh_i = h_i^T delta_{i+1}      + sig_i^T q_{i+1}
    dW_0  = e^T delta_0            + c_ge^T q_0
    db    = column sums of the deltas;  d b_o = sum c_out
Gradients w.r.t. `e` are NOT produced (marched sample positions are
non-differentiable in the render path — apply_field_chunked's VJP
already returns zeros for positions); the custom VJP returns zeros.

Every op above is a [T, 256] x [256, 256] matmul or an elementwise mask:
MXU work with zero HBM traffic between layers. Weight gradients
accumulate across the (sequential) sample-tile grid in f32 VMEM blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode

# lane-padded output width (real out dim is 4: sigma + rgb albedo)
OUT_PAD = 128


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a @ b.T without materializing the transpose."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _outer(a, b):
    """a.T @ b (contract over the row/sample axis)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _forward_chain(e, w0_ref, b0_ref, wh_ref, bh_ref, n_hidden, dtype):
    """Shared fwd: returns the list of hidden activations [h_0 .. h_n]."""
    z = _dot(e, w0_ref[:, :].astype(dtype)) + b0_ref[0, :]
    hs = [jnp.maximum(z, 0.0)]
    for i in range(n_hidden):
        z = _dot(hs[-1].astype(dtype), wh_ref[i].astype(dtype)) + bh_ref[i, 0, :]
        hs.append(jnp.maximum(z, 0.0))
    return hs


def _grad_chain(hs, wh_ref, wo_ref, n_hidden, dtype):
    """Shared input-gradient chain: returns [q_0 .. q_n] (built downward)."""
    d_n = (hs[n_hidden] > 0.0).astype(jnp.float32)
    q = d_n * wo_ref[:, 0][None, :]
    qs = [q]
    for i in reversed(range(n_hidden)):
        d = (hs[i] > 0.0).astype(jnp.float32)
        q = d * _dot_t(q.astype(dtype), wh_ref[i].astype(dtype))
        qs.append(q)
    qs.reverse()  # qs[i] == q_i
    return qs


def _fwd_kernel(e_ref, w0_ref, b0_ref, wh_ref, bh_ref, wo_ref, bo_ref,
                out_ref, *ge_ref, n_hidden, with_grad, dtype):
    e = e_ref[:, :].astype(dtype)
    hs = _forward_chain(e, w0_ref, b0_ref, wh_ref, bh_ref, n_hidden, dtype)
    out_ref[:, :] = (
        _dot(hs[-1].astype(dtype), wo_ref[:, :].astype(dtype)) + bo_ref[0, :]
    )
    if with_grad:
        qs = _grad_chain(hs, wh_ref, wo_ref, n_hidden, dtype)
        ge_ref[0][:, :] = _dot_t(qs[0].astype(dtype),
                                 w0_ref[:, :].astype(dtype))


def _bwd_kernel(e_ref, w0_ref, b0_ref, wh_ref, bh_ref, wo_ref,
                cout_ref, *rest, n_hidden, with_grad, dtype):
    if with_grad:
        cge_ref = rest[0]
        rest = rest[1:]
    dw0_ref, db0_ref, dwh_ref, dbh_ref, dwo_ref, dbo_ref = rest
    i_tile = pl.program_id(0)

    @pl.when(i_tile == 0)
    def _init():
        dw0_ref[:, :] = jnp.zeros_like(dw0_ref)
        db0_ref[:, :] = jnp.zeros_like(db0_ref)
        dwh_ref[:, :, :] = jnp.zeros_like(dwh_ref)
        dbh_ref[:, :, :] = jnp.zeros_like(dbh_ref)
        dwo_ref[:, :] = jnp.zeros_like(dwo_ref)
        dbo_ref[:, :] = jnp.zeros_like(dbo_ref)

    e = e_ref[:, :].astype(dtype)
    c_out = cout_ref[:, :]

    # recompute forward (activations stay in VMEM)
    hs = _forward_chain(e, w0_ref, b0_ref, wh_ref, bh_ref, n_hidden, dtype)
    ds = [(h > 0.0).astype(jnp.float32) for h in hs]

    # ---- out-path backward (r-chain) ----
    r = _dot_t(c_out.astype(dtype), wo_ref[:, :].astype(dtype))
    dwo_ref[:, :] += _outer(hs[-1].astype(dtype), c_out.astype(dtype))
    dbo_ref[0, :] += jnp.sum(c_out, axis=0)
    for i in reversed(range(1, n_hidden + 1)):
        delta = ds[i] * r
        dwh_ref[i - 1] += _outer(hs[i - 1].astype(dtype), delta.astype(dtype))
        dbh_ref[i - 1, 0, :] += jnp.sum(delta, axis=0)
        r = _dot_t(delta.astype(dtype), wh_ref[i - 1].astype(dtype))
    delta0 = ds[0] * r
    dw0_ref[:, :] += _outer(e, delta0.astype(dtype))
    db0_ref[0, :] += jnp.sum(delta0, axis=0)

    if with_grad:
        c_ge = cge_ref[:, :]
        qs = _grad_chain(hs, wh_ref, wo_ref, n_hidden, dtype)
        # ge = q_0 W_0^T  ->  dW_0 += c_ge^T q_0
        dw0_ref[:, :] += _outer(c_ge.astype(dtype), qs[0].astype(dtype))
        # s-chain upward
        s = _dot(c_ge.astype(dtype), w0_ref[:, :].astype(dtype))
        sig = ds[0] * s
        for i in range(1, n_hidden + 1):
            # p_{i-1} = q_i Wh_{i-1}^T  ->  dWh_{i-1} += sig_{i-1}^T q_i
            dwh_ref[i - 1] += _outer(sig.astype(dtype), qs[i].astype(dtype))
            s = _dot(sig.astype(dtype), wh_ref[i - 1].astype(dtype))
            sig = ds[i] * s
        # q_n = d_n * W_o[:, 0]  ->  dW_o[:, 0] += sum_rows sig_n
        col = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_PAD), 1)
        dwo_ref[:, :] += jnp.where(
            col == 0, jnp.sum(sig, axis=0)[:, None], 0.0)


def _w_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _fwd_impl(w0, b0, wh, bh, wo, bo, e, *, with_grad, tile, dtype):
    M, Din = e.shape
    n_hidden, H, _ = wh.shape
    assert M % tile == 0, (M, tile)
    assert Din % 128 == 0, Din  # lane-width constraint; callers pad
    kern = functools.partial(_fwd_kernel, n_hidden=n_hidden,
                             with_grad=with_grad, dtype=dtype)
    out_specs = (_row_spec(tile, OUT_PAD),)
    out_shape = (jax.ShapeDtypeStruct((M, OUT_PAD), jnp.float32),)
    if with_grad:
        out_specs += (_row_spec(tile, Din),)
        out_shape += (jax.ShapeDtypeStruct((M, Din), jnp.float32),)
    outs = pl.pallas_call(
        kern,
        grid=(M // tile,),
        in_specs=[
            _row_spec(tile, Din),
            _w_spec(w0.shape), _w_spec((1, H)),
            _w_spec(wh.shape), _w_spec((n_hidden, 1, H)),
            _w_spec(wo.shape), _w_spec((1, OUT_PAD)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret_mode(),
    )(e, w0, b0.reshape(1, H), wh, bh.reshape(n_hidden, 1, H), wo,
      bo.reshape(1, OUT_PAD))
    return outs if with_grad else (outs[0],)


def _bwd_impl(w0, b0, wh, bh, wo, e, c_out, c_ge, *, with_grad, tile, dtype):
    M, Din = e.shape
    n_hidden, H, _ = wh.shape
    kern = functools.partial(_bwd_kernel, n_hidden=n_hidden,
                             with_grad=with_grad, dtype=dtype)
    out_shapes = (
        jax.ShapeDtypeStruct((Din, H), jnp.float32),       # dw0
        jax.ShapeDtypeStruct((1, H), jnp.float32),         # db0
        jax.ShapeDtypeStruct((n_hidden, H, H), jnp.float32),
        jax.ShapeDtypeStruct((n_hidden, 1, H), jnp.float32),
        jax.ShapeDtypeStruct((H, OUT_PAD), jnp.float32),   # dwo
        jax.ShapeDtypeStruct((1, OUT_PAD), jnp.float32),   # dbo
    )
    out_specs = tuple(_w_spec(s.shape) for s in out_shapes)
    in_specs = [
        _row_spec(tile, Din),
        _w_spec(w0.shape), _w_spec((1, H)),
        _w_spec(wh.shape), _w_spec((n_hidden, 1, H)),
        _w_spec(wo.shape),
        _row_spec(tile, OUT_PAD),
    ]
    args = [e, w0, b0.reshape(1, H), wh, bh.reshape(n_hidden, 1, H), wo,
            c_out]
    if with_grad:
        in_specs.append(_row_spec(tile, Din))
        args.append(c_ge)
    dw0, db0, dwh, dbh, dwo, dbo = pl.pallas_call(
        kern,
        grid=(M // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret_mode(),
    )(*args)
    return (dw0, db0.reshape(H), dwh, dbh.reshape(n_hidden, H),
            dwo, dbo.reshape(OUT_PAD))


@functools.cache
def _make_fused(with_grad: bool, tile: int, dtype_name: str):
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    @jax.custom_vjp
    def f(w0, b0, wh, bh, wo, bo, e):
        return _fwd_impl(w0, b0, wh, bh, wo, bo, e,
                         with_grad=with_grad, tile=tile, dtype=dtype)

    def fwd(w0, b0, wh, bh, wo, bo, e):
        out = _fwd_impl(w0, b0, wh, bh, wo, bo, e,
                        with_grad=with_grad, tile=tile, dtype=dtype)
        return out, (w0, b0, wh, bh, wo, e)

    def bwd(res, cts):
        w0, b0, wh, bh, wo, e = res
        if with_grad:
            c_out, c_ge = cts
        else:
            (c_out,), c_ge = cts, None
        dw0, db0, dwh, dbh, dwo, dbo = _bwd_impl(
            w0, b0, wh, bh, wo, e, c_out, c_ge,
            with_grad=with_grad, tile=tile, dtype=dtype)
        # e-gradient intentionally zero: sample positions are
        # non-differentiable in the render path (see module docstring)
        return dw0, db0, dwh, dbh, dwo, dbo, jnp.zeros_like(e)

    f.defvjp(fwd, bwd)
    return f


def fused_relu_mlp(w0, b0, wh, bh, wo, bo, e, *, with_grad: bool,
                   tile: int = 512, compute_dtype=jnp.bfloat16):
    """Fused ReLU MLP: (out [M, OUT_PAD], g_e [M, Din]) if with_grad,
    else (out,).

    w0 [Din, H]; b0 [H]; wh [n_hidden, H, H]; bh [n_hidden, H];
    wo [H, OUT_PAD]; bo [OUT_PAD]; e [M, Din]. Din must be a multiple
    of 128 and M of the tile size (the caller pads).
    """
    M = e.shape[0]
    tile = min(tile, M)
    assert tile >= 8 and M % tile == 0, (M, tile)  # callers pad M
    dtype_name = jnp.dtype(compute_dtype).name
    f = _make_fused(bool(with_grad), tile, dtype_name)
    return f(w0, b0, wh, bh, wo, bo, e)


def relu_mlp_reference(w0, b0, wh, bh, wo, bo, e, *, with_grad: bool,
                       compute_dtype=jnp.float32):
    """Pure-jnp twin of the fused kernel (same math, autodiff-able).

    Used off-TPU and as the parity oracle in tests. Gradients w.r.t. `e`
    flow here (unlike the kernel, which returns zeros) — harmless in the
    render path, which discards position gradients.
    """
    dt = compute_dtype
    n_hidden = wh.shape[0]
    h = jnp.maximum(_dot(e.astype(dt), w0.astype(dt)) + b0, 0.0)
    hs = [h]
    for i in range(n_hidden):
        h = jnp.maximum(
            _dot(hs[-1].astype(dt), wh[i].astype(dt)) + bh[i], 0.0)
        hs.append(h)
    out = _dot(hs[-1].astype(dt), wo.astype(dt)) + bo
    if not with_grad:
        return (out,)
    q = (hs[-1] > 0.0).astype(jnp.float32) * wo[:, 0][None, :]
    for i in reversed(range(n_hidden)):
        q = (hs[i] > 0.0).astype(jnp.float32) * _dot_t(
            q.astype(dt), wh[i].astype(dt))
    ge = _dot_t(q.astype(dt), w0.astype(dt))
    return out, ge
