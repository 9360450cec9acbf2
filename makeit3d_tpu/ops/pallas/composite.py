"""Pallas TPU kernel: transmittance compositing with a hand-derived VJP.

The Pallas twin of ops/composite.composite_rays, mirroring the CUDA
kernel pair kernel_composite_rays_train_forward/backward (reference:
raymarching/src/raymarching.cu:500-693). Per ray block [R, S]:

  sdt        = sigma * dt * valid
  T_before   = exp(-cumsum_excl(sdt))        (cumsum = matmul with UT)
  alpha      = 1 - exp(-sdt)
  w          = alpha * T_before * [T_before >= T_thresh]
  ws, depth, image = sums of w (, * t_cum, * rgb)

Backward (the closed form the CUDA kernel hand-derives at
raymarching.cu:655-667): with per-sample gain
  G_s = g_ws + g_depth * t_cum_s + <g_img, rgb_s>,
  dL/drgb_s   = w_s * g_img
  dL/dsigma_i = dt_i * [ (1 - alpha_i) * T_i * G_i - sum_{s>i} w_s G_s ]
(the early-termination mask rides along inside w, matching the CUDA
behavior of never visiting post-cutoff samples). Both cumulative sums
run as matmuls against triangular ones matrices on the MXU.

RGB planes are passed channel-major ([3, N, S]) so every ref in VMEM
keeps S as the lane dimension. Runs in interpreter mode off TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode


def _fwd_kernel(sig_ref, r_ref, g_ref, b_ref, dt_ref, rdt_ref, v_ref,
                ut_ref, uti_ref, ws_ref, depth_ref, ir_ref, ig_ref, ib_ref,
                *, T_thresh):
    sdt = sig_ref[:, :] * dt_ref[:, :] * v_ref[:, :]
    csum_ex = jnp.dot(sdt, ut_ref[:, :], preferred_element_type=jnp.float32)
    T_before = jnp.exp(-csum_ex)
    alpha = 1.0 - jnp.exp(-sdt)
    live = (T_before >= T_thresh).astype(jnp.float32) * v_ref[:, :]
    w = alpha * T_before * live
    t_cum = jnp.dot(rdt_ref[:, :], uti_ref[:, :],
                    preferred_element_type=jnp.float32)
    ws_ref[0, :] = jnp.sum(w, axis=1)
    depth_ref[0, :] = jnp.sum(w * t_cum, axis=1)
    ir_ref[0, :] = jnp.sum(w * r_ref[:, :], axis=1)
    ig_ref[0, :] = jnp.sum(w * g_ref[:, :], axis=1)
    ib_ref[0, :] = jnp.sum(w * b_ref[:, :], axis=1)


def _bwd_kernel(sig_ref, r_ref, g_ref, b_ref, dt_ref, rdt_ref, v_ref,
                ut_ref, uti_ref, lt_ref, gws_ref, gd_ref, gir_ref, gig_ref,
                gib_ref, dsig_ref, dr_ref, dg_ref, db_ref, *, T_thresh):
    sdt = sig_ref[:, :] * dt_ref[:, :] * v_ref[:, :]
    csum_ex = jnp.dot(sdt, ut_ref[:, :], preferred_element_type=jnp.float32)
    T_before = jnp.exp(-csum_ex)
    alpha = 1.0 - jnp.exp(-sdt)
    live = (T_before >= T_thresh).astype(jnp.float32) * v_ref[:, :]
    w = alpha * T_before * live
    t_cum = jnp.dot(rdt_ref[:, :], uti_ref[:, :],
                    preferred_element_type=jnp.float32)

    gws = gws_ref[0, :][:, None]
    gd = gd_ref[0, :][:, None]
    gir = gir_ref[0, :][:, None]
    gig = gig_ref[0, :][:, None]
    gib = gib_ref[0, :][:, None]
    gain = (gws + gd * t_cum + gir * r_ref[:, :] + gig * g_ref[:, :]
            + gib * b_ref[:, :])
    # suffix sum over s > i of w_s G_s
    suffix = jnp.dot(w * gain, lt_ref[:, :],
                     preferred_element_type=jnp.float32)
    dsig = dt_ref[:, :] * ((1.0 - alpha) * T_before * live * gain - suffix)
    dsig_ref[:, :] = dsig * v_ref[:, :]
    dr_ref[:, :] = w * gir
    dg_ref[:, :] = w * gig
    db_ref[:, :] = w * gib


def _tris(S):
    ut = np.triu(np.ones((S, S), np.float32), k=1)   # j < s (exclusive)
    uti = np.triu(np.ones((S, S), np.float32), k=0)  # j <= s (inclusive)
    lt = np.tril(np.ones((S, S), np.float32), k=-1)  # j > s (suffix)
    return jnp.asarray(ut), jnp.asarray(uti), jnp.asarray(lt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def composite_rays_pallas(sigmas, rgbs, dts, real_dts, valid,
                          T_thresh: float = 1e-4, block: int = 256):
    """(weights_sum [N], depth [N], image [N, 3]) via the Pallas kernels.

    sigmas/dts/real_dts [N, S]; rgbs [N, S, 3]; valid bool/float [N, S].
    N must be a multiple of `block` (the renderer's ray counts are).
    """
    return _fwd_impl(sigmas, rgbs, dts, real_dts, valid, T_thresh, block)


def _specs_nr(S, block):
    return pl.BlockSpec((block, S), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _specs_row(block):
    return pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)


def _specs_tri(S):
    return pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _fwd_impl(sigmas, rgbs, dts, real_dts, valid, T_thresh, block):
    N, S = sigmas.shape
    assert N % block == 0, (N, block)
    ut, uti, lt = _tris(S)
    v = valid.astype(jnp.float32)
    r, g, b = rgbs[..., 0], rgbs[..., 1], rgbs[..., 2]
    kern = functools.partial(_fwd_kernel, T_thresh=float(T_thresh))
    row = jax.ShapeDtypeStruct((1, N), jnp.float32)
    ws, depth, ir, ig, ib = pl.pallas_call(
        kern,
        grid=(N // block,),
        in_specs=[_specs_nr(S, block)] * 7 + [_specs_tri(S)] * 2,
        out_specs=tuple([_specs_row(block)] * 5),
        out_shape=(row, row, row, row, row),
        interpret=interpret_mode(),
    )(sigmas, r, g, b, dts, real_dts, v, ut, uti)
    image = jnp.stack([ir[0], ig[0], ib[0]], axis=-1)
    return ws[0], depth[0], image


def _fwd(sigmas, rgbs, dts, real_dts, valid, T_thresh, block):
    out = _fwd_impl(sigmas, rgbs, dts, real_dts, valid, T_thresh, block)
    return out, (sigmas, rgbs, dts, real_dts, valid)


def _bwd(T_thresh, block, res, cts):
    sigmas, rgbs, dts, real_dts, valid = res
    g_ws, g_depth, g_img = cts
    N, S = sigmas.shape
    ut, uti, lt = _tris(S)
    v = valid.astype(jnp.float32)
    r, g, b = rgbs[..., 0], rgbs[..., 1], rgbs[..., 2]
    kern = functools.partial(_bwd_kernel, T_thresh=float(T_thresh))
    nr = jax.ShapeDtypeStruct((N, S), jnp.float32)
    dsig, dr, dg, db = pl.pallas_call(
        kern,
        grid=(N // block,),
        in_specs=[_specs_nr(S, block)] * 7 + [_specs_tri(S)] * 3
        + [_specs_row(block)] * 5,
        out_specs=tuple([_specs_nr(S, block)] * 4),
        out_shape=(nr, nr, nr, nr),
        interpret=interpret_mode(),
    )(sigmas, r, g, b, dts, real_dts, v, ut, uti, lt,
      g_ws.reshape(1, N), g_depth.reshape(1, N),
      g_img[:, 0].reshape(1, N), g_img[:, 1].reshape(1, N),
      g_img[:, 2].reshape(1, N))
    drgb = jnp.stack([dr, dg, db], axis=-1)
    return (dsig, drgb, jnp.zeros_like(dts), jnp.zeros_like(real_dts), None)


composite_rays_pallas.defvjp(_fwd, _bwd)
