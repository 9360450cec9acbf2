"""Pallas TPU kernel: per-tile point-splat compositing.

The refine stage's hot op (reference: nerf/refine_utils.py:306-333
render_point via pytorch3d's CUDA rasterizer). The XLA formulation lives
in ops/point_raster.py (tile_render); this kernel fuses the whole
per-tile pipeline — pixel/point distances, splat alpha, z-ordered
over-compositing, feature accumulation — into one VMEM-resident program:

  dist2[p, k]   = (px_p - x_k)^2 + (py_p - y_k)^2          (VPU)
  alpha[p, k]   = hit ? 1 - sqrt(clip(.1 d2/r2, 1e-3, 1)) : 0
  nbefore[p, k] = #hits before k       = hit  @ LT         (MXU)
  logT[p, k]    = sum_{j<k} log(1-a_j) = log1p(-a) @ LT    (MXU)
  w             = alpha * exp(logT) * [nbefore < ppp]
  img[p, :]     = w @ feat                                  (MXU)

where LT[j, k] = 1 iff j < k (strictly upper-triangular ones) — the cumulative
sums ride the MXU instead of a serial scan. Point positions are frozen
(reference freezes vertices during refine, nerf/utils.py:812-813), so w
is constant w.r.t. gradients and the backward is the single matmul
d(feat) = w^T @ d(img), implemented as a second Pallas kernel via
custom_vjp.

Multi-pass support (pytorch3d bins EVERY point per tile,
refine_utils.py:317-331; a fixed per-tile capacity must not silently
drop the overflow): the kernel takes per-pixel carries (logT, hit count)
from earlier passes over the same tile's z-sorted list and returns the
updated carries, so a lax.scan over capacity-sized chunks composites the
full list exactly.

Runs in interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_mode


def _weights_body(txy_ref, tvalid_ref, px_ref, py_ref, lt_ref,
                  logt_c_ref, nhit_c_ref,
                  r_ndc2: float, ppp: int, inv_h2: float):
    """Shared forward math -> (weights [P, K], alpha, hit) with carries
    from earlier passes folded in."""
    px = px_ref[0, :]                      # [P]
    py = py_ref[0, :]
    tx = txy_ref[:, 0]                     # [K]
    ty = txy_ref[:, 1]
    dx = (px[:, None] - tx[None, :]) * inv_h2
    dy = (py[:, None] - ty[None, :]) * inv_h2
    dist2 = dx * dx + dy * dy              # [P, K]
    hit = (dist2 <= r_ndc2) & (tvalid_ref[0, :] > 0)[None, :]
    d = jnp.clip(0.1 * dist2 / r_ndc2, 1e-3, 1.0)
    alpha = jnp.where(hit, 1.0 - jnp.sqrt(d), 0.0)
    # truncate to the first ppp hits in z order (list order is z order),
    # counting hits from earlier passes (nhit carry)
    hit_f = hit.astype(jnp.float32)
    nbefore = jnp.dot(hit_f, lt_ref[:, :], preferred_element_type=jnp.float32)
    nbefore = nbefore + nhit_c_ref[0, :][:, None]
    alpha = jnp.where(nbefore < ppp, alpha, 0.0)
    # over-compositing: T_before = prod_{j<k}(1 - a_j) x exp(logT carry);
    # a < 1 - sqrt(1e-3) so log1p never sees -1
    logt = jnp.dot(jnp.log1p(-alpha), lt_ref[:, :],
                   preferred_element_type=jnp.float32)
    logt = logt + logt_c_ref[0, :][:, None]
    return alpha * jnp.exp(logt), alpha, hit_f


def _fwd_kernel(txy_ref, tfeat_ref, tvalid_ref, px_ref, py_ref, lt_ref,
                logt_c_ref, nhit_c_ref,
                img_ref, acc_ref, logt_o_ref, nhit_o_ref,
                *, r_ndc2, ppp, inv_h2):
    w, alpha, hit_f = _weights_body(
        txy_ref, tvalid_ref, px_ref, py_ref, lt_ref, logt_c_ref, nhit_c_ref,
        r_ndc2, ppp, inv_h2)
    img_ref[:, :] = jnp.dot(w, tfeat_ref[:, :],
                            preferred_element_type=jnp.float32)
    acc_ref[0, :] = jnp.sum(w, axis=1)
    logt_o_ref[0, :] = logt_c_ref[0, :] + jnp.sum(jnp.log1p(-alpha), axis=1)
    nhit_o_ref[0, :] = nhit_c_ref[0, :] + jnp.sum(hit_f, axis=1)


def _bwd_kernel(txy_ref, tvalid_ref, px_ref, py_ref, lt_ref,
                logt_c_ref, nhit_c_ref, gimg_ref,
                dfeat_ref, *, r_ndc2, ppp, inv_h2):
    w, _, _ = _weights_body(
        txy_ref, tvalid_ref, px_ref, py_ref, lt_ref, logt_c_ref, nhit_c_ref,
        r_ndc2, ppp, inv_h2)
    # d(feat) = w^T @ d(img): [K, P] @ [P, C]
    dfeat_ref[:, :] = jax.lax.dot_general(
        w, gimg_ref[:, :], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_spec(K):
    return pl.BlockSpec((None, 1, K), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def splat_tiles(tile_xy, tile_feat, tile_valid, pix_x, pix_y,
                logt_carry, nhit_carry,
                r_ndc2: float, ppp: int, inv_h2: float):
    """Composite one capacity-chunk of every tile's z-sorted point list.

    tile_xy    [T, K, 2] screen-space point centers (z-ascending per tile)
    tile_feat  [T, K, C] per-point features (the only differentiable input)
    tile_valid [T, K]    slot validity (float or bool)
    pix_x/y    [T, P]    pixel-center coordinates
    logt_carry [T, P]    per-pixel log-transmittance from earlier passes
                         (zeros for the first pass)
    nhit_carry [T, P]    per-pixel hit count from earlier passes
    returns (img [T, P, C], acc [T, P], logt_out [T, P], nhit_out [T, P]);
    img/acc are THIS pass's contribution — callers sum across passes.

    Static args: r_ndc2 (splat radius^2, NDC), ppp (points per pixel),
    inv_h2 (2/H pixel->NDC scale).
    """
    return _splat_fwd_impl(tile_xy, tile_feat, tile_valid, pix_x, pix_y,
                           logt_carry, nhit_carry, r_ndc2, ppp, inv_h2)


def _splat_fwd_impl(tile_xy, tile_feat, tile_valid, pix_x, pix_y,
                    logt_carry, nhit_carry, r_ndc2, ppp, inv_h2):
    T, K, _ = tile_xy.shape
    P = pix_x.shape[1]
    C = tile_feat.shape[-1]
    lt = jnp.asarray(np.triu(np.ones((K, K), np.float32), k=1))
    valid_f = tile_valid.astype(jnp.float32).reshape(T, 1, K)
    kern = functools.partial(_fwd_kernel, r_ndc2=float(r_ndc2), ppp=int(ppp),
                             inv_h2=float(inv_h2))
    img, acc, logt_o, nhit_o = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((None, K, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K, C), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(K),
            _row_spec(P),
            _row_spec(P),
            pl.BlockSpec((K, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
            _row_spec(P),
            _row_spec(P),
        ],
        out_specs=(
            pl.BlockSpec((None, P, C), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(P),
            _row_spec(P),
            _row_spec(P),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, P, C), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(tile_xy, tile_feat, valid_f, pix_x.reshape(T, 1, P),
      pix_y.reshape(T, 1, P), lt, logt_carry.reshape(T, 1, P),
      nhit_carry.reshape(T, 1, P))
    return (img, acc.reshape(T, P), logt_o.reshape(T, P),
            nhit_o.reshape(T, P))


def _splat_fwd(tile_xy, tile_feat, tile_valid, pix_x, pix_y,
               logt_carry, nhit_carry, r_ndc2, ppp, inv_h2):
    out = _splat_fwd_impl(tile_xy, tile_feat, tile_valid, pix_x, pix_y,
                          logt_carry, nhit_carry, r_ndc2, ppp, inv_h2)
    return out, (tile_xy, tile_valid, pix_x, pix_y, logt_carry, nhit_carry,
                 tile_feat.shape)


def _splat_bwd(r_ndc2, ppp, inv_h2, res, cts):
    (tile_xy, tile_valid, pix_x, pix_y, logt_carry, nhit_carry,
     feat_shape) = res
    g_img, _g_acc, _g_logt, _g_nhit = cts  # only img flows to features
    T, K, C = feat_shape
    P = pix_x.shape[1]
    lt = jnp.asarray(np.triu(np.ones((K, K), np.float32), k=1))
    valid_f = tile_valid.astype(jnp.float32).reshape(T, 1, K)
    kern = functools.partial(_bwd_kernel, r_ndc2=float(r_ndc2), ppp=int(ppp),
                             inv_h2=float(inv_h2))
    dfeat = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((None, K, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(K),
            _row_spec(P),
            _row_spec(P),
            pl.BlockSpec((K, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
            _row_spec(P),
            _row_spec(P),
            pl.BlockSpec((None, P, C), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, K, C), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, K, C), jnp.float32),
        interpret=interpret_mode(),
    )(tile_xy, valid_f, pix_x.reshape(T, 1, P), pix_y.reshape(T, 1, P),
      lt, logt_carry.reshape(T, 1, P), nhit_carry.reshape(T, 1, P), g_img)
    return (jnp.zeros_like(tile_xy), dfeat, jnp.zeros_like(tile_valid),
            jnp.zeros_like(pix_x), jnp.zeros_like(pix_y),
            jnp.zeros_like(logt_carry), jnp.zeros_like(nhit_carry))


splat_tiles.defvjp(_splat_fwd, _splat_bwd)
