"""NeRF field networks.

- HashGridField: hash-grid encoder + 3x64 ReLU MLP, finite-difference
  normals (reference: nerf/network_tcnn.py:37-205, the default backbone).
- VanillaField: frequency encoder + 4x96 ResBlock MLP, analytic normals
  via jax.grad of sigma (reference: nerf/network.py:89-242).

Both output (sigma, color, normal) with the reference's shading modes.
Normal probes are batched into a single field evaluation (7 positions per
sample: center + 6 axis offsets) so the MLP runs as one large matmul on
the MXU instead of 7 small ones.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.encoding import FreqEncoder, HashGridEncoder
from .mlp import ReluMLP, ResMLP

# shading mode codes (traced int32, so one compiled step serves all modes;
# reference passes strings: nerf/utils.py:470-483)
SHADING_ALBEDO = 0
SHADING_LAMBERTIAN = 1
SHADING_TEXTURELESS = 2
SHADING_NORMAL = 3


def probe_positions(x: jnp.ndarray, eps: float, bound: float) -> list:
    """[x, x+dx, x-dx, x+dy, x-dy, x+dz, x-dz], each [N, 3], clipped —
    the center + 6 finite-difference probes (reference:
    network_tcnn.py:115-130). Shared by the in-module batched eval and
    the encode-split pipeline so their row orders agree exactly."""
    parts = [x]
    for axis in range(3):
        off = jnp.zeros((1, 3), x.dtype).at[0, axis].set(eps)
        parts.append(jnp.clip(x + off, -bound, bound))
        parts.append(jnp.clip(x - off, -bound, bound))
    return parts


def fd_combine(sigma_all: jnp.ndarray, N: int, eps: float):
    """(sigma [N], normal [N, 3]) from the [7N] probe-ordered sigmas."""
    sigma = sigma_all[:N]
    sigma_p = sigma_all[N:].reshape(6, N)
    normal = -jnp.stack(
        [
            0.5 * (sigma_p[0] - sigma_p[1]) / eps,
            0.5 * (sigma_p[2] - sigma_p[3]) / eps,
            0.5 * (sigma_p[4] - sigma_p[5]) / eps,
        ],
        axis=-1,
    )
    normal = safe_normalize(normal)
    return sigma, jnp.nan_to_num(normal)


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Unit-normalize with overflow-proof scaling.

    Max-abs pre-scaling keeps the sum-of-squares in [0, 3] for ANY input
    magnitude. The previous sum-sq upper clip (1e32) silently produced
    1e7-magnitude "normals" once finite-difference sigma deltas reached
    ~1e23 (an exploded no-guidance field), which blew loss_orient up to
    1e17. Zero vectors map to zero.
    """
    m = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = x / jnp.maximum(m, eps)
    n2 = jnp.sum(xs * xs, axis=-1, keepdims=True)
    return xs / jnp.sqrt(jnp.maximum(n2, eps))


def _shade(albedo, normal, light_d, ratio, shading_mode, lambert_min: float):
    """Select color by shading mode with traced selectors.

    reference: network_tcnn.py:156-168 (lambert_min=0.1) and
    network.py:195-203 (lambert_min=0.0).
    """
    lambertian = ratio + (1.0 - ratio) * jnp.maximum(
        jnp.sum(normal * light_d, axis=-1, keepdims=True), lambert_min
    )
    color_albedo = albedo
    color_lambert = albedo * lambertian
    color_textureless = jnp.broadcast_to(lambertian, albedo.shape)
    color_normal = (normal + 1.0) / 2.0
    mode = jnp.asarray(shading_mode, jnp.int32)
    color = jnp.where(mode == SHADING_ALBEDO, color_albedo,
             jnp.where(mode == SHADING_LAMBERTIAN, color_lambert,
              jnp.where(mode == SHADING_TEXTURELESS, color_textureless,
                        color_normal)))
    return color


class HashGridField(nn.Module):
    """Instant-NGP style field (tcnn-equivalent backbone)."""

    bound: float = 1.0
    blob_density: float = 5.0
    blob_radius: float = 0.1
    hidden_dim: int = 64
    num_layers: int = 3
    hash_levels: int = 16
    hash_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    desired_resolution: int = 2048
    fd_epsilon: float = 1e-2
    lambert_min: float = 0.1  # reference: network_tcnn.py:160 clamp(min=0.1)
    # Evaluate the 6 finite-difference probes as separate field calls
    # (the reference's structure, network_tcnn.py:115-130) instead of one
    # [7N] batch. Semantically identical; the separate calls give XLA 7
    # independent gather->MLP->scatter chains in the backward, which
    # dodges the axon-v5e Mosaic fusion fault triggered by the batched
    # probe backward fused with the hash-table scatter-add
    # (docs/TPU_NOTES.md, round-2 ablation: albedo+scatter OK,
    # probes-sans-scatter OK, batched probes+scatter faults).
    split_probes: bool = False
    # MLP compute dtype (bfloat16 = MXU fast path; params stay f32 via
    # flax's param_dtype default, as does everything nonlinear:
    # trunc_exp / sigmoid / normals run in f32)
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = HashGridEncoder(
            n_levels=self.hash_levels,
            n_features=self.hash_features,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            desired_resolution=self.desired_resolution,
            bound=self.bound,
        )
        self.table = self.param(
            "hash_table",
            lambda key: self.encoder.init_params(key),
        )
        self.sigma_net = ReluMLP(
            dim_out=4, dim_hidden=self.hidden_dim,
            num_layers=self.num_layers, dtype=self.dtype,
        )

    def gaussian(self, x):
        # density blob init (reference: network_tcnn.py:94-100)
        d = jnp.sum(x**2, axis=-1)
        return self.blob_density * jnp.exp(-d / (2 * self.blob_radius**2))

    def common(self, x):
        """x: [N, 3] in [-bound, bound] -> (sigma [N], albedo [N, 3])."""
        return self.common_from_feats(self.encode(x), x)

    def density(self, x):
        sigma, albedo = self.common(x)
        return {"sigma": sigma, "albedo": albedo}

    def common_from_feats(self, feats, x):
        """MLP head over PRE-COMPUTED hash-encode features (the
        encode-split pipeline's stage 3, training/split_step.py). x is
        only consumed by the density-blob bias; no table access here, so
        this subgraph never contains the hash scatter backward."""
        h = self.sigma_net(feats.astype(self.dtype)).astype(jnp.float32)
        sigma = trunc_exp(h[..., 0] + self.gaussian(x))
        albedo = jax.nn.sigmoid(h[..., 1:])
        return sigma, albedo

    def encode(self, x):
        """Hash-encode only: [N, 3] in [-bound, bound] -> [N, L*F]."""
        h = (x + self.bound) / (2 * self.bound)
        return self.encoder(self.table, h)

    def sigma_albedo_normal(self, x):
        """One batched field eval for center + 6 finite-difference probes.

        reference: network_tcnn.py:115-138 runs common_forward 6 extra
        times; here all 7 positions go through one [7N] batch.

        Memory note (v5e OOM postmortem): the probe batch is built by
        concatenating seven [N, 3] arrays along axis 0. A broadcasted
        [N, 6, 3] probe tensor looks natural but its (6, 3) minor dims
        pad out 20-40x under TPU tiling — at a full-image render that
        single temp was 2.25G of a 15.75G HBM and crashed the chip.
        """
        N = x.shape[0]
        eps = self.fd_epsilon
        parts = probe_positions(x, eps, self.bound)
        if self.split_probes:
            # 7 separate evals (see the attribute docstring); sigma-only
            # probes still produce albedo, matching the batched path's
            # FLOPs, but each probe's backward is its own chain
            sigma, albedo = self.common(parts[0])
            sigma_all = jnp.concatenate(
                [sigma] + [self.common(p)[0] for p in parts[1:]], axis=0)
        else:
            allx = jnp.concatenate(parts, axis=0)  # [7N, 3]
            # probe k occupies rows [(k+1)N, (k+2)N): +x,-x,+y,-y,+z,-z
            sigma_all, albedo_all = self.common(allx)
            albedo = albedo_all[:N]
        sigma, normal = fd_combine(sigma_all, N, eps)
        return sigma, albedo, normal

    def normal(self, x):
        _, _, n = self.sigma_albedo_normal(x)
        return n

    def __call__(self, x, d, light_d=None, ratio=1.0, shading_mode=SHADING_ALBEDO):
        """reference: network_tcnn.py:140-170 (normals always computed)."""
        sigma, albedo, normal = self.sigma_albedo_normal(x)
        if light_d is None:
            light_d = jnp.asarray([0.0, 0.0, 1.0])
        color = _shade(albedo, normal, light_d, ratio, shading_mode, self.lambert_min)
        return sigma, color, normal


class VanillaField(nn.Module):
    """Frequency-encoded MLP field (reference: nerf/network.py)."""

    bound: float = 1.0
    blob_density: float = 5.0
    blob_radius: float = 0.1
    hidden_dim: int = 96
    num_layers: int = 4
    multires: int = 6
    lambert_min: float = 0.0  # reference: network.py:196 clamp(min=0)
    dtype: Any = jnp.float32  # MLP compute dtype (see HashGridField)

    def setup(self):
        self.encoder = FreqEncoder(input_dim=3, multires=self.multires)
        self.sigma_net = ResMLP(
            dim_out=4, dim_hidden=self.hidden_dim,
            num_layers=self.num_layers, dtype=self.dtype,
        )

    def gaussian(self, x):
        # NOTE: vanilla blob has no factor 2 in the denominator
        # (reference: network.py:116-122 vs network_tcnn.py:94-100)
        d = jnp.sum(x**2, axis=-1)
        return self.blob_density * jnp.exp(-d / (self.blob_radius**2))

    def common(self, x):
        h = self.encoder(x, bound=self.bound)
        h = self.sigma_net(h.astype(self.dtype)).astype(jnp.float32)
        sigma = trunc_exp(h[..., 0] + self.gaussian(x))
        albedo = jax.nn.sigmoid(h[..., 1:])
        return sigma, albedo

    def density(self, x):
        sigma, albedo = self.common(x)
        return {"sigma": sigma, "albedo": albedo}

    # NOTE: the vanilla backbone's analytic normal (-grad sigma, reference
    # network.py:186-191) needs jax.vjp over the *applied* module, which
    # cannot run inside a linen method; see sigma_albedo_normal() below.

    def __call__(self, x, d, light_d=None, ratio=1.0,
                 shading_mode=SHADING_ALBEDO):
        """Init/tracing entry (touches every param). Rendering goes
        through apply_field -> sigma_albedo_normal, which adds the
        analytic vjp normal this in-module path cannot compute."""
        sigma, albedo = self.common(x)
        return sigma, albedo, jnp.zeros_like(albedo)


class FourierField(nn.Module):
    """TPU flagship: frequency-encoded plain-ReLU MLP with a FUSED
    Pallas evaluation (forward + analytic normal + hand-derived double
    backward in three MXU-resident programs; ops/pallas/fused_mlp.py).

    Same math family as VanillaField / the reference's vanilla backbone
    (nerf/network.py) but with the ResMLP's LayerNorm/SiLU swapped for a
    plain ReLU chain: relu'' == 0 a.e. makes the training backward
    through the analytic normal a pure mask-gated matmul chain the
    fused kernel can compute exactly (module docstring there derives
    it). Equivalent tier: tiny-cuda-nn's fully fused MLP
    (nerf/network_tcnn.py:54-65), which also pairs a plain-ReLU MLP
    with the hash encode — tcnn settles for finite-difference normals;
    this field keeps analytic ones.

    Params live as raw arrays (w0/b0/wh/bh/wo/bo) rather than nested
    Dense modules so the kernel consumes them directly. The input width
    is lane-padded to 128 (encoder emits 3 + 6*multires dims); padded
    rows of w0 are inert (their input lanes are always zero).
    """

    bound: float = 1.0
    blob_density: float = 5.0
    blob_radius: float = 0.1
    hidden_dim: int = 256
    num_layers: int = 6           # total dense layers (>= 3)
    multires: int = 10
    lambert_min: float = 0.0
    dtype: Any = jnp.bfloat16     # kernel matmul dtype

    IN_PAD = 128

    def setup(self):
        from ..ops.pallas.fused_mlp import OUT_PAD

        self.encoder = FreqEncoder(input_dim=3, multires=self.multires)
        enc_dim = self.encoder.output_dim
        assert enc_dim <= self.IN_PAD, (enc_dim, self.IN_PAD)
        H, NH = self.hidden_dim, self.num_layers - 2
        assert NH >= 1, self.num_layers
        lecun = nn.initializers.lecun_normal()

        def w0_init(key):
            w = jnp.zeros((self.IN_PAD, H), jnp.float32)
            return w.at[:enc_dim].set(lecun(key, (enc_dim, H)))

        def wh_init(key):
            ks = jax.random.split(key, NH)
            return jnp.stack([lecun(k, (H, H)) for k in ks])

        def wo_init(key):
            w = jnp.zeros((H, OUT_PAD), jnp.float32)
            return w.at[:, :4].set(lecun(key, (H, 4)))

        self.w0 = self.param("w0", w0_init)
        self.b0 = self.param("b0", nn.initializers.zeros, (H,))
        self.wh = self.param("wh", wh_init)
        self.bh = self.param("bh", nn.initializers.zeros, (NH, H))
        self.wo = self.param("wo", wo_init)
        self.bo = self.param("bo", nn.initializers.zeros, (OUT_PAD,))

    def gaussian(self, x):
        # vanilla-family blob (reference: network.py:116-122)
        d = jnp.sum(x**2, axis=-1)
        return self.blob_density * jnp.exp(-d / (self.blob_radius**2))

    def _encode_padded(self, x):
        e = self.encoder(x, bound=self.bound)
        pad = self.IN_PAD - e.shape[-1]
        return jnp.pad(e, ((0, 0), (0, pad)))

    def _mlp(self, e, with_grad: bool):
        """Dispatch: fused Pallas kernel on TPU, jnp twin elsewhere.
        Pads the sample axis to the kernel tile and slices back."""
        from ..ops.pallas.fused_mlp import (
            fused_relu_mlp, relu_mlp_reference,
        )

        args = (self.w0, self.b0, self.wh, self.bh, self.wo, self.bo)
        M = e.shape[0]
        # the fused kernel wants MXU-aligned widths; tiny test/dryrun
        # configs (hidden 32) take the jnp twin on every backend
        if jax.default_backend() != "tpu" or self.hidden_dim % 128:
            return relu_mlp_reference(*args, e, with_grad=with_grad,
                                      compute_dtype=self.dtype)
        tile = 512
        pad = (-M) % tile  # pad rows are zero; their cotangents are too
        ep = jnp.pad(e, ((0, pad), (0, 0)))
        outs = fused_relu_mlp(*args, ep, with_grad=with_grad,
                              tile=tile, compute_dtype=self.dtype)
        return tuple(o[:M] for o in outs)

    def common(self, x):
        (out,) = self._mlp(self._encode_padded(x), with_grad=False)
        sigma = trunc_exp(out[:, 0] + self.gaussian(x))
        albedo = jax.nn.sigmoid(out[:, 1:4])
        return sigma, albedo

    def density(self, x):
        sigma, albedo = self.common(x)
        return {"sigma": sigma, "albedo": albedo}

    def sigma_albedo_normal(self, x):
        """Analytic normal from the kernel's in-program gradient chain.

        sigma = trunc_exp(out0 + blob);  d sigma/dx = trunc_exp'(v) *
        (g_e . dE/dx + d blob/dx), with g_e computed INSIDE the fused
        forward and the (sparse, elementwise) encoder Jacobian
        contraction done here.
        """
        e = self._encode_padded(x)
        out, ge = self._mlp(e, with_grad=True)
        v = out[:, 0] + self.gaussian(x)
        sigma = trunc_exp(v)
        albedo = jax.nn.sigmoid(out[:, 1:4])

        # encoder Jacobian contraction: e = [x, sin(f_k x_j), cos(...)]
        F = self.encoder.n_freqs
        fb = jnp.asarray(self.encoder.freq_bands)        # [F]
        xb = x[:, None, :] * fb[:, None]                 # [M, F, 3]
        sin, cos = jnp.sin(xb), jnp.cos(xb)
        ge_x = ge[:, :3]
        ge_sin = ge[:, 3:3 + 3 * F].reshape(-1, F, 3)
        ge_cos = ge[:, 3 + 3 * F:3 + 6 * F].reshape(-1, F, 3)
        g3 = ge_x + jnp.sum(
            fb[None, :, None] * (ge_sin * cos - ge_cos * sin), axis=1)

        dgauss = self.gaussian(x)[:, None] * (-2.0 * x
                                              / (self.blob_radius**2))
        dtrunc = jnp.exp(jnp.minimum(v, 15.0))           # trunc_exp'
        dsigma_dx = dtrunc[:, None] * (g3 + dgauss)
        normal = safe_normalize(-dsigma_dx)
        return sigma, albedo, jnp.nan_to_num(normal)

    def __call__(self, x, d, light_d=None, ratio=1.0,
                 shading_mode=SHADING_ALBEDO):
        """Init/tracing entry (touches every param)."""
        sigma, albedo, normal = self.sigma_albedo_normal(x)
        return sigma, albedo, normal


def sigma_albedo_normal(field: nn.Module, variables, x):
    """(sigma, albedo, normal) for any backbone, as a pure function.

    Hash backbone: batched finite differences inside the module.
    Fourier backbone: fused-kernel analytic normal (gradient chain runs
    inside the forward program). Vanilla backbone: analytic normal via
    one jax.vjp over the applied module (differentiable, so normals
    backprop into the field like the reference's create_graph=True
    autograd normal, network.py:186-191).
    """
    if isinstance(field, (HashGridField, FourierField)):
        return field.apply(variables, x, method="sigma_albedo_normal")

    def common(xx):
        return field.apply(variables, xx, method="common")

    (sigma, albedo), vjp_fn = jax.vjp(common, x)
    (grad,) = vjp_fn((jnp.ones_like(sigma), jnp.zeros_like(albedo)))
    normal = safe_normalize(-grad)
    return sigma, albedo, normal


def apply_field(
    field: nn.Module,
    variables,
    x,
    d=None,
    light_d=None,
    ratio=1.0,
    shading_mode=SHADING_ALBEDO,
    shaded: bool = True,
):
    """(sigma, color, normal) with shading — the renderer's entry point.

    reference: NeRFNetwork.forward (network_tcnn.py:140-170).

    `shaded` is a STATIC flag: False compiles the albedo-only program the
    reference runs for `shading == 'albedo'` (network_tcnn.py:141-144 —
    no normal computation at all), skipping the 6 finite-difference
    probes (7x fewer field evals). Normals come back as zeros; callers
    must not consume them (the renderer drops orient/smooth losses in
    this mode, matching the reference's `if normals is not None` gates,
    renderer.py:513-524).
    """
    if not shaded:
        sigma, albedo = field.apply(variables, x, method="common")
        return sigma, albedo, jnp.zeros((x.shape[0], 3), albedo.dtype)
    sigma, albedo, normal = sigma_albedo_normal(field, variables, x)
    if light_d is None:
        light_d = jnp.asarray([0.0, 0.0, 1.0])
    color = _shade(
        albedo, normal, light_d, ratio, shading_mode, field.lambert_min
    )
    return sigma, color, normal


def field_density(field: nn.Module, variables, x):
    return field.apply(variables, x, method="density")


def _chunked_field_vjp(field: nn.Module, n_chunks: int, chunk: int,
                       shaded: bool = True):
    """Build a custom-VJP chunked field evaluator.

    Why custom VJP instead of jax.checkpoint + autodiff: on the v5e the
    XLA-generated backward of (in-program sample positions -> remat'ed
    chunked field with finite-difference probes) reliably compiled to a
    kernel that crashed the TPU worker at runtime (data-dependent Mosaic
    fault; ~15 independent compiles reproduced it, while every variant
    whose backward consumed *materialized* positions ran clean). The
    custom VJP forces exactly that shape: positions are saved as
    residuals, and the backward replays each chunk from the residual
    buffer via jax.vjp, accumulating param cotangents across chunks in a
    scan carry. Memory matches jax.checkpoint (one chunk's activations
    live at a time); numerics match autodiff exactly (verified in
    tests/test_ops.py).
    """

    def eval_fn(variables, xp, dp, light_d, ratio, shading_mode):
        def body(c):
            return apply_field(field, variables, c[0], c[1], light_d,
                               ratio, shading_mode, shaded=shaded)

        return jax.lax.map(
            body, (xp.reshape(n_chunks, chunk, 3),
                   dp.reshape(n_chunks, chunk, 3))
        )

    @jax.custom_vjp
    def f(variables, xp, dp, light_d, ratio, shading_mode):
        return eval_fn(variables, xp, dp, light_d, ratio, shading_mode)

    def fwd(variables, xp, dp, light_d, ratio, shading_mode):
        out = eval_fn(variables, xp, dp, light_d, ratio, shading_mode)
        return out, (variables, xp, dp, light_d, ratio, shading_mode)

    def bwd(res, cts):
        variables, xp, dp, light_d, ratio, shading_mode = res
        ct_sigma, ct_color, ct_normal = cts

        def chunk_grad(carry, inp):
            xx, dd, cs, cc, cn = inp

            def one(v):
                return apply_field(field, v, xx, dd, light_d, ratio,
                                   shading_mode, shaded=shaded)

            _, vjp_fn = jax.vjp(one, variables)
            (dv,) = vjp_fn((cs, cc, cn))
            return jax.tree.map(jnp.add, carry, dv), None

        zero = jax.tree.map(jnp.zeros_like, variables)
        dvars, _ = jax.lax.scan(
            chunk_grad, zero,
            (xp.reshape(n_chunks, chunk, 3), dp.reshape(n_chunks, chunk, 3),
             ct_sigma, ct_color, ct_normal),
        )
        return (dvars, jnp.zeros_like(xp), jnp.zeros_like(dp),
                jnp.zeros_like(light_d), jnp.zeros_like(ratio), None)

    f.defvjp(fwd, bwd)
    return f


def apply_field_chunked(
    field: nn.Module,
    variables,
    x,
    d,
    light_d=None,
    ratio=1.0,
    shading_mode=SHADING_ALBEDO,
    chunk: int = 1 << 17,
    shaded: bool = True,
):
    """apply_field over [M] samples in memory-bounded chunks.

    A full-image training render is ~1.6M samples x 7 normal probes;
    evaluating that in one shot keeps multi-GB activations live (OOMs a
    16G v5e). Chunks run under lax.map with a custom VJP that replays
    each chunk from materialized position residuals — the TPU analogue
    of the reference's chunked queries (nerf/renderer.py:596-598,
    249-254); see _chunked_field_vjp for why not jax.checkpoint.
    """
    M = x.shape[0]
    if M <= chunk:
        return apply_field(field, variables, x, d, light_d, ratio,
                           shading_mode, shaded=shaded)
    if light_d is None:
        light_d = jnp.asarray([0.0, 0.0, 1.0])
    ratio = jnp.asarray(ratio, jnp.float32)
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    dp = jnp.pad(d, ((0, pad), (0, 0)))
    f = _chunked_field_vjp(field, n_chunks, chunk, shaded=shaded)
    sigma, color, normal = f(variables, xp, dp, light_d, ratio, shading_mode)
    return (
        sigma.reshape(-1)[:M],
        color.reshape(-1, color.shape[-1])[:M],
        normal.reshape(-1, 3)[:M],
    )


def sigma_albedo_normal_chunked(field, variables, x, chunk: int = 1 << 17):
    """Chunked sigma_albedo_normal with the same custom-VJP structure as
    apply_field_chunked (see _chunked_field_vjp for the rationale)."""
    M = x.shape[0]
    if M <= chunk:
        return sigma_albedo_normal(field, variables, x)
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    def eval_fn(variables, xp):
        return jax.lax.map(
            lambda xx: sigma_albedo_normal(field, variables, xx),
            xp.reshape(n_chunks, chunk, 3),
        )

    @jax.custom_vjp
    def f(variables, xp):
        return eval_fn(variables, xp)

    def fwd(variables, xp):
        return eval_fn(variables, xp), (variables, xp)

    def bwd(res, cts):
        variables, xp = res
        ct_sigma, ct_albedo, ct_normal = cts

        def chunk_grad(carry, inp):
            xx, cs, ca, cn = inp
            _, vjp_fn = jax.vjp(
                lambda v: sigma_albedo_normal(field, v, xx), variables
            )
            (dv,) = vjp_fn((cs, ca, cn))
            return jax.tree.map(jnp.add, carry, dv), None

        zero = jax.tree.map(jnp.zeros_like, variables)
        dvars, _ = jax.lax.scan(
            chunk_grad, zero,
            (xp.reshape(n_chunks, chunk, 3), ct_sigma, ct_albedo, ct_normal),
        )
        return dvars, jnp.zeros_like(xp)

    f.defvjp(fwd, bwd)
    sigma, albedo, normal = f(variables, xp)
    return (
        sigma.reshape(-1)[:M],
        albedo.reshape(-1, albedo.shape[-1])[:M],
        normal.reshape(-1, 3)[:M],
    )


def _chunked_cff_vjp(field: nn.Module, n_chunks: int, chunk: int, F: int):
    """Chunked common_from_feats with a froztab-shaped custom VJP.

    Differentiable in (variables, feats): the forward lax.maps MLP-head
    chunks; the backward replays each chunk's jax.vjp from (feats,
    positions) residuals, accumulating param cotangents in a scan carry
    and emitting per-chunk feature cotangents as stacked scan outputs.
    No hash-table access anywhere in this graph — the encode-split
    pipeline's stage 3 (training/split_step.py), which is exactly the
    program shape that survived the axon-v5e fault ablations
    (scripts/ablate128.py: froztab)."""

    def eval_fn(variables, fp, xp):
        def body(c):
            return field.apply(variables, c[0], c[1],
                               method="common_from_feats")

        return jax.lax.map(
            body, (fp.reshape(n_chunks, chunk, F),
                   xp.reshape(n_chunks, chunk, 3))
        )

    @jax.custom_vjp
    def f(variables, fp, xp):
        return eval_fn(variables, fp, xp)

    def fwd(variables, fp, xp):
        return eval_fn(variables, fp, xp), (variables, fp, xp)

    def bwd(res, cts):
        variables, fp, xp = res
        ct_sigma, ct_albedo = cts

        def chunk_grad(carry, inp):
            ff, xx, cs, ca = inp

            def one(v, f_):
                return field.apply(v, f_, xx, method="common_from_feats")

            _, vjp_fn = jax.vjp(one, variables, ff)
            dv, df = vjp_fn((cs, ca))
            return jax.tree.map(jnp.add, carry, dv), df

        zero = jax.tree.map(jnp.zeros_like, variables)
        dvars, dfeats = jax.lax.scan(
            chunk_grad, zero,
            (fp.reshape(n_chunks, chunk, F), xp.reshape(n_chunks, chunk, 3),
             ct_sigma, ct_albedo),
        )
        return dvars, dfeats.reshape(fp.shape), jnp.zeros_like(xp)

    f.defvjp(fwd, bwd)
    return f


def common_from_feats_chunked(field, variables, feats, pos,
                              chunk: int = 1 << 17):
    """(sigma [P], albedo [P, 3]) over pre-encoded features, chunked."""
    P, F = feats.shape
    if P <= chunk:
        return field.apply(variables, feats, pos, method="common_from_feats")
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    fp = jnp.pad(feats, ((0, pad), (0, 0)))
    xp = jnp.pad(pos, ((0, pad), (0, 0)))
    f = _chunked_cff_vjp(field, n_chunks, chunk, F)
    sigma, albedo = f(variables, fp, xp)
    return sigma.reshape(-1)[:P], albedo.reshape(-1, 3)[:P]


def make_split_evals(field, variables, feats, positions, M: int,
                     light_d_ratio_shading, chunk: int = 1 << 17,
                     compute_smooth: bool = True):
    """(field_eval, smooth_eval) closures for render_occupancy, consuming
    pre-encoded features (training/split_step.py stage 3).

    positions/feats rows are ordered [7M main probes | 7M smooth probes]
    (probe_positions order within each block). light_d_ratio_shading =
    (ratio, shading_mode); light_d arrives from render_occupancy."""
    ratio, shading_mode = light_d_ratio_shading
    eps = field.fd_epsilon

    def field_eval(flat_x, flat_d, light_d):
        sig_all, alb_all = common_from_feats_chunked(
            field, variables, feats[: 7 * M], positions[: 7 * M],
            chunk=chunk)
        sigma, normal = fd_combine(sig_all, M, eps)
        albedo = alb_all[:M]
        color = _shade(albedo, normal, light_d, ratio, shading_mode,
                       field.lambert_min)
        return sigma, color, normal

    def smooth_eval(flat_x):
        sig_all, _ = common_from_feats_chunked(
            field, variables, feats[7 * M:], positions[7 * M:],
            chunk=chunk)
        _, normal = fd_combine(sig_all, M, eps)
        return normal

    return field_eval, (smooth_eval if compute_smooth else None)


def make_split_albedo_eval(field, variables, feats, positions, M: int,
                           chunk: int = 1 << 17):
    """field_eval closure for the ALBEDO-mode encode split: positions
    and feats hold only the M center rows (build_probe_layout with
    shaded=False). color = albedo directly; normals are zeros (the
    albedo program computes no orient/smooth losses — reference gates
    them on `normals is not None`, renderer.py:513-524)."""

    def field_eval(flat_x, flat_d, light_d):
        sigma, albedo = common_from_feats_chunked(
            field, variables, feats[:M], positions[:M], chunk=chunk)
        return sigma, albedo, jnp.zeros_like(albedo)

    return field_eval


def make_field(cfg) -> nn.Module:
    """Backbone factory (reference: main.py:101-106).

    --fp16 / compute_dtype=bfloat16 selects bf16 MLP compute (params and
    all nonlinear math stay f32) — the reference's AMP autocast analogue
    (utils.py:309) mapped to the MXU fast path.
    """
    dtype = jnp.float32
    if cfg.fp16 or cfg.compute_dtype == "bfloat16":
        dtype = jnp.bfloat16
    if cfg.backbone in ("hashgrid", "tcnn", "grid"):
        return HashGridField(
            bound=cfg.bound,
            blob_density=cfg.blob_density,
            blob_radius=cfg.blob_radius,
            hash_levels=cfg.hash_levels,
            hash_features=cfg.hash_features,
            log2_hashmap_size=cfg.log2_hashmap_size,
            base_resolution=cfg.base_resolution,
            desired_resolution=cfg.desired_resolution,
            split_probes=cfg.split_probes,
            dtype=dtype,
        )
    if cfg.backbone == "vanilla":
        return VanillaField(
            bound=cfg.bound,
            blob_density=cfg.blob_density,
            blob_radius=cfg.blob_radius,
            dtype=dtype,
        )
    if cfg.backbone == "fourier":
        # TPU flagship: matmul-only field. Same math family as vanilla
        # (reference: nerf/network.py), scaled to MXU-aligned width and
        # run in bf16 — the backward is pure matmul, dodging both the
        # XLA:TPU scatter-throughput ceiling (~20M rows/s) and the
        # probes+scatter fused-backward fault that gates the hash
        # backbone (docs/TPU_NOTES.md).
        if getattr(cfg, "mlp_arch", "relu") == "resmlp":
            # LayerNorm/SiLU ResMLP under XLA autodiff (the pre-fused
            # round-2 flagship, kept for comparison / checkpoints)
            return VanillaField(
                bound=cfg.bound,
                blob_density=cfg.blob_density,
                blob_radius=cfg.blob_radius,
                hidden_dim=cfg.mlp_hidden,
                num_layers=cfg.mlp_layers,
                multires=cfg.mlp_multires,
                dtype=jnp.bfloat16,
            )
        # default: plain-ReLU chain through the fused Pallas kernel
        # (forward + analytic normal + hand-derived double backward in
        # three MXU-resident programs, ops/pallas/fused_mlp.py)
        return FourierField(
            bound=cfg.bound,
            blob_density=cfg.blob_density,
            blob_radius=cfg.blob_radius,
            hidden_dim=cfg.mlp_hidden,
            num_layers=cfg.mlp_layers,
            multires=cfg.mlp_multires,
            dtype=jnp.bfloat16,
        )
    raise NotImplementedError(f"backbone {cfg.backbone}")
