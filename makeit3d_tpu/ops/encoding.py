"""Positional encodings.

- FreqEncoder: sin/cos frequency encoding (reference: encoding.py:5-42).
- HashGridEncoder: multiresolution hash-grid encoding equivalent to
  tiny-cuda-nn's HashGrid (reference: nerf/network_tcnn.py:54-65). The CUDA
  original gathers per-thread; here each (point, level) does an 8-corner
  gather from a [L, T, F] table and trilinearly interpolates — XLA lowers
  the gathers to efficient TPU dynamic-slices, and the backward scatter-add
  is a segment-sum, race-free by construction.

All functions are shape-static and jit/vmap/grad friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Spatial hash primes used by Instant-NGP / tiny-cuda-nn.
_PRIMES = (1, 2654435761, 805459861)


class FreqEncoder:
    """out = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^k x), cos(2^k x)]."""

    def __init__(self, input_dim: int = 3, multires: int = 6):
        self.input_dim = input_dim
        self.n_freqs = multires
        self.freq_bands = np.asarray(
            2.0 ** np.linspace(0.0, multires - 1, multires), dtype=np.float32
        )
        self.output_dim = input_dim + input_dim * multires * 2

    def __call__(self, x: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        # reference passes raw coords (encoding.py:29-42); bound unused
        xb = x[..., None, :] * self.freq_bands[:, None]  # [..., F, D]
        sin = jnp.sin(xb)
        cos = jnp.cos(xb)
        enc = jnp.concatenate(
            [x, sin.reshape(*x.shape[:-1], -1), cos.reshape(*x.shape[:-1], -1)],
            axis=-1,
        )
        return enc


def _level_resolutions(n_levels: int, base_resolution: int, per_level_scale: float):
    return [
        int(math.floor(base_resolution * per_level_scale**lvl))
        for lvl in range(n_levels)
    ]


class HashGridEncoder:
    """Multiresolution hash grid: 16 levels x 2 features, 2^19 table.

    Parameters live in a single [L, T, F] array (a pytree leaf), so the
    encoder itself is stateless and composable with jax transforms.
    """

    def __init__(
        self,
        n_levels: int = 16,
        n_features: int = 2,
        log2_hashmap_size: int = 19,
        base_resolution: int = 16,
        per_level_scale: float | None = None,
        desired_resolution: int = 2048,
        bound: float = 1.0,
    ):
        if per_level_scale is None:
            per_level_scale = 2.0 ** (
                math.log2(desired_resolution * bound / base_resolution)
                / (n_levels - 1)
            )
        self.n_levels = n_levels
        self.n_features = n_features
        self.table_size = 1 << log2_hashmap_size
        self.resolutions = np.asarray(
            _level_resolutions(n_levels, base_resolution, per_level_scale),
            dtype=np.int32,
        )
        self.output_dim = n_levels * n_features

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
        # tcnn initializes U(-1e-4, 1e-4)
        return jax.random.uniform(
            key,
            (self.n_levels, self.table_size, self.n_features),
            dtype=dtype,
            minval=-1e-4,
            maxval=1e-4,
        )

    def __call__(self, params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, 3] in [0, 1] -> [N, L*F] features.

        Levels run under lax.scan so XLA reuses one level's worth of
        temporaries instead of keeping 16 levels live at once (an
        unrolled loop OOMed a full-image render on a 16G v5e). Within a
        level the 8 corners accumulate one at a time with [N]-sized
        weight temporaries — never a materialized [N, 8, 3] buffer.

        All levels use the spatial hash (the dense-indexing fast path of
        tiny-cuda-nn's low levels is dropped: at 2^19 slots, sub-res-80
        levels collide with negligible probability, and one uniform code
        path scans cleanly).
        """
        resolutions = jnp.asarray(self.resolutions, jnp.float32)  # [L]
        tsize = jnp.uint32(self.table_size)

        def level_fn(carry, level_in):
            table, res = level_in  # [T, F], scalar
            xs = x * res  # cells span [0, res]
            x0f = jnp.floor(xs)
            w = xs - x0f  # [N, 3]
            x0 = jnp.asarray(x0f, jnp.uint32)
            acc = jnp.zeros((x.shape[0], self.n_features), table.dtype)
            for c in range(8):
                ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                h = (x0[:, 0] + jnp.uint32(ox)) * jnp.uint32(_PRIMES[0])
                h = h ^ ((x0[:, 1] + jnp.uint32(oy)) * jnp.uint32(_PRIMES[1]))
                h = h ^ ((x0[:, 2] + jnp.uint32(oz)) * jnp.uint32(_PRIMES[2]))
                idx = h % tsize
                wc = (
                    (w[:, 0] if ox else 1.0 - w[:, 0])
                    * (w[:, 1] if oy else 1.0 - w[:, 1])
                    * (w[:, 2] if oz else 1.0 - w[:, 2])
                )
                acc = acc + table[idx] * wc[:, None]
            return carry, acc

        _, feats = jax.lax.scan(level_fn, None, (params, resolutions))
        # feats: [L, N, F] -> [N, L*F]
        return jnp.moveaxis(feats, 0, 1).reshape(x.shape[0], -1)

    def grad_table_flat(self, x: jnp.ndarray, dfeat: jnp.ndarray,
                        chunk: int = 1 << 16) -> jnp.ndarray:
        """Same table cotangent as grad_table, ONE scatter-add per chunk.

        The scan-of-scans formulation issues 8 corners x L levels = 128
        small sequential scatters per chunk; XLA:TPU pays per-scatter
        sort/setup every time, which made the encode-split apply phase
        dispatch-bound (~seconds per 128x128 step). Here the level is
        folded into a flattened [L*T, F] table index (idx + level*T) and
        the 8 corner contributions are stacked, so each chunk is a
        single [8*L*chunk]-row scatter-add. Identical math — the scatter
        combiner is associative addition.
        """
        N = x.shape[0]
        L, F, T = self.n_levels, self.n_features, self.table_size
        resolutions = jnp.asarray(self.resolutions, jnp.float32)  # [L]
        tsize = jnp.uint32(T)
        dtype = dfeat.dtype
        n_chunks = max(-(-N // chunk), 1)
        pad = n_chunks * chunk - N
        xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
        dp = jnp.pad(dfeat, ((0, pad), (0, 0))).reshape(
            n_chunks, chunk, L, F)
        lvl_off = (jnp.arange(L, dtype=jnp.uint32) * tsize)[None, :]  # [1,L]

        def chunk_body(gtab, inp):
            xx, dd = inp  # [chunk, 3], [chunk, L, F]
            xs = xx[:, None, :] * resolutions[None, :, None]  # [chunk, L, 3]
            x0f = jnp.floor(xs)
            w = xs - x0f
            x0 = jnp.asarray(x0f, jnp.uint32)
            idxs = []
            vals = []
            for c in range(8):
                ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                h = (x0[..., 0] + jnp.uint32(ox)) * jnp.uint32(_PRIMES[0])
                h = h ^ ((x0[..., 1] + jnp.uint32(oy))
                         * jnp.uint32(_PRIMES[1]))
                h = h ^ ((x0[..., 2] + jnp.uint32(oz))
                         * jnp.uint32(_PRIMES[2]))
                idxs.append(h % tsize + lvl_off)  # [chunk, L]
                wc = (
                    (w[..., 0] if ox else 1.0 - w[..., 0])
                    * (w[..., 1] if oy else 1.0 - w[..., 1])
                    * (w[..., 2] if oz else 1.0 - w[..., 2])
                )
                vals.append(dd * wc[..., None].astype(dtype))  # [chunk,L,F]
            idx = jnp.stack(idxs).reshape(-1)         # [8*chunk*L]
            val = jnp.stack(vals).reshape(-1, F)      # [8*chunk*L, F]
            return gtab.at[idx].add(val), None

        gtab0 = jnp.zeros((L * T, F), dtype)
        gtab, _ = jax.lax.scan(chunk_body, gtab0, (xp, dp))
        return gtab.reshape(L, T, F)

    def grad_table_sorted(self, x: jnp.ndarray, dfeat: jnp.ndarray,
                          chunk: int = 1 << 16) -> jnp.ndarray:
        """Same table cotangent as grad_table_flat, but the per-chunk
        scatter-add goes through the Pallas sorted-segment-sum pipeline
        (ops/pallas/segsum.py): XLA sort by flattened [L*T] slot, then a
        block one-hot MXU matmul reduces each 1024-row run into aligned
        window partials, combined with ONE fat-slab scatter. Beats the
        ~20M rows/s XLA scatter-add ceiling by ~2x on the albedo
        workload (the remaining wall is the sort itself at ~50M rows/s —
        scripts/probe_sorted_scatter.py, docs/TPU_NOTES.md). Equivalent
        tier in the reference: tiny-cuda-nn's fused hash backward
        (global atomics at memory speed, nerf/network_tcnn.py:54-65)."""
        from .pallas.segsum import sorted_segment_sum

        N = x.shape[0]
        L, F, T = self.n_levels, self.n_features, self.table_size
        resolutions = jnp.asarray(self.resolutions, jnp.float32)
        tsize = jnp.uint32(T)
        n_chunks = max(-(-N // chunk), 1)
        pad = n_chunks * chunk - N
        xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
        dp = jnp.pad(dfeat.astype(jnp.float32),
                     ((0, pad), (0, 0))).reshape(n_chunks, chunk, L, F)
        lvl_off = (jnp.arange(L, dtype=jnp.uint32) * tsize)[None, :]

        def chunk_body(gtab, inp):
            xx, dd = inp  # [chunk, 3], [chunk, L, F]
            xs = xx[:, None, :] * resolutions[None, :, None]
            x0f = jnp.floor(xs)
            w = xs - x0f
            x0 = jnp.asarray(x0f, jnp.uint32)
            idxs, vals = [], []
            for c in range(8):
                ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                h = (x0[..., 0] + jnp.uint32(ox)) * jnp.uint32(_PRIMES[0])
                h = h ^ ((x0[..., 1] + jnp.uint32(oy))
                         * jnp.uint32(_PRIMES[1]))
                h = h ^ ((x0[..., 2] + jnp.uint32(oz))
                         * jnp.uint32(_PRIMES[2]))
                idxs.append(h % tsize + lvl_off)  # [chunk, L]
                wc = (
                    (w[..., 0] if ox else 1.0 - w[..., 0])
                    * (w[..., 1] if oy else 1.0 - w[..., 1])
                    * (w[..., 2] if oz else 1.0 - w[..., 2])
                )
                vals.append(dd * wc[..., None].astype(jnp.float32))
            idx = jnp.stack(idxs).reshape(-1).astype(jnp.int32)
            val = jnp.stack(vals).reshape(-1, F)
            order = jnp.argsort(idx)
            gtab = sorted_segment_sum(idx[order], val[order], gtab)
            return gtab, None

        gtab0 = jnp.zeros((L * T, F), jnp.float32)
        gtab, _ = jax.lax.scan(chunk_body, gtab0, (xp, dp))
        return gtab.reshape(L, T, F).astype(dfeat.dtype)

    def grad_table(self, x: jnp.ndarray, dfeat: jnp.ndarray,
                   chunk: int = 1 << 17,
                   index_dtype=None) -> jnp.ndarray:
        """Explicit d(features)/d(table)^T @ dfeat — the hash-table
        cotangent as its own computation.

        x: [N, 3] in [0, 1]; dfeat: [N, L*F] feature cotangents ->
        [L, T, F] table gradient. The math is exactly what autodiff of
        __call__ produces (trilinear-weighted scatter-add per corner per
        level); having it as a standalone function lets the encode-split
        training pipeline (training/split_step.py) run the scatter in its
        own XLA program, away from the probe-backward fusion that faults
        the axon v5e (docs/TPU_NOTES.md). Chunked over N with the table
        gradient as the scan carry."""
        N = x.shape[0]
        resolutions = jnp.asarray(self.resolutions, jnp.float32)  # [L]
        tsize = jnp.uint32(self.table_size)
        dtype = dfeat.dtype
        n_chunks = max(-(-N // chunk), 1)
        pad = n_chunks * chunk - N
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        # padded rows carry zero cotangent -> no spurious contributions
        dp = jnp.pad(dfeat, ((0, pad), (0, 0)))
        # [Np, L*F] -> [n_chunks, L, chunk, F]
        dp = jnp.moveaxis(
            dp.reshape(n_chunks, chunk, self.n_levels, self.n_features),
            2, 1,
        )
        xp = xp.reshape(n_chunks, chunk, 3)

        def chunk_body(gtab, inp):
            xx, dd = inp  # [chunk, 3], [L, chunk, F]

            def level_fn(carry, level_in):
                res, dlev, gl = level_in  # scalar, [chunk, F], [T, F]
                xs = xx * res
                x0f = jnp.floor(xs)
                w = xs - x0f
                x0 = jnp.asarray(x0f, jnp.uint32)
                for c in range(8):
                    ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                    h = (x0[:, 0] + jnp.uint32(ox)) * jnp.uint32(_PRIMES[0])
                    h = h ^ ((x0[:, 1] + jnp.uint32(oy))
                             * jnp.uint32(_PRIMES[1]))
                    h = h ^ ((x0[:, 2] + jnp.uint32(oz))
                             * jnp.uint32(_PRIMES[2]))
                    idx = h % tsize
                    if index_dtype is not None:
                        idx = idx.astype(index_dtype)
                    wc = (
                        (w[:, 0] if ox else 1.0 - w[:, 0])
                        * (w[:, 1] if oy else 1.0 - w[:, 1])
                        * (w[:, 2] if oz else 1.0 - w[:, 2])
                    )
                    gl = gl.at[idx].add(dlev * wc[:, None].astype(dtype))
                return carry, gl

            _, gtab = jax.lax.scan(
                level_fn, None, (resolutions, dd, gtab))
            return gtab, None

        gtab0 = jnp.zeros(
            (self.n_levels, self.table_size, self.n_features), dtype)
        gtab, _ = jax.lax.scan(chunk_body, gtab0, (xp, dp))
        return gtab


class SHEncoder:
    """Real spherical-harmonics direction encoding up to degree 4.

    Equivalent of the stable-dreamfusion `shencoder` CUDA package the
    reference imports lazily for non-default direction encodings
    (reference: encoding.py:56-70). Hardcoded real-SH polynomials match
    the CUDA kernel's constants. Input: unit directions [..., 3].
    """

    def __init__(self, input_dim: int = 3, degree: int = 4):
        assert input_dim == 3 and 1 <= degree <= 4
        self.degree = degree
        self.output_dim = degree * degree

    def __call__(self, d: jnp.ndarray, **_) -> jnp.ndarray:
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        out = [jnp.full(x.shape, 0.28209479177387814)]
        if self.degree > 1:
            out += [-0.48860251190291987 * y,
                    0.48860251190291987 * z,
                    -0.48860251190291987 * x]
        if self.degree > 2:
            xy, yz, xz = x * y, y * z, x * z
            x2, y2, z2 = x * x, y * y, z * z
            out += [1.0925484305920792 * xy,
                    -1.0925484305920792 * yz,
                    0.94617469575755997 * z2 - 0.31539156525251999,
                    -1.0925484305920792 * xz,
                    0.54627421529603959 * (x2 - y2)]
        if self.degree > 3:
            xy, yz, xz = x * y, y * z, x * z
            x2, y2, z2 = x * x, y * y, z * z
            out += [
                0.59004358992664352 * y * (-3.0 * x2 + y2),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * z2),
                0.3731763325901154 * z * (5.0 * z2 - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * z2),
                1.4453057213202769 * z * (x2 - y2),
                0.59004358992664352 * x * (-x2 + 3.0 * y2),
            ]
        return jnp.stack(out, axis=-1)


def get_encoder(encoding: str, input_dim: int = 3, multires: int = 6, **kw):
    """Encoder factory (reference: encoding.py:44-75)."""
    if encoding == "None":
        enc = lambda x, **k: x
        enc.output_dim = input_dim
        return enc, input_dim
    if encoding in ("frequency", "frequency_torch"):
        enc = FreqEncoder(input_dim=input_dim, multires=multires)
        return enc, enc.output_dim
    if encoding in ("sphere_harmonics", "sh"):
        enc = SHEncoder(input_dim=input_dim, degree=kw.get("degree", 4))
        return enc, enc.output_dim
    if encoding in ("hashgrid", "tiledgrid"):
        enc = HashGridEncoder(
            n_levels=kw.get("num_levels", 16),
            n_features=kw.get("level_dim", 2),
            log2_hashmap_size=kw.get("log2_hashmap_size", 19),
            base_resolution=kw.get("base_resolution", 16),
            desired_resolution=kw.get("desired_resolution", 2048),
            bound=kw.get("bound", 1.0),
        )
        return enc, enc.output_dim
    raise NotImplementedError(f"unknown encoding {encoding}")
