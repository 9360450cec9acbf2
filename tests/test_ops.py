"""Unit tests for the kernel tier: activation, morton, packbits, encoders,
marching, compositing. The composite gradient is checked against the
closed-form CUDA backward (reference: raymarching.cu:655-667)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from makeit3d_tpu.ops import (
    composite_rays,
    march_rays,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    packbits,
    sample_pdf,
    trunc_exp,
)
from makeit3d_tpu.ops.encoding import FreqEncoder, HashGridEncoder
from makeit3d_tpu.ops.grid import init_density_grid, occupancy_lookup


def test_trunc_exp_forward_and_clamped_grad():
    # forward AND backward clamp at 15 (forward clamp is the documented
    # inf-guard deviation from the reference; see ops/activation.py)
    x = jnp.asarray([0.0, 1.0, 20.0, 100.0])
    assert np.allclose(trunc_exp(x), np.exp([0.0, 1.0, 15.0, 15.0]))
    assert np.all(np.isfinite(np.asarray(trunc_exp(x))))
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    # gradient is exp(min(x, 15)) — identical to the reference's backward
    assert np.allclose(g, np.exp([0.0, 1.0, 15.0, 15.0]), rtol=1e-5)


def test_morton_roundtrip(rng):
    coords = jnp.asarray(rng.integers(0, 128, size=(1000, 3)), jnp.int32)
    codes = morton3d(coords)
    back = morton3d_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))
    # morton codes are unique within the grid
    assert len(np.unique(np.asarray(codes))) == len(
        np.unique(np.asarray(coords) @ np.array([1, 128, 128 * 128]))
    )


def test_packbits_bit_order(rng):
    grid = jnp.asarray(rng.random((1, 16)), jnp.float32)
    bits = packbits(grid, 0.5)
    occ = np.asarray(grid.reshape(-1) > 0.5)
    expect = np.zeros(2, np.uint8)
    for i, o in enumerate(occ):
        if o:
            expect[i // 8] |= 1 << (i % 8)
    np.testing.assert_array_equal(np.asarray(bits), expect)


def test_freq_encoder_matches_reference_layout():
    enc = FreqEncoder(input_dim=3, multires=4)
    x = jnp.asarray([[0.1, -0.2, 0.3]])
    out = np.asarray(enc(x))
    assert out.shape == (1, 3 + 3 * 4 * 2)
    np.testing.assert_allclose(out[0, :3], [0.1, -0.2, 0.3], rtol=1e-6)
    # first sin block is sin(x * 2^0)
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.1, -0.2, 0.3]), rtol=1e-5)


def test_hash_encoder_shapes_and_interpolation():
    enc = HashGridEncoder(n_levels=4, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)
    params = enc.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    out = enc(params, x)
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    # continuity: nearby points give nearby encodings
    x2 = x + 1e-5
    out2 = enc(params, x2)
    assert np.max(np.abs(np.asarray(out - out2))) < 1e-3


def test_hash_encoder_gradients_flow():
    enc = HashGridEncoder(n_levels=2, n_features=2, log2_hashmap_size=8,
                          base_resolution=4, per_level_scale=2.0)
    params = enc.init_params(jax.random.PRNGKey(0))

    def loss(p):
        return jnp.sum(enc(p, jnp.asarray([[0.3, 0.6, 0.9]])) ** 2)

    g = jax.grad(loss)(params)
    assert np.asarray(jnp.sum(jnp.abs(g))) > 0


def test_near_far_from_aabb():
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    rays_o = jnp.asarray([[0, 0, -3.0], [0, 0, -3.0]])
    rays_d = jnp.asarray([[0, 0, 1.0], [0, 1.0, 0.0]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.05)
    assert np.isclose(nears[0], 2.0) and np.isclose(fars[0], 4.0)
    assert nears[1] >= 1e8  # miss


def test_march_rays_hits_occupied_region():
    grid = init_density_grid(cascade=1, grid_size=32, occupied=True)
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(
        rays_o, rays_d, jnp.asarray([-1, -1, -1, 1, 1, 1.0]), 0.05
    )
    m = march_rays(rays_o, rays_d, grid.occ, 1.0, nears, fars,
                   max_steps=256, n_samples=64, perturb=False)
    v = np.asarray(m.valid[0])
    assert v.sum() == 64  # fully occupied: budget saturates
    ts = np.asarray(m.ts[0])[v]
    assert ts[0] >= 1.0 - 1e-3  # enters the cube at z=-1 (t=1)
    assert np.all(np.diff(ts) > 0)
    xyz = np.asarray(m.xyzs[0])[v]
    assert np.all(np.abs(xyz) <= 1.0 + 1e-6)


def test_march_rays_skips_empty_space():
    # occupancy only in one octant; rays elsewhere collect nothing
    grid = init_density_grid(cascade=1, grid_size=32, occupied=False)
    occ = np.zeros((1, 32, 32, 32), np.uint8)
    occ[0, 16:, 16:, 16:] = 1  # x,y,z in [0, 1]
    grid = grid._replace(occ=jnp.asarray(occ))
    rays_o = jnp.asarray([[0.5, 0.5, -2.0], [-0.5, -0.5, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    nears, fars = near_far_from_aabb(
        rays_o, rays_d, jnp.asarray([-1, -1, -1, 1, 1, 1.0]), 0.05
    )
    m = march_rays(rays_o, rays_d, grid.occ, 1.0, nears, fars,
                   max_steps=256, n_samples=64, perturb=False)
    v = np.asarray(m.valid)
    assert v[0].sum() > 0          # ray through occupied octant samples
    assert v[1].sum() == 0         # ray through empty region collects none
    ts = np.asarray(m.ts[0])[v[0]]
    xyz = np.asarray(m.xyzs[0])[v[0]]
    assert np.all(xyz[:, 2] >= -0.05)  # samples only in occupied half


def _composite_reference_grads(sigmas, rgbs, dts, g_image, g_ws):
    """Closed-form CUDA backward (raymarching.cu:643-667), numpy."""
    S = sigmas.shape[0]
    alphas = 1 - np.exp(-sigmas * dts)
    T = 1.0
    r = np.zeros(3)
    ws = 0.0
    # forward finals
    Tf = 1.0
    rf = np.zeros(3)
    wsf = 0.0
    for i in range(S):
        w = alphas[i] * Tf
        rf += w * rgbs[i]
        wsf += w
        Tf *= 1 - alphas[i]
    gs = np.zeros(S)
    gr = np.zeros((S, 3))
    for i in range(S):
        w = alphas[i] * T
        r += w * rgbs[i]
        ws += w
        T *= 1 - alphas[i]
        gr[i] = g_image * w
        gs[i] = dts[i] * (
            np.dot(g_image, T * rgbs[i] - (rf - r)) + g_ws * (1 - wsf)
        )
    return gs, gr


def test_composite_matches_cuda_closed_form(rng):
    S = 16
    sigmas = jnp.asarray(rng.random(S) * 20, jnp.float32)[None]
    rgbs = jnp.asarray(rng.random((S, 3)), jnp.float32)[None]
    dts = jnp.full((1, S), 0.01, jnp.float32)
    valid = jnp.ones((1, S), bool)
    g_image = np.array([0.3, -0.5, 1.0])
    g_ws = 0.7

    def loss(sig, rgb):
        out = composite_rays(sig, rgb, dts, dts, valid, T_thresh=0.0)
        return jnp.sum(out.image * jnp.asarray(g_image)) + g_ws * jnp.sum(
            out.weights_sum
        )

    gsig, grgb = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    gs_ref, gr_ref = _composite_reference_grads(
        np.asarray(sigmas[0]), np.asarray(rgbs[0]), np.asarray(dts[0]),
        g_image, g_ws,
    )
    np.testing.assert_allclose(np.asarray(gsig[0]), gs_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grgb[0]), gr_ref, rtol=1e-4, atol=1e-6)


def test_composite_early_termination():
    # an opaque first sample should stop later samples from contributing
    S = 8
    sigmas = jnp.concatenate(
        [jnp.full((1, 1), 1e6), jnp.full((1, S - 1), 10.0)], axis=-1
    )
    rgbs = jnp.ones((1, S, 3))
    dts = jnp.full((1, S), 0.1)
    valid = jnp.ones((1, S), bool)
    out = composite_rays(sigmas, rgbs, dts, dts, valid, T_thresh=1e-4)
    w = np.asarray(out.weights[0])
    assert w[0] > 0.999
    assert np.all(w[1:] == 0.0)


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.linspace(0.0, 1.0, 9)[None]  # [1, 9]
    weights = jnp.asarray([[0, 0, 0, 100.0, 100.0, 0, 0, 0]])
    samples = sample_pdf(bins, weights, 100, det=True)
    s = np.asarray(samples[0])
    assert (np.abs(s - 0.5) < 0.15).mean() > 0.9


def test_occupancy_lookup_levels():
    occ = np.zeros((1, 8, 8, 8), np.uint8)
    occ[0, 4, 4, 4] = 1  # cell covering ~[0, 0.25)^3
    hit = occupancy_lookup(jnp.asarray(occ), jnp.asarray([[0.05, 0.05, 0.05]]), 1.0)
    miss = occupancy_lookup(jnp.asarray(occ), jnp.asarray([[-0.9, 0.0, 0.0]]), 1.0)
    assert bool(hit[0]) and not bool(miss[0])


def test_two_level_march_matches_single_level():
    """With a compact object, the two-level march must produce exactly
    the samples the exhaustive single-level probe would (same lattice:
    t_start is an integer multiple of dt past near)."""
    import numpy as np

    from makeit3d_tpu.ops.marching import march_rays, near_far_from_aabb

    H = 64
    coords = (np.mgrid[0:H, 0:H, 0:H].astype(np.float32) + 0.5) / H * 2 - 1
    sphere = (np.sqrt((coords**2).sum(0)) < 0.4).astype(np.uint8)
    occ = jnp.asarray(sphere[None])

    n = 64
    theta = np.linspace(-0.5, 0.5, n).astype(np.float32)
    rays_o = jnp.asarray(np.stack(
        [np.zeros(n), np.zeros(n), -2.5 * np.ones(n)], -1).astype(np.float32))
    rays_d = jnp.asarray(np.stack(
        [np.sin(theta), np.zeros(n), np.cos(theta)], -1).astype(np.float32))
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.1)

    kw = dict(max_steps=512, n_samples=64, perturb=False)
    m1 = march_rays(rays_o, rays_d, occ, 1.0, nears, fars,
                    two_level=False, **kw)
    m2 = march_rays(rays_o, rays_d, occ, 1.0, nears, fars,
                    two_level=True, **kw)
    assert bool(jnp.any(m1.valid))
    np.testing.assert_array_equal(np.asarray(m1.valid), np.asarray(m2.valid))
    v = np.asarray(m1.valid)
    np.testing.assert_allclose(np.asarray(m1.ts)[v], np.asarray(m2.ts)[v],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.real_dts)[v],
                               np.asarray(m2.real_dts)[v], rtol=0, atol=1e-6)
