"""Occupied-AABB eval chunk skipping + square-tile eval chunking.

The 800^2 eval frame is march-bound on TPU (probe_eval_frame.py: the
march is 3.2 s of the 6 s frame); chunks whose rays all miss the
occupied-cell AABB composite to exactly bg and are lax.cond-skipped
(render_eval_chunk_skippable), and render_image chunks the frame into
square pixel tiles so the predicate fires on background columns too.
Semantics-preserving by construction — these tests pin the parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makeit3d_tpu.config import Config
from makeit3d_tpu.ops.grid import (
    DensityGrid, init_density_grid, occupied_aabb,
)


def brute_aabb(occ, bound, margin_cells=1):
    C, H = occ.shape[0], occ.shape[-1]
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for c in range(C):
        mb = min(2.0 ** c, bound)
        cell = 2.0 * mb / H
        idx = np.argwhere(np.asarray(occ[c]) > 0)
        if idx.size == 0:
            continue
        lo = np.minimum(lo, (idx.min(0) / H * 2 - 1) * mb - margin_cells * cell)
        hi = np.maximum(hi, ((idx.max(0) + 1) / H * 2 - 1) * mb
                        + margin_cells * cell)
    if not np.isfinite(lo[0]):
        return np.concatenate([np.full(3, 2.0 * bound),
                               np.full(3, 2.0 * bound)])
    return np.concatenate([np.clip(lo, -bound, bound),
                           np.clip(hi, -bound, bound)])


def test_occupied_aabb_matches_bruteforce():
    rng = np.random.default_rng(0)
    for C, bound in [(1, 1.0), (2, 2.0), (3, 2.0)]:
        occ = (rng.random((C, 16, 16, 16)) < 0.01).astype(np.uint8)
        got = np.asarray(occupied_aabb(jnp.asarray(occ), bound))
        want = brute_aabb(occ, bound)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_occupied_aabb_empty_grid_degenerate():
    """Empty grid -> zero-volume box -> every ray misses the slab test
    (the slab test is plane-order-insensitive, so lo > hi would NOT
    miss — only lo == hi guarantees near == far < strict-hit)."""
    from makeit3d_tpu.ops.marching import near_far_from_aabb

    occ = jnp.zeros((2, 8, 8, 8), jnp.uint8)
    box = occupied_aabb(occ, 2.0)
    assert (np.asarray(box[:3]) == np.asarray(box[3:])).all()
    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.normal(0, 3, (256, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (256, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    nears, fars = near_far_from_aabb(ro, rd, box, 0.05)
    assert not bool(jnp.any(nears < fars))


def test_occupied_aabb_single_cell():
    occ = np.zeros((1, 32, 32, 32), np.uint8)
    occ[0, 16, 8, 24] = 1
    box = np.asarray(occupied_aabb(jnp.asarray(occ), 1.0))
    # the occupied cell (with one-cell margin) is inside the box
    cell = 2.0 / 32
    lo = np.array([16, 8, 24]) / 32 * 2 - 1
    assert (box[:3] <= lo + 1e-6).all()
    assert (box[3:] >= lo + cell - 1e-6).all()


def _sphere_grid(cfg, center, radius):
    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    H = cfg.grid_size
    coords = (np.mgrid[0:H, 0:H, 0:H].astype(np.float32) + 0.5) / H * 2 - 1
    occ = (np.sqrt(((coords - np.asarray(center).reshape(3, 1, 1, 1)) ** 2
                    ).sum(0)) < radius).astype(np.uint8)
    return grid._replace(occ=jnp.asarray(occ[None].repeat(cfg.cascade, 0)))


@pytest.fixture(scope="module")
def small_render_setup():
    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.models.field import make_field
    from makeit3d_tpu.models.renderer import RenderSettings

    cfg = Config(guidance="none", backbone="vanilla", grid_size=32,
                 max_steps=128, eval_samples_per_ray=32,
                 bound=1.0)
    field = make_field(cfg)
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    es = RenderSettings.from_config(cfg, training=False)
    view = ViewSampler(cfg, type="test", H=32, W=32, size=8, seed=0).get(0)
    return cfg, field, params, es, view, key


def test_skippable_chunk_parity(small_render_setup):
    """Skipped chunk == full render of the same chunk, bitwise-ish."""
    from makeit3d_tpu.models.renderer import (
        render_eval_chunk_skippable, render_occupancy,
    )

    cfg, field, params, es, view, key = small_render_setup
    # off-center sphere: rays in one image corner miss its AABB
    grid = _sphere_grid(cfg, (0.5, 0.5, 0.0), 0.25)
    aabb = occupied_aabb(grid.occ, cfg.bound)

    ro = jnp.asarray(view.rays_o.reshape(-1, 3))
    rd = jnp.asarray(view.rays_d.reshape(-1, 3))
    ds = jnp.asarray(view.depth_scale.reshape(-1))
    for sl in (slice(0, 64), slice(480, 544), slice(960, 1024)):
        o, d, s = ro[sl], rd[sl], ds[sl]
        got = render_eval_chunk_skippable(
            field, params, grid, o, d, es, key, bg_color=1.0,
            depth_scale=s, aabb_occ=aabb)
        want = render_occupancy(
            field, params, grid, o, d, es, key, training=False,
            shading_mode=0, ambient_ratio=1.0, bg_color=1.0,
            perturb=False, depth_scale=s)
        for k in ("image", "depth", "weights_sum", "normal"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), atol=1e-5,
                err_msg=f"{k} rays[{sl}]")


def test_skippable_chunk_actually_skips(small_render_setup):
    """A chunk missing the box takes the cheap branch (pure bg)."""
    from makeit3d_tpu.models.renderer import render_eval_chunk_skippable

    cfg, field, params, es, view, key = small_render_setup
    grid = _sphere_grid(cfg, (0.0, 0.0, 0.0), 0.2)
    # zero-volume box far away: everything misses -> pure bg everywhere
    aabb = jnp.asarray([2.0, 2.0, 2.0, 2.0, 2.0, 2.0], jnp.float32)
    ro = jnp.asarray(view.rays_o.reshape(-1, 3))[:64]
    rd = jnp.asarray(view.rays_d.reshape(-1, 3))[:64]
    ds = jnp.asarray(view.depth_scale.reshape(-1))[:64]
    out = render_eval_chunk_skippable(
        field, params, grid, ro, rd, es, key, bg_color=1.0,
        depth_scale=ds, aabb_occ=aabb)
    np.testing.assert_allclose(np.asarray(out["image"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), 0.0)
    np.testing.assert_allclose(
        np.asarray(out["depth"]), es.max_depth * np.asarray(ds))


def _mini_trainer(tmp_path, **over):
    from makeit3d_tpu.training.trainer import Trainer

    cfg = Config(h=32, w=32, H=32, W=32, max_steps=128, grid_size=32,
                 train_samples_per_ray=16, eval_samples_per_ray=16,
                 backbone="vanilla", guidance="none",
                 lambda_smooth=0.0, iters=2, max_ray_batch=256,
                 workspace=str(tmp_path), **over)
    rgba = np.zeros((1, 512, 512, 4), np.float32)
    rgba[0, 160:352, 160:352, :] = 0.8
    tr = Trainer(cfg, ref_rgba=rgba,
                 ref_depth=np.full((512, 512), 0.5, np.float32),
                 ref_mask=rgba[0, :, :, 3] < 0.5,
                 workspace=cfg.workspace, use_checkpoint="scratch")
    # deterministic sparse occupancy (don't rely on training)
    tr.grid = _sphere_grid(cfg, (0.4, 0.0, 0.2), 0.3)
    return tr


def test_render_image_tiled_parity(tmp_path):
    """Tiled+skipped render_image == plain scanline render_image."""
    from makeit3d_tpu.cameras import ViewSampler

    tr = _mini_trainer(tmp_path / "a")
    view = ViewSampler(tr.cfg, type="test", H=32, W=32, size=8,
                       seed=0).get(2)
    tr.key = jax.random.PRNGKey(7)
    tiled = tr.render_image(view, bg_color=1.0)

    tr2 = _mini_trainer(tmp_path / "b", eval_tile=False,
                        eval_aabb_skip=False)
    tr2.key = jax.random.PRNGKey(7)
    plain = tr2.render_image(view, bg_color=1.0)

    for k in ("image", "depth", "weights_sum", "normal"):
        assert tiled[k].shape == plain[k].shape, k
        np.testing.assert_allclose(tiled[k], plain[k], atol=1e-5,
                                   err_msg=k)


def test_render_image_skip_decision(tmp_path):
    """Host-side per-frame regime pick: dense grid -> plain program
    (nothing would skip; the cond+padding overhead is a measured +15%,
    probe_eval_skip.py); sparse off-center grid -> tiled skip program."""
    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.ops.grid import init_density_grid

    tr = _mini_trainer(tmp_path / "a")
    view = ViewSampler(tr.cfg, type="test", H=32, W=32, size=8,
                       seed=0).get(0)

    tr.grid = init_density_grid(tr.cfg.cascade, tr.cfg.grid_size,
                                occupied=True)  # dense: early training
    tr.render_image(view, bg_color=1.0)
    assert tr._last_eval_used_skip is False

    tr.grid = _sphere_grid(tr.cfg, (0.55, 0.55, 0.0), 0.15)
    tr.render_image(view, bg_color=1.0)
    assert tr._last_eval_used_skip is True


def test_render_image_nonsquare_pads(tmp_path):
    """H, W not multiples of the tile side reassemble exactly."""
    from makeit3d_tpu.cameras import ViewSampler

    tr = _mini_trainer(tmp_path / "a")
    # 48x40 with T=16 tiles: no pad on H axis... 48%16==0, 40%16=8 pad
    view = ViewSampler(tr.cfg, type="test", H=48, W=40, size=8,
                       seed=0).get(1)
    tr.key = jax.random.PRNGKey(3)
    tiled = tr.render_image(view, bg_color=0.0)

    tr2 = _mini_trainer(tmp_path / "b", eval_tile=False,
                        eval_aabb_skip=False)
    tr2.key = jax.random.PRNGKey(3)
    plain = tr2.render_image(view, bg_color=0.0)

    assert tiled["image"].shape == (48, 40, 3)
    np.testing.assert_allclose(tiled["image"], plain["image"], atol=1e-5)
    np.testing.assert_allclose(tiled["depth"], plain["depth"], atol=1e-5)


def test_dust_filter_occ_drops_stray_cells():
    """Stray occupied cells (floater dust) are removed; the dominant
    component survives; the filtered box tightens (round-4 verdict
    weak #7: one stray cell pinned the box at the full bound)."""
    from makeit3d_tpu.ops.grid import dust_filter_occ

    occ = np.zeros((1, 32, 32, 32), np.uint8)
    occ[0, 10:20, 10:20, 10:20] = 1            # object: 1000 cells
    occ[0, 0, 0, 0] = 1                        # corner dust
    occ[0, 31, 31, 31] = 1                     # corner dust
    occ[0, 2, 28, 5] = 1                       # stray singleton
    filt, dropped = dust_filter_occ(occ, 0.005)
    assert dropped == 3
    assert filt[0, 0, 0, 0] == 0 and filt[0, 31, 31, 31] == 0
    assert filt[0, 10:20, 10:20, 10:20].all()

    box = np.asarray(occupied_aabb(jnp.asarray(filt), 1.0))
    box_raw = np.asarray(occupied_aabb(jnp.asarray(occ), 1.0))
    assert (box[3:] - box[:3] < box_raw[3:] - box_raw[:3]).all()

    # frac=0 disables: bit-identical passthrough
    same, d0 = dust_filter_occ(occ, 0.0)
    assert d0 == 0 and (same == occ).all()


def test_dust_filter_keeps_comparable_components():
    """Two components of similar size both survive (the filter only
    drops sub-threshold floaters, not legitimate secondary geometry)."""
    from makeit3d_tpu.ops.grid import dust_filter_occ

    occ = np.zeros((1, 32, 32, 32), np.uint8)
    occ[0, 4:10, 4:10, 4:10] = 1
    occ[0, 20:27, 20:27, 20:27] = 1
    filt, dropped = dust_filter_occ(occ, 0.005)
    assert dropped == 0
    assert (filt == occ).all()


def test_host_aabb_hit_matches_device():
    """The host regime-decision slab test reproduces the device
    predicate (ops.marching.near_far_from_aabb + near < far) on random
    rays AND on a box entirely behind the camera (advisor r4 #1: the
    old host test omitted the min_near clamp and counted near<far<0 as
    a hit)."""
    from makeit3d_tpu.ops.marching import near_far_from_aabb
    from makeit3d_tpu.training.eval_frame import host_aabb_hit

    rng = np.random.default_rng(0)
    box = np.array([-0.4, -0.3, -0.2, 0.5, 0.4, 0.3], np.float32)
    o = rng.uniform(-2, 2, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for min_near in (0.05, 0.1):
        nears, fars = near_far_from_aabb(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(box), min_near)
        dev_hit = np.asarray(nears < fars)
        host_hit = host_aabb_hit(box, o, d, min_near)
        np.testing.assert_array_equal(host_hit, dev_hit)

    # box entirely behind the camera: rays at +z looking +z, box at -z
    o2 = np.tile(np.array([[0.0, 0.0, 2.0]], np.float32), (4, 1))
    d2 = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    box2 = np.array([-0.5, -0.5, -0.5, 0.5, 0.5, 0.5], np.float32)
    nears, fars = near_far_from_aabb(
        jnp.asarray(o2), jnp.asarray(d2), jnp.asarray(box2), 0.05)
    assert not np.asarray(nears < fars).any()
    assert not host_aabb_hit(box2, o2, d2, 0.05).any()


def test_render_image_dust_filter_enables_skip(tmp_path):
    """A sphere grid polluted with corner dust: without the filter the
    box pins at the full bound and the skip stays off; with it the skip
    fires and dust floaters are culled from the eval march."""
    from makeit3d_tpu.cameras import ViewSampler

    tr = _mini_trainer(tmp_path / "a")
    occ = np.asarray(tr.grid.occ).copy()
    occ[0, 0, 0, 0] = 1
    occ[0, -1, -1, -1] = 1
    tr.grid = tr.grid._replace(occ=jnp.asarray(occ))
    view = ViewSampler(tr.cfg, type="test", H=32, W=32, size=8,
                       seed=0).get(0)

    tr.render_image(view, bg_color=1.0)
    assert tr._last_eval_used_skip is True
    assert tr._eval_dust_dropped == 2

    # filter disabled: the pinned box keeps the plain program
    tr2 = _mini_trainer(tmp_path / "b", eval_dust_frac=0.0)
    tr2.grid = tr2.grid._replace(occ=jnp.asarray(occ))
    tr2.render_image(view, bg_color=1.0)
    assert tr2._last_eval_used_skip is False
