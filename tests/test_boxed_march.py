"""Gather-free boxed marching (ops/marching.march_rays_boxed).

The occupancy march's probe gathers are the coarse step's largest cost
at the XLA gather ceiling (docs/TPU_NOTES.md); boxed mode replaces them
with one slab test per ray against the occupied AABB and a uniform
in-segment lattice. These tests pin the sampling contract and the
renderer integration.
"""

import jax
import jax.numpy as jnp
import numpy as np

from makeit3d_tpu.ops.marching import march_rays_boxed, near_far_from_aabb


class TestBoxedMarch:
    def test_samples_inside_box_and_dts(self):
        box = jnp.asarray([-0.3, -0.2, -0.4, 0.3, 0.2, 0.4], jnp.float32)
        o = jnp.asarray([[0.0, 0.0, -1.5], [0.0, 0.0, -1.5]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], jnp.float32)
        nears = jnp.full((2,), 0.05)
        fars = jnp.full((2,), 3.0)
        m = march_rays_boxed(o, d, box, nears, fars, n_samples=16)
        m = jax.tree.map(np.asarray, m)
        # ray 0 passes through the box: all samples valid, inside the
        # box along z, uniformly spaced with dt == segment length
        assert m.valid[0].all()
        assert (m.xyzs[0, :, 2] >= -0.4 - 1e-5).all()
        assert (m.xyzs[0, :, 2] <= 0.4 + 1e-5).all()
        seg = m.dts[0, 0]
        assert np.allclose(m.dts[0], seg)
        assert np.allclose(np.diff(m.ts[0]), seg, atol=1e-5)
        assert np.isclose(seg * 16, 0.8, atol=1e-4)
        # ray 1 points away from the box: no valid samples
        assert not m.valid[1].any()
        assert (m.dts[1] == 0).all()

    def test_transmittance_matches_closed_form(self):
        """Constant density inside the box -> alpha of the composited
        ray has the closed form 1 - exp(-sigma * span)."""
        from makeit3d_tpu.ops.composite import composite_rays

        box = jnp.asarray([-0.5, -0.5, -0.5, 0.5, 0.5, 0.5], jnp.float32)
        o = jnp.asarray([[0.0, 0.0, -1.5]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        m = march_rays_boxed(o, d, box, jnp.asarray([0.05]),
                             jnp.asarray([3.0]), n_samples=64)
        sigma = 3.0
        sigmas = jnp.full(m.ts.shape, sigma)
        rgbs = jnp.ones((*m.ts.shape, 3)) * 0.5
        out = composite_rays(sigmas, rgbs, m.dts, m.ts, m.valid)
        ws = float(np.asarray(out.weights_sum)[0])
        assert np.isclose(ws, 1.0 - np.exp(-sigma * 1.0), atol=1e-3)

    def test_renderer_boxed_mode_close_to_occupancy(self):
        """On a solid-sphere grid + blob field, the boxed render and the
        occupancy render agree on the opaque core (same field, different
        sample placement)."""
        import dataclasses

        from makeit3d_tpu.config import Config
        from makeit3d_tpu.models.field import make_field
        from makeit3d_tpu.models.renderer import (
            RenderSettings, render_occupancy,
        )
        from makeit3d_tpu.ops.grid import init_density_grid

        cfg = Config(guidance="none", backbone="fourier")
        field = make_field(cfg)
        key = jax.random.PRNGKey(0)
        params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
        grid = init_density_grid(cfg.cascade, cfg.grid_size)
        # solid center sphere occupancy
        H = cfg.grid_size
        g = (np.arange(H) + 0.5) / H * 2 - 1
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        occ = ((X**2 + Y**2 + Z**2) < 0.4**2).astype(np.uint8)[None]
        grid = grid._replace(occ=jnp.asarray(occ))
        n = 8
        px = np.linspace(-0.2, 0.2, n)
        o = np.stack([np.stack([x, np.zeros(()), -1.5 * np.ones(())])
                      for x in px]).astype(np.float32)
        d = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
        s = RenderSettings.from_config(cfg, training=False)
        outs = {}
        for mode in ("occupancy", "boxed"):
            sm = dataclasses.replace(s, march_mode=mode)
            outs[mode] = render_occupancy(
                field, params, grid, jnp.asarray(o), jnp.asarray(d), sm,
                key, training=False, perturb=False, bg_color=1.0,
                shaded=False)
        wa = np.asarray(outs["occupancy"]["weights_sum"])
        wb = np.asarray(outs["boxed"]["weights_sum"])
        # opaque core: the samplers agree almost exactly; soft edges of
        # the random-init field legitimately differ (sample placement,
        # same systematic disagreement as occupancy-vs-pure oracle)
        core = wa > 0.99
        assert core.any()
        assert np.allclose(wa[core], wb[core], atol=1e-2)
        assert float(np.abs(wa - wb).max()) < 0.12
        ia = np.asarray(outs["occupancy"]["image"])
        ib = np.asarray(outs["boxed"]["image"])
        assert float(np.abs(ia[core] - ib[core]).max()) < 0.05
