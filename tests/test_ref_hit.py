"""Reference-view first-hit occupancy filter (ops/grid.ref_hit_filter_occ).

The eval-only demo filter keeps exactly the components the supervised
reference camera sees first: front-visible junk is photometrically
impossible, occluded junk is never first-hit, off-cone junk is never hit
(TPU_NOTES round 5 — guidance-free junk matches the object's density and
size, so the relative-size dust rule cannot separate them).
"""

import numpy as np

from makeit3d_tpu.ops.grid import ref_hit_filter_occ


def _blob(occ, center, r, H=64, bound=1.0):
    idx = np.clip(((np.asarray(center) / bound + 1) * 0.5 * H).astype(int),
                  0, H - 1)
    sl = tuple(slice(max(0, i - r), min(H, i + r + 1)) for i in idx)
    occ[0][sl] = 1


def _bundle(n=16, span=0.25):
    """Rays marching +axis0 from outside the bound, covering a small
    window around the axis; mirrors the axis convention of
    occupancy_lookup (cell index order = xyz component order)."""
    g = np.linspace(-span, span, n)
    yy, zz = np.meshgrid(g, g, indexing="ij")
    o = np.stack([np.full(yy.size, -1.5), yy.ravel(), zz.ravel()], axis=1)
    d = np.tile(np.array([[1.0, 0.0, 0.0]]), (yy.size, 1))
    return o, d


class TestRefHitFilter:
    def test_keeps_first_hit_drops_occluded_and_off_axis(self):
        H = 64
        occ = np.zeros((1, H, H, H), np.uint8)
        _blob(occ, (-0.3, 0.0, 0.0), 4, H)   # A: first-hit
        _blob(occ, (0.5, 0.0, 0.0), 4, H)    # B: behind A (occluded)
        _blob(occ, (0.0, 0.7, 0.7), 4, H)    # C: outside the bundle
        n_b_c = int(occ.sum()) - 9 ** 3
        o, d = _bundle()
        out, dropped = ref_hit_filter_occ(occ, o, d, bound=1.0)
        assert dropped == n_b_c
        # A survives intact
        a_idx = tuple(
            int((c / 1.0 + 1) * 0.5 * H) for c in (-0.3, 0.0, 0.0))
        assert out[0][a_idx] == 1
        assert int(out.sum()) == 9 ** 3
        # B and C are gone
        b_idx = tuple(int((c / 1.0 + 1) * 0.5 * H) for c in (0.5, 0.0, 0.0))
        c_idx = tuple(int((c / 1.0 + 1) * 0.5 * H) for c in (0.0, 0.7, 0.7))
        assert out[0][b_idx] == 0
        assert out[0][c_idx] == 0

    def test_empty_grid_unchanged(self):
        occ = np.zeros((1, 32, 32, 32), np.uint8)
        o, d = _bundle(4)
        out, dropped = ref_hit_filter_occ(occ, o, d, bound=1.0)
        assert dropped == 0
        assert out.sum() == 0

    def test_miss_bundle_is_conservative(self):
        """A bundle that hits nothing leaves the grid untouched (never
        blank the render because the probe bundle missed)."""
        H = 32
        occ = np.zeros((1, H, H, H), np.uint8)
        _blob(occ, (0.0, 0.8, 0.8), 2, H)
        o, d = _bundle(4, span=0.05)
        out, dropped = ref_hit_filter_occ(occ, o, d, bound=1.0)
        assert dropped == 0
        assert (out == occ).all()

    def test_multi_cascade_untouched_without_hits(self):
        """Cascade 1 has a component; the bundle only hits cascade 0.
        Cascade 1 must stay untouched (conservative per-cascade rule)."""
        H = 32
        occ = np.zeros((2, H, H, H), np.uint8)
        _blob(occ, (-0.3, 0.0, 0.0), 2, H)           # cascade 0 object
        occ[1][2, 2, 2] = 1                           # far cascade-1 cell
        o, d = _bundle(8)
        out, dropped = ref_hit_filter_occ(occ, o, d, bound=2.0)
        assert out[1][2, 2, 2] == 1
        assert out[0].sum() == occ[0].sum()

    def test_opening_breaks_thin_bridges(self):
        """Junk connected to the object through a 1-cell bridge is a
        single component; opening=1 must still cull it (the round-5
        measured failure mode: the converged teddy shares a component
        with its aliasing replicas)."""
        H = 64
        occ = np.zeros((1, H, H, H), np.uint8)
        _blob(occ, (-0.3, 0.0, 0.0), 4, H)   # A: object (first-hit)
        _blob(occ, (0.0, 0.5, 0.0), 4, H)    # J: junk, off the bundle
        a = tuple(int((c + 1) * 0.5 * H) for c in (-0.3, 0.0, 0.0))
        j = tuple(int((c + 1) * 0.5 * H) for c in (0.0, 0.5, 0.0))
        # 1-cell 6-connected bridge: axis-0 run, then axis-1 run (a
        # diagonal line is NOT 6-connected and would not merge the
        # components in the first place)
        for x in range(a[0], j[0] + 1):
            occ[0][x, a[1], a[2]] = 1
        for y in range(a[1], j[1] + 1):
            occ[0][j[0], y, a[2]] = 1
        o, d = _bundle()
        out, dropped = ref_hit_filter_occ(occ, o, d, bound=1.0)
        assert out[0][a] == 1           # object kept
        assert out[0][j] == 0           # bridged junk culled
        # plain component rule (opening=0) keeps the junk: the bridge
        # merges them into one component
        out0, _ = ref_hit_filter_occ(occ, o, d, bound=1.0, opening=0)
        assert out0[0][j] == 1
