"""SBVH, primitive pre-splitting, and reinsertion-optimizer tests.

Covers the reference's optional quality components
(spatial_split_bvh_builder.hpp, heuristic_primitive_splitter.hpp,
parallel_reinsertion_optimizer.hpp) via the golden NumPy rebuilds:
structural invariants, oracle-equivalent traversal, and SAH improvement.
"""

import numpy as np
import pytest

from ceres_tpu.accel import golden_builders as gb
from ceres_tpu.accel import presplit as ps
from ceres_tpu.accel import reinsertion as ri
from ceres_tpu.accel import sbvh


def _random_soup(rng, T, spread=2.0, elongate=None):
    """Random triangle soup; optionally make some triangles long/thin."""
    base = rng.uniform(-spread, spread, (T, 3))
    d1 = rng.normal(0, 0.3, (T, 3))
    d2 = rng.normal(0, 0.3, (T, 3))
    if elongate is not None:
        k = int(elongate * T)
        d1[:k] *= 20.0  # long thin slivers: the pre-splitter's target
    p0 = base
    p1 = base + d1
    p2 = base + d2
    return p0, p1, p2


def _mt_arrays(p0, p1, p2):
    e1 = p0 - p1
    e2 = p2 - p0
    n = np.cross(e1, e2)
    return e1, e2, n


def _random_rays(rng, R, spread=4.0):
    origins = rng.uniform(-spread, spread, (R, 3))
    dirs = rng.normal(0, 1, (R, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origins, dirs


def _oracle_closest(p0, p1, p2, origins, dirs):
    """Brute-force closest hit: same accept set as the reference MT."""
    e1, e2, n = _mt_arrays(p0, p1, p2)
    R = origins.shape[0]
    t_out = np.full(R, np.inf)
    id_out = np.full(R, -1)
    for r in range(R):
        c = p0 - origins[r]
        rr = np.cross(dirs[r], c)
        det = n @ dirs[r]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.einsum("ij,ij->i", rr, e2) / det
            v = np.einsum("ij,ij->i", rr, e1) / det
            t = np.einsum("ij,ij->i", n, c) / det
        ok = (u >= 0) & (v >= 0) & (1 - u - v >= 0) & (t >= 0) & (det != 0)
        t = np.where(ok, t, np.inf)
        i = int(np.argmin(t))
        if np.isfinite(t[i]):
            t_out[r] = t[i]
            id_out[r] = i
    return t_out, id_out


def _assert_matches_oracle(bvh, p0, p1, p2, origins, dirs):
    e1, e2, n = _mt_arrays(p0, p1, p2)
    t, _, _, pid, _ = gb.traverse_closest(bvh, p0, e1, e2, n, origins, dirs)
    t_ref, id_ref = _oracle_closest(p0, p1, p2, origins, dirs)
    np.testing.assert_allclose(t, t_ref, rtol=1e-9, atol=1e-12)
    # Hit ids must agree wherever the closest hit is unique.
    both = (pid >= 0) & (id_ref >= 0)
    assert np.array_equal(pid >= 0, id_ref >= 0)
    assert (pid[both] == id_ref[both]).mean() > 0.99


# ---------------------------------------------------------------------------
# Triangle::split (axis-plane clip)
# ---------------------------------------------------------------------------

class TestSplitTriangleBox:
    def test_halves_union_to_bbox(self, rng):
        for _ in range(50):
            p0, p1, p2 = rng.normal(0, 1, (3, 3))
            lo = np.minimum(np.minimum(p0, p1), p2)
            hi = np.maximum(np.maximum(p0, p1), p2)
            axis = int(rng.integers(3))
            pos = float(rng.uniform(lo[axis], hi[axis]))
            (llo, lhi), (rlo, rhi) = sbvh.split_triangle_box(
                p0, p1, p2, axis, pos)
            # Each half bounded by the plane.
            assert lhi[axis] <= pos + 1e-12
            assert rlo[axis] >= pos - 1e-12
            # Union reproduces the original bbox.
            np.testing.assert_allclose(np.minimum(llo, rlo), lo, atol=1e-9)
            np.testing.assert_allclose(np.maximum(lhi, rhi), hi, atol=1e-9)

    def test_plane_outside_gives_empty_side(self):
        p0 = np.array([0.0, 0.0, 0.0])
        p1 = np.array([1.0, 0.0, 0.0])
        p2 = np.array([0.0, 1.0, 0.0])
        (llo, lhi), (rlo, rhi) = sbvh.split_triangle_box(p0, p1, p2, 0, 5.0)
        assert (llo <= lhi).all()          # left holds the whole triangle
        assert (rlo > rhi).any()           # right side is empty


# ---------------------------------------------------------------------------
# SBVH
# ---------------------------------------------------------------------------

class TestSbvh:
    def test_invariants_and_budget(self, rng):
        T = 200
        p0, p1, p2 = _random_soup(rng, T, elongate=0.3)
        bvh = sbvh.build_sbvh(p0, p1, p2)
        sbvh.validate_sbvh(bvh, T)
        assert bvh.prim_indices.shape[0] <= T + int(sbvh.SPLIT_FACTOR * T)

    def test_traversal_matches_oracle(self, rng):
        T = 150
        p0, p1, p2 = _random_soup(rng, T, elongate=0.3)
        bvh = sbvh.build_sbvh(p0, p1, p2)
        origins, dirs = _random_rays(rng, 64)
        _assert_matches_oracle(bvh, p0, p1, p2, origins, dirs)

    def test_quality_not_worse_than_binned_on_slivers(self, rng):
        # Long diagonal slivers are the scene class spatial splits exist
        # for; SBVH must at least match the object-split builder's SAH.
        T = 120
        p0, p1, p2 = _random_soup(rng, T, elongate=0.6)
        pts = np.stack([p0, p1, p2], 1)
        lo, hi = pts.min(1), pts.max(1)
        centers = (lo + hi) / 2
        plain = gb.build_binned_sah(lo, hi, centers)
        spatial = sbvh.build_sbvh(p0, p1, p2)
        assert gb.sah_cost(spatial) <= gb.sah_cost(plain) * 1.05


# ---------------------------------------------------------------------------
# Heuristic primitive pre-splitting
# ---------------------------------------------------------------------------

class TestPresplit:
    def test_refs_cover_primitives(self, rng):
        T = 100
        p0, p1, p2 = _random_soup(rng, T, elongate=0.4)
        ref_ids, ref_lo, ref_hi = ps.presplit_refs(p0, p1, p2, 0.5)
        assert ref_ids.shape[0] >= T
        assert set(ref_ids.tolist()) == set(range(T))
        # Each primitive's references union to its bbox.
        pts = np.stack([p0, p1, p2], 1)
        for i in range(T):
            sel = ref_ids == i
            np.testing.assert_allclose(ref_lo[sel].min(0), pts[i].min(0),
                                       atol=1e-9)
            np.testing.assert_allclose(ref_hi[sel].max(0), pts[i].max(0),
                                       atol=1e-9)

    def test_budget_respected(self, rng):
        T = 100
        p0, p1, p2 = _random_soup(rng, T, elongate=0.4)
        ref_ids, _, _ = ps.presplit_refs(p0, p1, p2, 0.3)
        assert ref_ids.shape[0] <= T + int(round(0.3 * T))

    def test_build_with_presplit_matches_oracle(self, rng):
        T = 120
        p0, p1, p2 = _random_soup(rng, T, elongate=0.5)
        bvh = ps.build_with_presplit(gb.build_binned_sah, p0, p1, p2, 0.5)
        # Repaired leaves: no duplicate primitive inside one leaf.
        for node in range(bvh.node_count):
            if bvh.prim_count[node] > 0:
                a = int(bvh.first_child[node])
                ids = bvh.prim_indices[a:a + int(bvh.prim_count[node])]
                assert len(set(ids.tolist())) == len(ids)
        origins, dirs = _random_rays(rng, 64)
        _assert_matches_oracle(bvh, p0, p1, p2, origins, dirs)

    def test_priorities_favor_slivers(self, rng):
        # A long thin sliver must out-prioritize a compact triangle.
        p0 = np.array([[0, 0, 0], [0, 0, 0]], float)
        p1 = np.array([[10, 0.1, 0.1], [0.5, 0, 0]], float)
        p2 = np.array([[10, 0.2, 0.05], [0, 0.5, 0]], float)
        pts = np.stack([p0, p1, p2], 1)
        areas = 0.5 * np.linalg.norm(np.cross(p0 - p1, p2 - p0), axis=1)
        pri = ps.split_priorities(pts.min(1), pts.max(1), areas)
        assert pri[0] > pri[1]


# ---------------------------------------------------------------------------
# Reinsertion optimizer
# ---------------------------------------------------------------------------

class _IndexSplitBuilder(gb._Builder):
    """Deliberately poor builder: splits at the middle of the current
    (unsorted) order — produces high-SAH trees for shuffled input."""

    def _find_split(self, ids):
        if ids.shape[0] <= self.max_leaf:
            return None
        return 0, ids, ids.shape[0] // 2


class TestReinsertion:
    def _bad_tree(self, rng, T):
        p0, p1, p2 = _random_soup(rng, T)
        pts = np.stack([p0, p1, p2], 1)
        lo, hi = pts.min(1), pts.max(1)
        centers = (lo + hi) / 2
        perm = rng.permutation(T)
        # Shuffle so index-order splits are spatially meaningless; leaves
        # hold one triangle each so the *topology* carries all the badness
        # (reinsertion moves subtrees, it cannot change leaf membership).
        bvh = _IndexSplitBuilder(lo[perm], hi[perm], centers[perm],
                                 max_leaf_size=1).build()
        bvh.prim_indices = perm[bvh.prim_indices].astype(np.uint32)
        return (p0, p1, p2), bvh

    def test_sah_reaches_sweep_quality(self, rng):
        (p0, p1, p2), bvh = self._bad_tree(rng, 256)
        gb.validate(bvh)
        before = gb.sah_cost(bvh)
        opt = ri.optimize_reinsertion(bvh, max_rounds=3)
        gb.validate(opt)
        after = gb.sah_cost(opt)
        pts = np.stack([p0, p1, p2], 1)
        lo, hi = pts.min(1), pts.max(1)
        sweep = gb.sah_cost(gb.build_sweep_sah(lo, hi, (lo + hi) / 2,
                                               max_leaf_size=1))
        assert after < before * 0.5, (before, after)
        assert after <= sweep * 1.1, (after, sweep)

    def test_traversal_unchanged_semantics(self, rng):
        (p0, p1, p2), bvh = self._bad_tree(rng, 128)
        opt = ri.optimize_reinsertion(bvh, max_rounds=1)
        origins, dirs = _random_rays(rng, 48)
        _assert_matches_oracle(opt, p0, p1, p2, origins, dirs)

    def test_noop_on_good_tree_is_safe(self, rng):
        T = 128
        p0, p1, p2 = _random_soup(rng, T)
        pts = np.stack([p0, p1, p2], 1)
        lo, hi = pts.min(1), pts.max(1)
        bvh = gb.build_sweep_sah(lo, hi, (lo + hi) / 2)
        opt = ri.optimize_reinsertion(bvh, max_rounds=1)
        gb.validate(opt)
        assert gb.sah_cost(opt) <= gb.sah_cost(bvh) + 1e-6
