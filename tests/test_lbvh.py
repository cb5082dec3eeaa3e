"""LBVH structural invariants + traversal equivalence (SURVEY.md §4 items 2-3).

Mirrors what the reference builders guarantee (bvh.hpp:81-91 invariants):
children partition the parent range, parent AABBs contain child AABBs, and
a stack traversal of the tree finds exactly the brute-force closest hit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ceres_tpu.accel import lbvh as lb
from ceres_tpu.models.mesh import triangle_soup


def _random_soup(rng, V=80, F=160):
    verts = rng.standard_normal((V, 3)).astype(np.float32)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    return triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)


@pytest.fixture(scope="module")
def tree_and_soup():
    rng = np.random.default_rng(3)
    soup = _random_soup(rng)
    return lb.build_lbvh(soup), soup


def _child_range(bvh, c):
    """(lo, hi) sorted-leaf range of a child code."""
    if c < 0:
        leaf = -int(c) - 1
        return leaf, leaf
    return int(bvh.range_lo[c]), int(bvh.range_hi[c])


class TestTopology:
    def test_children_partition_ranges(self, tree_and_soup):
        bvh, _ = tree_and_soup
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        for i in range(left.shape[0]):
            llo, lhi = _child_range(bvh, left[i])
            rlo, rhi = _child_range(bvh, right[i])
            assert llo == int(bvh.range_lo[i])
            assert rhi == int(bvh.range_hi[i])
            assert lhi + 1 == rlo

    def test_root_covers_everything(self, tree_and_soup):
        bvh, _ = tree_and_soup
        assert int(bvh.range_lo[0]) == 0
        assert int(bvh.range_hi[0]) == bvh.num_triangles - 1

    def test_parents_consistent(self, tree_and_soup):
        bvh, _ = tree_and_soup
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        parent = np.asarray(bvh.parent)
        leaf_parent = np.asarray(bvh.leaf_parent)
        assert parent[0] == -1
        for i in range(left.shape[0]):
            for c in (left[i], right[i]):
                if c < 0:
                    assert leaf_parent[-c - 1] == i
                else:
                    assert parent[c] == i

    def test_every_node_reachable_once(self, tree_and_soup):
        bvh, _ = tree_and_soup
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        seen_internal = np.zeros(left.shape[0], bool)
        seen_leaf = np.zeros(bvh.num_triangles, bool)
        stack = [0]
        seen_internal[0] = True
        while stack:
            i = stack.pop()
            for c in (left[i], right[i]):
                if c < 0:
                    assert not seen_leaf[-c - 1]
                    seen_leaf[-c - 1] = True
                else:
                    assert not seen_internal[c]
                    seen_internal[c] = True
                    stack.append(c)
        assert seen_internal.all() and seen_leaf.all()


class TestBoxes:
    def test_node_boxes_contain_children(self, tree_and_soup):
        bvh, _ = tree_and_soup
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        nlo, nhi = np.asarray(bvh.node_lo), np.asarray(bvh.node_hi)
        llo, lhi = np.asarray(bvh.leaf_lo), np.asarray(bvh.leaf_hi)
        for i in range(left.shape[0]):
            for c in (left[i], right[i]):
                clo = llo[-c - 1] if c < 0 else nlo[c]
                chi = lhi[-c - 1] if c < 0 else nhi[c]
                assert (nlo[i] <= clo + 1e-6).all()
                assert (nhi[i] >= chi - 1e-6).all()

    def test_refit_after_move(self, tree_and_soup):
        bvh, soup = tree_and_soup
        import dataclasses

        moved = dataclasses.replace(soup, p0=soup.p0 + 1.5)
        re = lb.refit(bvh, moved)
        # Root box must contain every (shifted) triangle vertex.
        pts = np.concatenate([np.asarray(moved.p0),
                              np.asarray(moved.p0 - moved.e1),
                              np.asarray(moved.p0 + moved.e2)])
        assert (pts >= np.asarray(re.node_lo[0]) - 1e-5).all()
        assert (pts <= np.asarray(re.node_hi[0]) + 1e-5).all()

    def test_sah_cost_finite(self, tree_and_soup):
        bvh, _ = tree_and_soup
        cost = float(lb.sah_cost(bvh))
        assert np.isfinite(cost) and cost > 1.0


class TestClusterCut:
    @pytest.mark.parametrize("C", [8, 32, 128])
    def test_cut_tiles_range(self, tree_and_soup, C):
        bvh, _ = tree_and_soup
        starts, cluster_of = lb.cluster_cut(bvh, C)
        starts = np.asarray(starts)
        cluster_of = np.asarray(cluster_of)
        assert starts[0] == 1
        n_c = int(starts.sum())
        # Cluster ids are contiguous, non-decreasing, sizes <= C.
        assert cluster_of.min() == 0 and cluster_of.max() == n_c - 1
        sizes = np.bincount(cluster_of)
        assert (sizes <= C).all()
        assert sizes.sum() == bvh.num_triangles


class TestTraversalEquivalence:
    def test_closest_hit_matches_bruteforce(self, tree_and_soup, rng):
        bvh, soup = tree_and_soup
        from ceres_tpu.utils.golden import intersect_all

        p0 = np.asarray(soup.p0, np.float64)
        e1 = np.asarray(soup.e1, np.float64)
        e2 = np.asarray(soup.e2, np.float64)
        n = np.asarray(soup.n, np.float64)
        R = 200
        origins = np.zeros((R, 3)) + np.array([0, 0, -4.0])
        dirs = rng.standard_normal((R, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        t_bf, _, _, id_bf, hit_bf = intersect_all(origins, dirs, p0, e1, e2, n)

        # Stack traversal of the LBVH (the single_ray_traverser algorithm,
        # in NumPy, used as the structural oracle).
        order = np.asarray(bvh.order)
        left, right = np.asarray(bvh.left), np.asarray(bvh.right)
        nlo, nhi = np.asarray(bvh.node_lo), np.asarray(bvh.node_hi)
        llo, lhi = np.asarray(bvh.leaf_lo), np.asarray(bvh.leaf_hi)

        def slab(lo, hi, o, inv):
            t0 = (lo - o) * inv
            t1 = (hi - o) * inv
            tn = np.minimum(t0, t1).max()
            tf = np.maximum(t0, t1).min()
            return tn <= tf and tf >= 0

        for r in range(R):
            o, d = origins[r], dirs[r]
            inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
            best_t, best_id = np.inf, -1
            stack = [0]
            while stack:
                node = stack.pop()
                if node < 0:
                    leaf = -node - 1
                    tri = order[leaf]
                    t, _, _, _, h = intersect_all(
                        o[None], d[None], p0[tri:tri + 1], e1[tri:tri + 1],
                        e2[tri:tri + 1], n[tri:tri + 1])
                    if h[0] and t[0] < best_t:
                        best_t, best_id = t[0], tri
                    continue
                if slab(nlo[node], nhi[node], o, inv):
                    stack.append(left[node])
                    stack.append(right[node])
            assert (best_id >= 0) == hit_bf[r]
            if hit_bf[r]:
                assert abs(best_t - t_bf[r]) < 1e-9
