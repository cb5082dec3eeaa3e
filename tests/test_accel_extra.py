"""PLOC builder + sphere primitive tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ceres_tpu.accel import lbvh as lb
from ceres_tpu.accel import ploc as pl_mod
from ceres_tpu.models.mesh import triangle_soup
from ceres_tpu.ops import sphere as sph


def _random_soup(rng, V=60, F=150):
    verts = rng.standard_normal((V, 3)).astype(np.float32)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    return triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)


class TestPloc:
    @pytest.fixture(scope="class")
    def tree(self):
        rng = np.random.default_rng(5)
        soup = _random_soup(rng)
        return pl_mod.build_ploc(soup), soup

    def test_topology_valid(self, tree):
        t, soup = tree
        T = soup.num_triangles
        left = np.asarray(t.left)
        right = np.asarray(t.right)
        root = int(t.root)
        seen_leaf = np.zeros(T, bool)
        seen_int = np.zeros(T - 1, bool)
        stack = [root]
        seen_int[root] = True
        while stack:
            i = stack.pop()
            for c in (left[i], right[i]):
                if c < 0:
                    leaf = -c - 1
                    assert not seen_leaf[leaf]
                    seen_leaf[leaf] = True
                else:
                    assert not seen_int[c]
                    seen_int[c] = True
                    stack.append(c)
        assert seen_leaf.all() and seen_int.all()

    def test_boxes_contain_children(self, tree):
        t, _ = tree
        left = np.asarray(t.left)
        right = np.asarray(t.right)
        nlo, nhi = np.asarray(t.node_lo), np.asarray(t.node_hi)
        llo, lhi = np.asarray(t.leaf_lo), np.asarray(t.leaf_hi)
        for i in range(left.shape[0]):
            for c in (left[i], right[i]):
                clo = llo[-c - 1] if c < 0 else nlo[c]
                chi = lhi[-c - 1] if c < 0 else nhi[c]
                assert (nlo[i] <= clo + 1e-5).all()
                assert (nhi[i] >= chi - 1e-5).all()

    def test_sah_competitive_with_lbvh(self):
        rng = np.random.default_rng(9)
        soup = _random_soup(rng, V=120, F=400)
        t = pl_mod.build_ploc(soup)
        b = lb.build_lbvh(soup)
        c_ploc = float(pl_mod.sah_cost(t))
        c_lbvh = float(lb.sah_cost(b))
        assert np.isfinite(c_ploc) and c_ploc > 1.0
        # Agglomerative clustering should beat or match plain LBVH quality.
        assert c_ploc <= c_lbvh * 1.1


class TestSphere:
    def test_matches_quadratic_oracle(self, rng):
        R, S = 200, 12
        o = rng.standard_normal((R, 3)).astype(np.float32) * 0.1
        d = rng.standard_normal((R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        c = rng.standard_normal((S, 3)).astype(np.float32) * 2
        r = rng.uniform(0.2, 1.0, S).astype(np.float32)

        hit = sph.closest_hit(jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(c), jnp.asarray(r))
        # float64 oracle
        t_all = np.full((R, S), np.inf)
        for s in range(S):
            oc = o.astype(np.float64) - c[s]
            b = np.sum(oc * d, -1)
            cc = np.sum(oc * oc, -1) - r[s] ** 2
            disc = b * b - cc
            ok = disc >= 0
            sq = np.sqrt(np.where(ok, disc, 0))
            tn, tf = -b - sq, -b + sq
            t = np.where(tn >= 0, tn, tf)
            t_all[:, s] = np.where(ok & (t >= 0), t, np.inf)
        t_ref = t_all.min(axis=1)
        m = np.isfinite(t_ref)
        np.testing.assert_array_equal(np.asarray(hit.mask), m)
        np.testing.assert_allclose(np.asarray(hit.t)[m], t_ref[m],
                                   rtol=1e-4, atol=1e-5)

    def test_inside_sphere_hits_far_root(self):
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        c = jnp.zeros((1, 3))
        r = jnp.asarray([2.0])
        hit = sph.closest_hit(o, d, c, r)
        assert bool(hit.mask[0])
        np.testing.assert_allclose(float(hit.t[0]), 2.0, rtol=1e-6)

    def test_differentiable(self):
        def f(radius):
            hit = sph.closest_hit(
                jnp.zeros((1, 3)) + jnp.asarray([0.0, 0.0, -5.0]),
                jnp.asarray([[0.0, 0.0, 1.0]]),
                jnp.zeros((1, 3)), radius[None])
            return hit.t[0]

        g = jax.grad(f)(jnp.float32(1.0))
        np.testing.assert_allclose(float(g), -1.0, rtol=1e-5)  # t = 5 - r
