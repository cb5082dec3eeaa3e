"""LBVH-treelet cluster packing (the megakernel's traversal structure)."""

import numpy as np
import jax.numpy as jnp

from ceres_tpu.accel import clusters as cl
from ceres_tpu.models.mesh import triangle_soup


def _soup(rng, T):
    verts = rng.normal(0, 1, (T + 2, 3)).astype(np.float32)
    faces = np.stack([np.arange(T), np.arange(T) + 1, np.arange(T) + 2],
                     axis=1).astype(np.int32)
    return triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)


def _check_clusterset(cs, soup):
    T = soup.num_triangles
    perm = np.asarray(cs.perm)
    valid = perm >= 0
    # Every triangle appears exactly once across the packed slots.
    assert sorted(perm[valid].tolist()) == list(range(T))
    # Packed records match the soup rows they claim to be.
    p0 = np.asarray(cs.p0).reshape(-1, 3)
    np.testing.assert_allclose(p0[valid], np.asarray(soup.p0)[perm[valid]],
                               rtol=1e-6)
    # Cluster boxes contain their member triangles; empty clusters carry
    # the empty sentinel (lo > hi).
    lo = np.asarray(cs.lo)
    hi = np.asarray(cs.hi)
    C = cs.cluster_size
    pts = np.stack([np.asarray(soup.p0), np.asarray(soup.p1),
                    np.asarray(soup.p2)], axis=1)
    for c in range(cs.num_clusters):
        members = perm[c * C:(c + 1) * C]
        members = members[members >= 0]
        if members.size == 0:
            assert (lo[c] > hi[c]).any()
            continue
        mlo = pts[members].min(axis=(0, 1))
        mhi = pts[members].max(axis=(0, 1))
        assert (lo[c] <= mlo + 1e-5).all()
        assert (hi[c] >= mhi - 1e-5).all()


def test_treelet_invariants(rng):
    soup = _soup(rng, 500)
    cs = cl.build_clusters_treelet(soup, 64)
    _check_clusterset(cs, soup)
    assert cs.num_clusters <= 2 * (-(-500 // 64))


def test_treelet_boxes_tighter_than_runs(bunny):
    verts, faces = bunny
    soup = triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)
    runs = cl.build_clusters(soup)
    tree = cl.build_clusters_treelet(soup)

    def total_half_area(cs):
        lo, hi = np.asarray(cs.lo), np.asarray(cs.hi)
        ok = (hi >= lo).all(axis=1)
        d = (hi - lo)[ok]
        return float((d[:, 0] * (d[:, 1] + d[:, 2]) + d[:, 1] * d[:, 2]).sum())

    _check_clusterset(tree, soup)
    # The treelet cut must reduce total cluster surface (tighter culling).
    assert total_half_area(tree) < total_half_area(runs)


def test_small_soup_falls_back(rng):
    soup = _soup(rng, 20)
    cs = cl.build_clusters_treelet(soup, 64)  # T <= C: fixed-run path
    _check_clusterset(cs, soup)
    assert cs.num_clusters == 1


def test_super_cut_partition(bunny):
    """Tree-derived supers (two-level walk upper level): super_first must
    be a non-decreasing partition of the real fine clusters into runs of
    at most super_S members, each fine cluster in exactly one super."""
    verts, faces = bunny
    soup = triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)
    cs = cl.build_clusters_treelet(soup)
    assert cs.super_first is not None and cs.super_S > 1
    first = np.asarray(cs.super_first)
    n_c = cs.num_clusters
    S = cs.super_S
    # Number of real (non-empty) fine clusters.
    lo, hi = np.asarray(cs.lo), np.asarray(cs.hi)
    real = (hi >= lo).all(axis=1)
    n_t = int(real.sum())
    # Real fine ids are the first n_t (scatter order of the cut).
    assert real[:n_t].all() and not real[n_t:].any()
    assert (np.diff(first) >= 0).all()
    assert first[0] == 0
    ends = np.append(first[1:], n_c)
    runs = np.minimum(ends, n_t) - np.minimum(first, n_t)
    assert (runs >= 0).all() and (runs <= S).all()
    assert runs.sum() == n_t          # every real cluster covered once


def test_super_boxes_tighter_than_consecutive_runs(bunny):
    """The tree-derived super level must not be looser than uniform
    S-runs of consecutive blocks (the r4 fallback): compare total union
    half-area at the same S."""
    verts, faces = bunny
    soup = triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)
    cs = cl.build_clusters_treelet(soup)
    from ceres_tpu.ops import megakernel as mk

    S = cs.super_S
    n_c = cs.num_clusters
    uniform = jnp.minimum(
        jnp.arange(-(-n_c // S), dtype=jnp.int32) * S, n_c)
    lo_t, hi_t, _ = mk._super_members(cs.lo, cs.hi, cs.super_first, S)
    lo_u, hi_u, _ = mk._super_members(cs.lo, cs.hi, uniform, S)

    def area(lo, hi):
        lo, hi = np.asarray(lo), np.asarray(hi)
        ok = (hi >= lo).all(axis=1)
        d = (hi - lo)[ok]
        return float((d[:, 0] * (d[:, 1] + d[:, 2])
                      + d[:, 1] * d[:, 2]).sum())

    assert area(lo_t, hi_t) < area(lo_u, hi_u)
