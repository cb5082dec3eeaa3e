"""Golden builders: structural validity, SAH quality, traversal equivalence."""

import numpy as np
import pytest

from ceres_tpu.accel import golden_builders as gb
from ceres_tpu.models.mesh import triangle_soup
import jax.numpy as jnp


def _soup_np(rng, V=60, F=140):
    verts = rng.standard_normal((V, 3)).astype(np.float32)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    soup = triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)
    p0 = np.asarray(soup.p0, np.float64)
    e1 = np.asarray(soup.e1, np.float64)
    e2 = np.asarray(soup.e2, np.float64)
    n = np.asarray(soup.n, np.float64)
    pts = np.stack([p0, p0 - e1, p0 + e2], 1)
    return p0, e1, e2, n, pts.min(1), pts.max(1), pts.mean(1)


@pytest.fixture(scope="module", params=["sweep", "binned"])
def built(request):
    rng = np.random.default_rng(7)
    p0, e1, e2, n, lo, hi, centers = _soup_np(rng)
    build = (gb.build_sweep_sah if request.param == "sweep"
             else gb.build_binned_sah)
    return build(lo, hi, centers), (p0, e1, e2, n)


def test_structure_valid(built):
    bvh, _ = built
    gb.validate(bvh)


def test_sah_cost_reasonable(built):
    bvh, _ = built
    cost = gb.sah_cost(bvh)
    assert np.isfinite(cost) and 1.0 < cost < 1000.0


def test_traversal_matches_bruteforce(built, rng):
    bvh, (p0, e1, e2, n) = built
    from ceres_tpu.utils.golden import intersect_all

    R = 120
    origins = np.zeros((R, 3)) + np.array([0, 0, -4.0])
    dirs = rng.standard_normal((R, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t_b, u_b, v_b, id_b, hit_b = intersect_all(origins, dirs, p0, e1, e2, n)
    t_t, u_t, v_t, id_t, hit_t = gb.traverse_closest(
        bvh, p0, e1, e2, n, origins, dirs)
    np.testing.assert_array_equal(hit_b, hit_t)
    np.testing.assert_allclose(t_t[hit_b], t_b[hit_b], rtol=1e-12)
    np.testing.assert_array_equal(id_t[hit_b], id_b[hit_b])


def test_layout_optimizer_preserves_tree(built, rng):
    bvh, (p0, e1, e2, n) = built
    opt = gb.optimize_node_layout(bvh)
    gb.validate(opt)
    assert np.isclose(gb.sah_cost(opt), gb.sah_cost(bvh))
    # Same closest hits after reordering.
    R = 40
    origins = np.zeros((R, 3)) + np.array([0, 0, -4.0])
    dirs = rng.standard_normal((R, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    a = gb.traverse_closest(bvh, p0, e1, e2, n, origins, dirs)
    b = gb.traverse_closest(opt, p0, e1, e2, n, origins, dirs)
    np.testing.assert_array_equal(a[3], b[3])
    # Optimizer goal: pair area is non-increasing in memory order
    # (node_layout_optimizer.hpp:12-15).
    lo = opt.bounds[:, 0::2]; hi = opt.bounds[:, 1::2]
    areas = gb._half_area(lo, hi)
    inner = np.where(opt.prim_count == 0)[0]
    pf = opt.first_child[inner].astype(np.int64)
    pair_area = areas[pf] + areas[pf + 1]
    order = np.argsort(pf)
    assert (np.diff(pair_area[order]) <= 1e-5).all()


def test_sweep_not_worse_than_binned():
    rng = np.random.default_rng(11)
    _, _, _, _, lo, hi, centers = _soup_np(rng, V=100, F=300)
    sweep = gb.sah_cost(gb.build_sweep_sah(lo, hi, centers))
    binned = gb.sah_cost(gb.build_binned_sah(lo, hi, centers))
    assert sweep <= binned * 1.05  # exact sweep should win (small slack)
