"""Matmul Möller-Trumbore vs the independent golden oracle."""

import jax.numpy as jnp
import numpy as np

from ceres_tpu.models.mesh import soup_from_points
from ceres_tpu.ops import intersect as mt
from ceres_tpu.utils import golden


def _random_scene(rng, T=200, R=500, spread=1.0):
    p0 = rng.normal(size=(T, 3)) * spread
    p1 = p0 + rng.normal(size=(T, 3)) * 0.3
    p2 = p0 + rng.normal(size=(T, 3)) * 0.3
    origins = rng.normal(size=(R, 3)) * 2.0
    dirs = golden.normalize(rng.normal(size=(R, 3)))
    return p0, p1, p2, origins, dirs


def _compare_hits(ours, gold_t, gold_u, gold_v, gold_id, gold_mask, mismatch_budget=0.02):
    """Factored f32 vs direct f64 MT: allow a small budget of edge-case flips."""
    mask = np.asarray(ours.mask)
    agree = mask == gold_mask
    assert agree.mean() >= 1 - mismatch_budget, f"hit-mask agreement {agree.mean()}"
    both = mask & gold_mask & (np.asarray(ours.prim_id) == gold_id)
    # Where both hit the same triangle, t/u/v must match tightly.
    assert both.sum() > 0
    np.testing.assert_allclose(np.asarray(ours.t)[both], gold_t[both], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours.u)[both], gold_u[both], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours.v)[both], gold_v[both], rtol=1e-3, atol=2e-4)
    # Different winning triangle is only OK if the distances are nearly tied.
    diff_id = mask & gold_mask & ~both
    if diff_id.any():
        np.testing.assert_allclose(
            np.asarray(ours.t)[diff_id], gold_t[diff_id], rtol=1e-3, atol=1e-4
        )


def test_generic_form_vs_golden(rng):
    p0, p1, p2, origins, dirs = _random_scene(rng)
    soup = soup_from_points(*(jnp.asarray(x, jnp.float32) for x in (p0, p1, p2)))
    w = mt.triangle_weights(soup)
    f = mt.ray_features(jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32))
    ours = mt.closest_hit_bruteforce(f, w)
    e1, e2 = p0 - p1, p2 - p0
    n = np.cross(e1, e2)
    gold = golden.intersect_all(origins, dirs, p0, e1, e2, n)
    _compare_hits(ours, *gold)


def test_common_origin_form_vs_golden(rng):
    p0, p1, p2, _, dirs = _random_scene(rng)
    eye = np.array([0.5, -3.0, 1.0])
    soup = soup_from_points(*(jnp.asarray(x, jnp.float32) for x in (p0, p1, p2)))
    w = mt.triangle_weights_common_origin(soup, jnp.asarray(eye, jnp.float32))
    f = mt.ray_features_common_origin(jnp.asarray(dirs, jnp.float32))
    ours = mt.closest_hit_bruteforce(f, w)
    e1, e2 = p0 - p1, p2 - p0
    n = np.cross(e1, e2)
    origins = np.broadcast_to(eye, dirs.shape)
    gold = golden.intersect_all(origins, dirs, p0, e1, e2, n)
    _compare_hits(ours, *gold)


def test_any_hit_vs_golden(rng):
    p0, p1, p2, origins, dirs = _random_scene(rng)
    soup = soup_from_points(*(jnp.asarray(x, jnp.float32) for x in (p0, p1, p2)))
    w = mt.triangle_weights(soup)
    f = mt.ray_features(jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32))
    ours = np.asarray(mt.any_hit_bruteforce(f, w))
    e1, e2 = p0 - p1, p2 - p0
    gold = golden.any_hit(origins, dirs, p0, e1, e2, np.cross(e1, e2))
    assert (ours == gold).mean() >= 0.98


def test_tmin_tmax_window(rng):
    # One triangle straight ahead at t = 2.
    p0 = jnp.asarray([[-1.0, -1.0, 2.0]])
    p1 = jnp.asarray([[1.0, -1.0, 2.0]])
    p2 = jnp.asarray([[0.0, 2.0, 2.0]])
    soup = soup_from_points(p0, p1, p2)
    w = mt.triangle_weights(soup)
    f = mt.ray_features(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]))
    assert bool(mt.closest_hit_bruteforce(f, w).mask[0])
    assert not bool(mt.closest_hit_bruteforce(f, w, tmax=1.5).mask[0])
    assert not bool(mt.closest_hit_bruteforce(f, w, tmin=2.5).mask[0])
    hit = mt.closest_hit_bruteforce(f, w)
    np.testing.assert_allclose(float(hit.t[0]), 2.0, rtol=1e-5)


def test_degenerate_triangle_rejected():
    # Zero-area triangle: det = 0 -> NaN/inf math must reject, not crash
    # (triangle.hpp:106-108 NaN-safe comparisons).
    p = jnp.asarray([[0.0, 0.0, 1.0]])
    soup = soup_from_points(p, p, p)
    w = mt.triangle_weights(soup)
    f = mt.ray_features(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]))
    hit = mt.closest_hit_bruteforce(f, w)
    assert not bool(hit.mask[0])


def test_chunked_matches_unchunked(rng):
    p0, p1, p2, origins, dirs = _random_scene(rng, T=50, R=300)
    soup = soup_from_points(*(jnp.asarray(x, jnp.float32) for x in (p0, p1, p2)))
    w = mt.triangle_weights(soup)
    f = mt.ray_features(jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32))
    a = mt.closest_hit_bruteforce(f, w, chunk=64)
    b = mt.closest_hit_bruteforce(f, w, chunk=10_000)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_allclose(np.asarray(a.t)[np.asarray(a.mask)],
                               np.asarray(b.t)[np.asarray(b.mask)], rtol=1e-6)
