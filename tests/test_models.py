"""Camera, transform, mesh and shading math vs independent NumPy references."""

import jax.numpy as jnp
import numpy as np

from ceres_tpu.models.camera import Camera, camera_rays
from ceres_tpu.models.mesh import triangle_soup, vertex_normals
from ceres_tpu.models.transform import Transform, rotate_vertices_about_axis
from ceres_tpu.models import shading
from ceres_tpu.utils import golden


def test_camera_rays_match_reference_formula():
    cam = Camera.make(eye=(0.0, -15.0, 2.0), dir=(0, 1, 0), up=(0, 0, 1), fov=60.0)
    W, H = 16, 8
    rays = np.asarray(camera_rays(cam, W, H))
    assert rays.shape == (H, W, 3)

    d = golden.normalize(np.array([0.0, 1.0, 0.0]))
    image_w = np.tan(60.0 * (3.14159265 / 180.0 * 0.5))
    iu = golden.normalize(np.cross(d, [0, 0, 1])) * image_w
    iv = golden.normalize(np.cross(np.cross(d, [0, 0, 1]), d)) * image_w * (H / W)
    for i, j in [(0, 0), (5, 3), (15, 7)]:
        u = 2 * (i + 0.5) / W - 1
        v = 2 * (j + 0.5) / H - 1
        expect = golden.normalize(u * iu + v * iv + d)
        np.testing.assert_allclose(rays[j, i], expect, atol=1e-6)


def test_camera_rays_normalized():
    cam = Camera.make(eye=(1.0, 2.0, 3.0), dir=(0.3, -0.2, 0.9), up=(0, 1, 0), fov=45.0)
    rays = np.asarray(camera_rays(cam, 32, 17))
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-6)


def test_transform_rotate_matches_markley_dcm():
    # transform.hpp:68-107: a_new = a_old @ mat, translation untouched,
    # with the Markley DCM (transpose of the active Rodrigues matrix).
    t = Transform.identity().rotate((0, 0, 1), np.pi / 2)
    p = np.array([1.0, 0.0, 0.0], np.float32)
    out = np.asarray(t(jnp.asarray(p)))
    # Markley DCM about z by +90deg maps x -> (0, -1, 0) (passive rotation).
    np.testing.assert_allclose(out, [0.0, -1.0, 0.0], atol=1e-6)


def test_transform_compose_scale_translate():
    t = Transform.identity().rotate((0, 1, 0), 0.3).scale(2.0).translate((1, 2, 3))
    p = jnp.array([0.5, -1.0, 0.25])
    # scale multiplies the matrix only; translate adds to v only.
    manual = 2.0 * (np.asarray(Transform.identity().rotate((0, 1, 0), 0.3)(p))) + np.array(
        [1, 2, 3]
    )
    np.testing.assert_allclose(np.asarray(t(p)), manual, atol=1e-6)


def test_rotate_vertices_matches_reference_axis_rotation():
    # render.hpp:24-44 rotation matrices per axis.
    v = np.random.default_rng(1).normal(size=(10, 3)).astype(np.float32)
    deg = 33.0
    rad = np.deg2rad(deg)
    c, s = np.cos(rad), np.sin(rad)
    # Axis Y (render.hpp:33): (x*c + z*s, y, -x*s + z*c)
    expect = np.stack(
        [v[:, 0] * c + v[:, 2] * s, v[:, 1], -v[:, 0] * s + v[:, 2] * c], axis=-1
    )
    out = np.asarray(rotate_vertices_about_axis(jnp.asarray(v), 1, deg))
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_triangle_soup_conventions(bunny):
    v, f = bunny
    soup = triangle_soup(jnp.asarray(v), jnp.asarray(f))
    p0 = v[f[:, 0]]
    p1 = v[f[:, 1]]
    p2 = v[f[:, 2]]
    np.testing.assert_allclose(np.asarray(soup.e1), p0 - p1, atol=1e-7)
    np.testing.assert_allclose(np.asarray(soup.e2), p2 - p0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(soup.n), np.cross(p0 - p1, p2 - p0), atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(soup.p1), p1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(soup.p2), p2, atol=1e-6)


def test_vertex_normals_area_weighted(bunny):
    v, f = bunny
    vn = np.asarray(vertex_normals(jnp.asarray(v), jnp.asarray(f)))
    # Independent accumulation.
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(p0 - p1, p2 - p0)
    acc = np.zeros_like(v)
    for k in range(3):
        np.add.at(acc, f[:, k], n)
    lens = np.linalg.norm(acc, axis=-1, keepdims=True)
    expect = acc / np.where(lens > 0, lens, 1.0)
    np.testing.assert_allclose(vn, expect, atol=1e-5)
    used = np.unique(f)
    np.testing.assert_allclose(np.linalg.norm(vn[used], axis=-1), 1.0, atol=1e-5)


def test_smooth_shading_matches_golden(rng):
    n = 64
    sun_line = golden.normalize(rng.normal(size=(n, 3)))
    view = golden.normalize(rng.normal(size=(n, 3)))
    corners = golden.normalize(rng.normal(size=(n, 3, 3)))
    u = rng.uniform(0, 1, size=n)
    v = rng.uniform(0, 1 - u)
    out = np.asarray(
        shading.smooth_shading(
            jnp.asarray(sun_line, jnp.float32),
            jnp.asarray(corners, jnp.float32),
            jnp.asarray(view, jnp.float32),
            jnp.asarray(u, jnp.float32),
            jnp.asarray(v, jnp.float32),
        )
    )
    # Golden corner loop (render.hpp:57-84) with the corrected true-
    # barycentric corner weights (w, u, v) — see ceres_tpu.models.shading.
    color = np.zeros((n, 3))
    weights = [1 - u - v, u, v]
    for k in range(3):
        nk = corners[:, k, :]
        diffuse = 0.5 * np.abs(np.sum(sun_line * nk, axis=-1))
        h = golden.normalize(sun_line - view)
        spec = 0.8 * np.sum(nk * h, axis=-1) ** 24
        rgb = np.clip(
            (0.2 + diffuse)[:, None] * np.array([0.5, 0.0, 0.8]) + spec[:, None], 0, 1
        )
        color += weights[k][:, None] * rgb
    np.testing.assert_allclose(out, color, atol=1e-4)
