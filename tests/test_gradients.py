"""Differentiable-mode tests: analytic gradients vs finite differences.

SURVEY.md §4 item 4 / BASELINE config 4: pixel-value gradients w.r.t.
vertex positions and camera parameters must match central finite
differences. Visibility is detached (standard differentiable-rasterization
convention), so FD probes are compared only on an *interior* pixel mask —
pixels whose neighborhood is fully hit in the unperturbed render — where
no visibility flip can contaminate the FD quotient. The loss is a sum (not
mean) over masked pixels so FD signals stay well above f32 rounding.

Note the face winding: the reference offsets shadow-ray origins by
-1e-5 * normalize(n) with its left-handed normal n = cross(p0-p1, p2-p0)
(render.hpp:131-133), which assumes standard CCW OBJ winding (normals come
out *inward*; the offset then moves outward). Test meshes must follow the
same convention or every surface self-shadows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ceres_tpu.models.camera import Camera
from ceres_tpu.render.renderer import render
from ceres_tpu.diff.inverse import fit_vertices


@pytest.fixture(scope="module")
def quad_scene():
    verts = np.asarray([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                       np.float32)
    # CCW-as-seen-from-camera winding flipped so the reference-convention
    # normal points away from the camera (see module docstring).
    faces = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    camera = Camera.make(eye=(0, 0, 0), dir=(0, 0, 1), up=(0, 1, 0), fov=70.0)
    sun = np.asarray([3.0, 4.0, -2.0], np.float32)
    return verts, faces, camera, sun


def _interior_mask(img):
    """Pixels whose 3x3 neighborhood is entirely lit (non-black)."""
    hit = np.asarray(img).max(axis=-1) > 0
    m = hit.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            m &= np.roll(np.roll(hit, dy, 0), dx, 1)
    m[0, :] = m[-1, :] = False
    m[:, 0] = m[:, -1] = False
    return m


def _fd_grad(f, x, eps):
    x = np.asarray(x, np.float32)
    g = np.zeros(x.shape, np.float64)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        g[idx] = (float(f(xp)) - float(f(xm))) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize("backend", ["bruteforce", "megakernel"])
def test_vertex_grads_match_fd(quad_scene, backend):
    verts, faces, camera, sun = quad_scene
    kw = dict(width=24, height=16, mode="smooth", backend=backend)
    base, _ = render(verts, faces, camera, sun, **kw)
    mask = _interior_mask(base)
    assert mask.sum() > 20
    w = jnp.asarray(mask[:, :, None].astype(np.float32))

    def loss(v):
        img, _ = render(v, faces, camera, sun, **kw)
        return jnp.sum(img * w)

    g = np.asarray(jax.grad(loss)(jnp.asarray(verts)))
    g_fd = _fd_grad(loss, verts, eps=1e-2)
    np.testing.assert_allclose(g, g_fd, rtol=0.05,
                               atol=0.02 * np.abs(g_fd).max())


def test_camera_eye_grads_match_fd(quad_scene):
    verts, faces, camera, sun = quad_scene
    kw = dict(width=24, height=16, mode="smooth", backend="megakernel")
    base, _ = render(verts, faces, camera, sun, **kw)
    mask = _interior_mask(base)
    w = jnp.asarray(mask[:, :, None].astype(np.float32))

    def loss_eye(eye):
        cam = Camera(eye=jnp.asarray(eye, jnp.float32), dir=camera.dir,
                     up=camera.up, fov=camera.fov)
        img, _ = render(verts, faces, cam, sun, **kw)
        return jnp.sum(img * w)

    g = np.asarray(jax.grad(loss_eye)(jnp.asarray(camera.eye)))
    g_fd = _fd_grad(loss_eye, np.asarray(camera.eye), eps=5e-3)
    np.testing.assert_allclose(g, g_fd, rtol=0.05,
                               atol=0.02 * np.abs(g_fd).max())


def test_fov_grads_match_fd(quad_scene):
    verts, faces, camera, sun = quad_scene
    kw = dict(width=24, height=16, mode="smooth", backend="bruteforce")
    base, _ = render(verts, faces, camera, sun, **kw)
    mask = _interior_mask(base)
    w = jnp.asarray(mask[:, :, None].astype(np.float32))

    def loss_fov(fov):
        cam = Camera(eye=camera.eye, dir=camera.dir, up=camera.up,
                     fov=jnp.asarray(fov, jnp.float32).reshape(()))
        img, _ = render(verts, faces, cam, sun, **kw)
        return jnp.sum(img * w)

    g = float(jax.grad(loss_fov)(jnp.float32(70.0)))
    g_fd = float(_fd_grad(loss_fov, np.float32(70.0).reshape(()), eps=2e-2))
    np.testing.assert_allclose(g, g_fd, rtol=0.05)


def test_sun_grads_match_fd(quad_scene):
    verts, faces, camera, sun = quad_scene
    kw = dict(width=24, height=16, mode="smooth", backend="bruteforce")
    base, _ = render(verts, faces, camera, sun, **kw)
    w = jnp.asarray(_interior_mask(base)[:, :, None].astype(np.float32))

    def loss_sun(s):
        img, _ = render(verts, faces, camera, jnp.asarray(s, jnp.float32),
                        **kw)
        return jnp.sum(img * w)

    g = np.asarray(jax.grad(loss_sun)(jnp.asarray(sun)))
    g_fd = _fd_grad(loss_sun, sun, eps=1e-2)
    np.testing.assert_allclose(g, g_fd, rtol=0.05,
                               atol=0.02 * np.abs(g_fd).max())


def test_inverse_rendering_reduces_loss(quad_scene):
    """Perturb the quad, fit vertices back toward the target render."""
    verts, faces, camera, sun = quad_scene
    kw = dict(width=32, height=24, mode="smooth", backend="bruteforce")
    target, tstats = render(verts, faces, camera, sun, **kw)
    assert float(jnp.sum(target)) > 1.0  # scene must actually be lit

    rng = np.random.default_rng(1)
    noisy = verts + 0.05 * rng.standard_normal(verts.shape).astype(np.float32)
    from ceres_tpu.render.renderer import RenderConfig

    params, history = fit_vertices(
        noisy, faces, camera, sun, np.asarray(target),
        config=RenderConfig(width=32, height=24, mode="smooth",
                            backend="bruteforce"),
        steps=150, learning_rate=2e-3)
    # Photometric loss must drop substantially. (Vertex recovery itself is
    # ill-posed from a single view with detached silhouettes, so only the
    # image-space objective is asserted.)
    assert history[-1] < history[0] * 0.5, history[::15]
