"""Sharded rendering on the 8-device virtual CPU mesh (SURVEY.md §4 item 5).

Equivalence: sharded render == single-device render, stats identical;
gradients of replicated params arrive psum'd and match single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ceres_tpu.models.camera import Camera
from ceres_tpu.parallel.sharded import (
    device_mesh, render_sharded, render_frames_sharded, turntable_transforms)
from ceres_tpu.render.renderer import RenderConfig, render


@pytest.fixture(scope="module")
def quad_scene():
    verts = np.asarray([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                       np.float32)
    faces = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    camera = Camera.make(eye=(0, 0, 0), dir=(0, 0, 1), up=(0, 1, 0), fov=70.0)
    sun = np.asarray([3.0, 4.0, -2.0], np.float32)
    return verts, faces, camera, sun


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single(quad_scene):
    verts, faces, camera, sun = quad_scene
    kw = dict(width=64, height=48, mode="smooth", backend="bruteforce")
    img1, stats1 = render(verts, faces, camera, sun, **kw)
    mesh = device_mesh()
    img8, stats8 = render_sharded(verts, faces, camera, sun, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                               rtol=1e-5, atol=1e-6)
    assert int(stats8["hits"]) == int(stats1["hits"])
    assert int(stats8["rays"]) == int(stats1["rays"])


def test_sharded_gradients_match_single(quad_scene):
    verts, faces, camera, sun = quad_scene
    kw = dict(width=64, height=48, mode="smooth", backend="bruteforce")
    mesh = device_mesh()

    def loss1(v):
        img, _ = render(v, faces, camera, sun, **kw)
        return jnp.sum(img ** 2)

    def loss8(v):
        img, _ = render_sharded(v, faces, camera, sun, mesh=mesh, **kw)
        return jnp.sum(img ** 2)

    g1 = np.asarray(jax.grad(loss1)(jnp.asarray(verts)))
    g8 = np.asarray(jax.grad(loss8)(jnp.asarray(verts)))
    # atol scaled to the gradient magnitude: f32 psum/reduction-order noise.
    np.testing.assert_allclose(g8, g1, rtol=1e-4,
                               atol=1e-6 * np.abs(g1).max())


def test_frames_sharded_turntable(quad_scene):
    verts, faces, camera, sun = quad_scene
    mesh = device_mesh(num_frames_axis=2)
    tracks = turntable_transforms(4)
    frames, stats = render_frames_sharded(
        verts, faces, camera, sun, tracks, mesh=mesh,
        width=32, height=24, mode="smooth", backend="bruteforce")
    assert frames.shape == (4, 24, 32, 3)
    # Frame 0 is the identity transform: must equal the static render.
    img0, _ = render(verts, faces, camera, sun, width=32, height=24,
                     mode="smooth", backend="bruteforce")
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(img0),
                               rtol=1e-5, atol=1e-6)


def test_sharded_megakernel_matches_single(quad_scene):
    """Megakernel x shard_map equivalence (rays axis): the Pallas walk
    (interpret mode on CPU) inside a sharded shard, against the
    single-device megakernel render."""
    verts, faces, camera, sun = quad_scene
    kw = dict(width=64, height=48, mode="smooth", backend="megakernel")
    img1, stats1 = render(verts, faces, camera, sun, **kw)
    mesh = device_mesh()
    img8, stats8 = render_sharded(verts, faces, camera, sun, mesh=mesh, **kw)
    d = np.abs(np.asarray(img8) - np.asarray(img1)).max(axis=-1)
    # Row-sharded tiling regroups rays into different 512-ray tiles, so
    # winner tie-breaks at silhouette pixels may flip; interiors match.
    assert (d > 1e-3).mean() < 1e-2
    assert int(stats8["rays"]) == int(stats1["rays"])


def test_frames_sharded_megakernel_turntable(quad_scene):
    """Megakernel backend through render_frames_sharded on the
    (frames=2, rays=4) mesh — the full animation fast path (prebuilt
    clusters reused across the frame loop) with the Pallas walk."""
    verts, faces, camera, sun = quad_scene
    mesh = device_mesh(num_frames_axis=2)
    tracks = turntable_transforms(4)
    frames, stats = render_frames_sharded(
        verts, faces, camera, sun, tracks, mesh=mesh,
        width=32, height=24, mode="smooth", backend="megakernel")
    assert frames.shape == (4, 24, 32, 3)
    img0, _ = render(verts, faces, camera, sun, width=32, height=24,
                     mode="smooth", backend="megakernel")
    d = np.abs(np.asarray(frames[0]) - np.asarray(img0)).max(axis=-1)
    assert (d > 1e-3).mean() < 1e-2


def test_frames_match_serial_rotation(quad_scene):
    """Frame k of the batched turntable == serially transformed render
    (the anim.cpp:82-125 loop done one frame at a time)."""
    verts, faces, camera, sun = quad_scene
    mesh = device_mesh(num_frames_axis=2)
    tracks = turntable_transforms(2)
    frames, _ = render_frames_sharded(
        verts, faces, camera, sun, tracks, mesh=mesh,
        width=32, height=24, mode="smooth", backend="bruteforce")
    tf1 = jax.tree.map(lambda x: x[1], tracks)
    cam1 = Camera(eye=tf1(camera.eye), dir=tf1.a @ camera.dir,
                  up=camera.up, fov=camera.fov)
    img1, _ = render(verts, faces, cam1, tf1(jnp.asarray(sun)),
                     width=32, height=24, mode="smooth", backend="bruteforce")
    np.testing.assert_allclose(np.asarray(frames[1]), np.asarray(img1),
                               rtol=1e-5, atol=1e-6)
