"""Deforming-geometry animation: per-frame refit instead of rebuild.

The HierarchyRefitter capability (hierarchy_refitter.hpp:10-46) consumed
by a real render path: vertex tracks -> refit_clusters per frame. The
refit path must render the same images as a per-frame rebuild (boxes are
exact bounds either way; only the cut differs, so near-tie winner flips
at shared edges are the only allowed deviation).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ceres_tpu.accel import clusters as cl
from ceres_tpu.models.mesh import triangle_soup
from ceres_tpu.parallel.sharded import device_mesh, render_deforming_frames
from ceres_tpu.render import scenes
from ceres_tpu.render.renderer import RenderConfig


def _deformed_tracks(verts, n_frames=3):
    """A breathing bunny: per-frame radial scale about the centroid."""
    c = verts.mean(axis=0)
    scales = 1.0 + 0.15 * np.sin(np.linspace(0, np.pi, n_frames))
    return np.stack([(verts - c) * s + c for s in scales]).astype(np.float32)


def test_refit_boxes_bound_members(bunny):
    scene = scenes.bunny_scene()
    tracks = _deformed_tracks(scene.vertices)
    soup0 = triangle_soup(jnp.asarray(tracks[0]), jnp.asarray(scene.faces))
    cs0 = cl.build_clusters_treelet(soup0)
    soup2 = triangle_soup(jnp.asarray(tracks[2]), jnp.asarray(scene.faces))
    cs2 = cl.refit_clusters(cs0, soup2)
    assert np.array_equal(np.asarray(cs2.perm), np.asarray(cs0.perm))
    # Every member triangle's points are inside the refitted box.
    p0 = np.asarray(cs2.p0)
    p1 = p0 - np.asarray(cs2.e1)
    p2 = np.asarray(cs2.e2) + p0
    valid = (np.asarray(cs2.perm) >= 0).reshape(p0.shape[:2])
    lo = np.asarray(cs2.lo)[:, None, :]
    hi = np.asarray(cs2.hi)[:, None, :]
    eps = 1e-5
    for pts in (p0, p1, p2):
        ok = ((pts >= lo - eps) & (pts <= hi + eps)).all(-1) | ~valid
        assert ok.all()


def test_refit_matches_rebuild_render(bunny):
    scene = scenes.bunny_scene()
    tracks = jnp.asarray(_deformed_tracks(scene.vertices))
    cfg = RenderConfig(width=48, height=32, mode="smooth",
                       backend="megakernel")
    mesh = device_mesh()
    frames_refit, stats_r = render_deforming_frames(
        tracks, scene.faces, scene.camera, scene.sun, config=cfg, mesh=mesh,
        refit=True)
    frames_build, stats_b = render_deforming_frames(
        tracks, scene.faces, scene.camera, scene.sun, config=cfg, mesh=mesh,
        refit=False)
    a = np.asarray(frames_refit)
    b = np.asarray(frames_build)
    assert a.shape == b.shape == (3, 32, 48, 3)
    diff = np.abs(a - b).max(axis=-1)
    assert (diff <= 1e-4).mean() >= 0.999
    assert int(stats_r["hits"]) == int(stats_b["hits"])
    # The animation actually deforms: frames differ from each other.
    assert np.abs(a[0] - a[1]).max() > 1e-3
