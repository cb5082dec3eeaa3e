"""Quality builders wired into the device path (SURVEY §2.2 builder set).

Each builder's tree — SweepSAH / BinnedSAH / SBVH FlatBvh and the PLOC
tree — is cut into a ClusterSet and fed to the SAME megakernel walk; the
render must match the default LBVH-treelet clusters (identical hit masks,
matching pixels up to near-tie winner flips at shared edges).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ceres_tpu.accel import cuts, golden_builders as gb, ploc
from ceres_tpu.accel import clusters as cl
from ceres_tpu.models.mesh import triangle_soup
from ceres_tpu.render.renderer import RenderConfig, render_pipeline
from ceres_tpu.render import scenes


def _tri_bounds(soup):
    p0 = np.asarray(soup.p0)
    p1 = p0 - np.asarray(soup.e1)
    p2 = np.asarray(soup.e2) + p0
    pts = np.stack([p0, p1, p2], 1)
    return pts.min(1), pts.max(1), pts.mean(1)


def _build_clusters(kind, soup):
    lo, hi, centers = _tri_bounds(soup)
    if kind == "sweep":
        return cuts.clusters_from_flatbvh(soup, gb.build_sweep_sah(lo, hi, centers))
    if kind == "binned":
        return cuts.clusters_from_flatbvh(soup, gb.build_binned_sah(lo, hi, centers))
    if kind == "sbvh":
        from ceres_tpu.accel.sbvh import build_sbvh

        p0 = np.asarray(soup.p0)
        bvh = build_sbvh(p0, p0 - np.asarray(soup.e1),
                         np.asarray(soup.e2) + p0)
        return cuts.clusters_from_flatbvh(soup, bvh)
    if kind == "ploc":
        return cuts.clusters_from_ploc(soup, ploc.build_ploc(soup))
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["sweep", "binned", "sbvh", "ploc"])
def test_cut_clusters_render_equivalent(bunny, kind):
    scene = scenes.bunny_scene()
    soup = triangle_soup(jnp.asarray(scene.vertices),
                         jnp.asarray(scene.faces), with_normals=True)
    cs = _build_clusters(kind, soup)
    # Structure sanity: every triangle appears at least once; boxes contain
    # their member triangles.
    perm = np.asarray(cs.perm)
    present = np.unique(perm[perm >= 0])
    assert present.size == scene.faces.shape[0]

    cfg = RenderConfig(width=48, height=48, mode="smooth",
                       backend="megakernel")
    ref, ref_stats = render_pipeline(jnp.asarray(scene.vertices),
                                     jnp.asarray(scene.faces), scene.camera,
                                     jnp.asarray(scene.sun), cfg)
    img, stats = render_pipeline(jnp.asarray(scene.vertices),
                                 jnp.asarray(scene.faces), scene.camera,
                                 jnp.asarray(scene.sun), cfg, clusters=cs)
    ref = np.asarray(ref)
    img = np.asarray(img)
    # Same visibility everywhere; same shading up to near-tie winner flips
    # (different cluster slot order breaks exact ties differently).
    assert int(stats["primary_hits"]) == int(ref_stats["primary_hits"])
    diff = np.abs(img - ref).max(axis=-1)
    assert (diff <= 1e-4).mean() >= 0.999, f"{(diff > 1e-4).mean():.4%} off"


def test_cut_quality_not_absurd(bunny):
    """A SweepSAH cut must not schedule wildly more work than the LBVH cut
    (sanity on box tightness; the real comparison is the checked-in
    builder-quality benchmark table)."""
    from ceres_tpu.models.camera import camera_rays
    from ceres_tpu.ops import megakernel as mk
    from ceres_tpu.utils import tiling

    scene = scenes.bunny_scene()
    soup = triangle_soup(jnp.asarray(scene.vertices),
                         jnp.asarray(scene.faces), with_normals=False)
    dirs = tiling.swizzle(camera_rays(scene.camera, 64, 64))
    dirs_tiled = tuple(mk._tile_rays(dirs[:, a], mk.TILE) for a in range(3))

    def scheduled(cs):
        _, counts = mk._tile_candidate_keys(
            cs.lo - scene.camera.eye, cs.hi - scene.camera.eye, dirs_tiled)
        return int(np.asarray(counts).sum())

    lbvh_cut = cl.build_clusters_treelet(soup)
    sweep_cut = _build_clusters("sweep", soup)
    assert scheduled(sweep_cut) <= 2 * scheduled(lbvh_cut)


def test_frames_sharded_quality_clusters_match(bunny):
    """render_frames_sharded with prebuilt quality clusters must match
    the default in-graph treelet build (same scene, frame 0)."""
    import numpy as np

    from ceres_tpu.accel.cuts import build_clusters_quality
    from ceres_tpu.parallel.sharded import (render_frames_sharded,
                                            turntable_transforms)

    scene = scenes.bunny_scene()
    cfg = RenderConfig(width=64, height=64, mode="smooth",
                       backend="megakernel")
    tfs = turntable_transforms(2)
    ref, ref_stats = render_frames_sharded(scene.vertices, scene.faces,
                                           scene.camera, scene.sun, tfs,
                                           config=cfg)
    cs = build_clusters_quality(
        triangle_soup(jnp.asarray(scene.vertices),
                      jnp.asarray(scene.faces), with_normals=False))
    img, stats = render_frames_sharded(scene.vertices, scene.faces,
                                       scene.camera, scene.sun, tfs,
                                       config=cfg, clusters=cs)
    assert int(stats["primary_hits"]) == int(ref_stats["primary_hits"])
    # Same visibility; shading equal up to near-tie winner flips.
    diff = np.abs(np.asarray(img) - np.asarray(ref)).max(axis=-1)
    assert (diff <= 1e-4).mean() >= 0.999


def test_quality_cut_two_level_walk_matches(bunny, monkeypatch):
    """The two-level walk over a QUALITY cut's tree-derived supers
    (clusters_from_flatbvh's second cut) must match the flat walk."""
    import numpy as np

    from ceres_tpu.accel.cuts import build_clusters_quality
    from ceres_tpu.ops import megakernel as mk

    scene = scenes.bunny_scene()
    soup = triangle_soup(jnp.asarray(scene.vertices),
                         jnp.asarray(scene.faces), with_normals=False)
    cs = build_clusters_quality(soup, builder="binned")
    assert cs.super_first is not None and cs.super_S > 1
    eye = jnp.asarray(scene.camera.eye)
    rng = np.random.default_rng(3)
    d = rng.standard_normal((600, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    flat = mk.closest_hit_common_origin(soup, eye, d, clusters=cs)
    monkeypatch.setattr(mk, "_HIER_MIN_CLUSTERS", 1)
    hier = mk.closest_hit_common_origin(soup, eye, d, clusters=cs)
    np.testing.assert_array_equal(np.asarray(flat.mask),
                                  np.asarray(hier.mask))
    m = np.asarray(flat.mask)
    assert (np.asarray(flat.prim_id)[m]
            == np.asarray(hier.prim_id)[m]).mean() > 0.99
