"""Primitive-sharded rendering (the TP-analog): geometry split over chips.

SURVEY.md §2 parallelism table / BASELINE north star: "mesh geometry
replicated or primitive-sharded" — each chip intersects the full ray
wavefront against its triangle shard; closest hits combine with an
all-reduce-min on distance, occlusion ORs, the winning shard shades.
"""

import numpy as np
import pytest

from ceres_tpu.render.renderer import RenderConfig, render
from ceres_tpu.render import scenes
from ceres_tpu.parallel.sharded import render_primitive_sharded


@pytest.mark.parametrize("backend", ["bruteforce", "megakernel"])
@pytest.mark.parametrize("mode", ["smooth", "flat"])
def test_matches_single_device(bunny, backend, mode):
    scene = scenes.bunny_scene()
    W = H = 48
    cfg = RenderConfig(width=W, height=H, mode=mode, backend=backend)
    ref, ref_stats = render(scene.vertices, scene.faces, scene.camera,
                            scene.sun, config=cfg)
    img, stats = render_primitive_sharded(scene.vertices, scene.faces,
                                          scene.camera, scene.sun, config=cfg)
    ref = np.asarray(ref)
    img = np.asarray(img)
    assert img.shape == ref.shape
    # Same image up to exact-distance tie-breaks at silhouette pixels.
    diff = np.abs(img - ref).max(axis=-1)
    assert (diff > 2e-3).mean() <= 0.01
    assert abs(int(stats["primary_hits"])
               - int(ref_stats["primary_hits"])) <= 0.01 * W * H


def test_no_shadow_mode(bunny):
    scene = scenes.bunny_scene()
    cfg = RenderConfig(width=32, height=32, mode="flat",
                       backend="bruteforce", shadows=False)
    ref, _ = render(scene.vertices, scene.faces, scene.camera, scene.sun,
                    config=cfg)
    img, _ = render_primitive_sharded(scene.vertices, scene.faces,
                                      scene.camera, scene.sun, config=cfg)
    diff = np.abs(np.asarray(img) - np.asarray(ref)).max(axis=-1)
    assert (diff > 2e-3).mean() <= 0.01


def test_each_shard_owns_a_slice(bunny):
    # With 8 shards of the bunny each holding 621 faces, every shard must
    # contribute winners somewhere: the summed image differs from any
    # single-shard render (smoke check the combine actually spans shards).
    scene = scenes.bunny_scene()
    cfg = RenderConfig(width=32, height=32, mode="flat",
                       backend="bruteforce")
    img, stats = render_primitive_sharded(scene.vertices, scene.faces,
                                          scene.camera, scene.sun, config=cfg)
    assert int(stats["primary_hits"]) > 0
    assert float(np.asarray(img).max()) > 0.1
