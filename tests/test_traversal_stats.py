"""Traversal statistics counters (SingleRayTraverser::Statistics parity).

The reference has two stat mechanisms (SURVEY.md §3.5): the app-level
rays/hits counts (render.hpp:102-148) and the library's optional
traversal_steps/intersections counters (single_ray_traverser.hpp:131-163).
These tests cover the second one.
"""

import numpy as np

from ceres_tpu.render.renderer import RenderConfig, render
from ceres_tpu.render import scenes
from ceres_tpu.ops import megakernel as mk
from ceres_tpu.accel import clusters as cl


def _cfg(**kw):
    base = dict(width=64, height=64, mode="smooth", traversal_stats=True)
    base.update(kw)
    return RenderConfig(**base)


def test_megakernel_counters(bunny):
    scene = scenes.bunny_scene()
    _, stats = render(scene.vertices, scene.faces, scene.camera, scene.sun,
                      config=_cfg(backend="megakernel"))
    steps = int(stats["traversal_steps"])
    inters = int(stats["intersections"])
    assert steps > 0
    # Each kernel loop iteration evaluates one (tile, cluster) MT block.
    assert inters == steps * mk.TILE * cl.CLUSTER_SIZE
    # Culling must actually bite: far fewer visits than the dense cross
    # product of (primary + shadow tiles) x clusters.
    T = scene.faces.shape[0]
    n_clusters = -(-T // cl.CLUSTER_SIZE)
    n_tiles = -(-64 * 64 // mk.TILE)
    assert steps < 2 * n_tiles * n_clusters


def test_bruteforce_counters(bunny):
    scene = scenes.bunny_scene()
    W = H = 32
    _, stats = render(scene.vertices, scene.faces, scene.camera, scene.sun,
                      config=_cfg(width=W, height=H, backend="bruteforce"))
    T = scene.faces.shape[0]
    assert int(stats["traversal_steps"]) == 0
    assert int(stats["intersections"]) == 2 * W * H * T  # primary + shadow


def test_counters_off_by_default(bunny):
    scene = scenes.bunny_scene()
    _, stats = render(scene.vertices, scene.faces, scene.camera, scene.sun,
                      config=RenderConfig(width=16, height=16,
                                          backend="bruteforce"))
    assert "traversal_steps" not in stats


def test_no_shadow_counters(bunny):
    scene = scenes.bunny_scene()
    W = H = 32
    _, stats = render(scene.vertices, scene.faces, scene.camera, scene.sun,
                      config=_cfg(width=W, height=H, backend="bruteforce",
                                  shadows=False))
    T = scene.faces.shape[0]
    assert int(stats["intersections"]) == W * H * T
