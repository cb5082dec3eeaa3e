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
    visits = int(stats["mt_block_visits"])
    assert steps > 0
    # Counters are MEASURED in the kernel: per-ray slab gating means only
    # a subset of walked clusters pay an MT block, and each executed block
    # evaluates TILE x CLUSTER_SIZE pairs.
    assert 0 < visits <= steps
    assert inters == visits * mk.TILE * cl.CLUSTER_SIZE
    # Culling must actually bite: far fewer visits than the dense cross
    # product of (primary + shadow tiles) x clusters.
    T = scene.faces.shape[0]
    n_clusters = -(-T // cl.CLUSTER_SIZE)
    n_tiles = -(-64 * 64 // mk.TILE)
    assert steps < 2 * 2 * n_tiles * n_clusters


def test_early_exit_beats_schedule(bunny):
    """Measured kernel steps must undercut the scheduled walk bound: the
    prune (closest hit / root exit vs next entry) has to fire on a real
    scene — the reference's tmax-shrink pruning made observable
    (single_ray_traverser.hpp:59,95-113)."""
    import jax.numpy as jnp

    from ceres_tpu.models.camera import camera_rays
    from ceres_tpu.models.mesh import triangle_soup
    from ceres_tpu.utils import tiling

    scene = scenes.bunny_scene()
    soup = triangle_soup(scene.vertices, scene.faces, with_normals=False)
    cs = cl.build_clusters_treelet(soup)
    dirs = tiling.swizzle(camera_rays(scene.camera, 64, 64))
    _, counts = mk.closest_hit_common_origin(soup, scene.camera.eye, dirs,
                                             clusters=cs, with_counts=True)
    lists, entry, sched = mk._tile_cluster_lists(
        cs.lo - scene.camera.eye, cs.hi - scene.camera.eye,
        mk._tile_rays(dirs, mk.TILE))
    scheduled = int(jnp.sum(sched))
    assert int(counts["traversal_steps"]) <= scheduled
    assert int(counts["mt_block_visits"]) <= int(counts["traversal_steps"])


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
