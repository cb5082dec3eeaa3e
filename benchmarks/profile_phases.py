"""Phase-level timing of the bunny 1080p frame on the real chip.

Times each pipeline phase with the same in-graph fori_loop methodology as
bench.py (remote-tunnel-safe), so we know where a frame's time actually
goes before optimizing. Writes benchmarks/phase_profile.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ceres_tpu.io.obj import load_obj
from ceres_tpu.models.camera import Camera, camera_rays
from ceres_tpu.models.mesh import triangle_soup
from ceres_tpu.render.renderer import RenderConfig, render_pipeline
from ceres_tpu.utils import tiling

REPS = 10


def timeit(fn, *args):
    fn(*args).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bunny.obj")
    scene = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    path = path.replace("bunny", scene)
    verts, faces = load_obj(path)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    if scene == "dragon":
        # The SWEEP's config-3 camera (run_all.py dragon config, ~3.5M
        # hits) — the frame actually being optimized, not a far view.
        eye = np.asarray([0.0, 2.0, -8.0], np.float32)
    direction = verts.mean(axis=0) - eye
    camera = Camera.make(eye=eye, dir=direction, up=(0, 1, 0), fov=60.0)
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, mode="smooth",
                          backend="megakernel")
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)

    soup = triangle_soup(vj, fj, with_normals=True)
    dirs = tiling.swizzle(camera_rays(camera, W, H))

    from ceres_tpu.accel import clusters as cl
    from ceres_tpu.ops import megakernel as mk

    results = {}

    @jax.jit
    def full_frame(v):
        # Clusters hoisted out of the frame loop (the reference builds its
        # BVH before the loop, anim.cpp:62-66) — same as bench.py.
        cs0 = cl.build_clusters_treelet(
            triangle_soup(v, fj, with_normals=False))

        def body(i, acc):
            image, _ = render_pipeline(v, fj, camera, sun + i * 1e-3,
                                       config, clusters=cs0)
            return acc + image.sum()
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    results["full_frame"] = timeit(full_frame, vj)

    @jax.jit
    def build_only(v):
        def body(i, acc):
            s = triangle_soup(v + i * 1e-6, fj, with_normals=True)
            cs = cl.build_clusters_treelet(s)
            return acc + jnp.sum(cs.lo) + jnp.sum(cs.p0[0])
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    results["cluster_build"] = timeit(build_only, vj)

    cs = jax.jit(cl.build_clusters_treelet)(soup)

    @jax.jit
    def prepass_only(d):
        def body(i, acc):
            dc = (d[:, 0] + i * 1e-7, d[:, 1], d[:, 2])
            dp = tuple(mk._pad_rays(c) for c in dc)
            dirs_tiled = tuple(c.reshape(-1, mk.TILE) for c in dp)
            lists, entry, counts = mk._tile_cluster_lists(
                cs.lo - camera.eye, cs.hi - camera.eye, dirs_tiled)
            return acc + jnp.sum(counts) + jnp.sum(entry[0])
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    results["cull_prepass_primary"] = timeit(prepass_only, dirs)

    @jax.jit
    def closest_only(d):
        def body(i, acc):
            hit = mk.closest_hit_common_origin(soup, camera.eye, d + i * 1e-7,
                                               clusters=cs)
            return acc + jnp.sum(jnp.where(hit.mask, hit.t, 0.0))
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    results["closest_hit_total"] = timeit(closest_only, dirs)

    hit = jax.jit(functools.partial(
        mk.closest_hit_common_origin))(soup, camera.eye, dirs, clusters=cs)
    t_safe = jnp.where(hit.mask, hit.t, 0.0)
    point = camera.eye + t_safe[:, None] * dirs
    n = soup.n[jnp.where(hit.mask, hit.prim_id, 0)]
    point = point + -1e-5 * n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    sun_line = (sun - point)
    sun_line = sun_line / jnp.linalg.norm(sun_line, axis=-1, keepdims=True)

    @jax.jit
    def shadow_only(p):
        # The DEFAULT shadow path: common-destination segment test from
        # the sun (renderer.py non-compat branch).
        def body(i, acc):
            occ = mk.any_hit_to_point(soup, sun + i * 1e-3, p,
                                      skip=~hit.mask, clusters=cs)
            return acc + jnp.sum(occ)
        return jax.lax.fori_loop(0, REPS, body, 0)

    results["shadow_any_dest_total"] = timeit(shadow_only, point)

    @jax.jit
    def any_only(p, s):
        # The compat-mode generic-ray occlusion (tmax = inf).
        center = jnp.mean(soup.p0, axis=0)
        def body(i, acc):
            occ = mk.any_hit(soup, center, p + i * 1e-7, s, skip=~hit.mask,
                             clusters=cs)
            return acc + jnp.sum(occ)
        return jax.lax.fori_loop(0, REPS, body, 0)

    results["any_hit_generic_total"] = timeit(any_only, point, sun_line)

    n_tiles = dirs.shape[0] // mk.TILE
    results["meta"] = {
        "scene": scene, "tris": int(faces.shape[0]),
        "clusters": int(cs.num_clusters), "n_tiles": int(n_tiles),
        "reps": REPS,
    }
    for k, v in results.items():
        if k != "meta":
            print(f"{k:28s} {v*1e3:8.2f} ms")
    print(results["meta"])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"phase_profile_{scene}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
