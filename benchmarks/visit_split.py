"""Split the large-scene executed visits by wavefront (primary vs shadow).

LEVELS=n subdivided bunny at 1080p: reports each wavefront's measured
executed block visits and per-wavefront walk time, so the optimization
target (closest-hit boundary visits vs shadow segment scans) is data,
not guesswork.
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
from ceres_tpu.models.camera import Camera, camera_ray_columns
from ceres_tpu.models.mesh import subdivide, triangle_soup
from ceres_tpu.render.scenes import data_dir
from ceres_tpu.utils import tiling
from ceres_tpu.accel.clusters import build_clusters_treelet
from ceres_tpu.ops import megakernel as mk

LEVELS = int(os.environ.get("LEVELS", 4))
REPS = int(os.environ.get("REPS", 3))


def timed(fn, *args):
    float(fn(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    verts, faces = load_obj(os.path.join(data_dir(), "bunny.obj"))
    verts, faces = subdivide(verts, faces, LEVELS)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    cam = Camera.make(eye=eye, dir=verts.mean(axis=0) - eye, up=(0, 1, 0),
                      fov=60.0)
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    W, H = 1920, 1080
    vj, fj = jnp.asarray(verts), jnp.asarray(faces)

    soup = triangle_soup(vj, fj, with_normals=False)
    cs = jax.jit(build_clusters_treelet)(soup)
    jax.block_until_ready(cs.lo)
    planes = camera_ray_columns(cam, W, H)
    dir_cols = tuple(tiling.swizzle_plane(p) for p in planes)

    @jax.jit
    def closest_counts(d0):
        hit, cnts = mk.closest_hit_common_origin(
            soup, jnp.asarray(eye), (d0, dir_cols[1], dir_cols[2]),
            clusters=cs, with_counts=True)
        return cnts["mt_block_visits"], hit.mask, hit.t

    visits_c, mask, t = closest_counts(dir_cols[0])
    visits_c = int(visits_c)

    @functools.partial(jax.jit, static_argnames="k")
    def closest_k(d0, k):
        def body(i, acc):
            hit = mk.closest_hit_common_origin(
                soup, jnp.asarray(eye), (d0 + i * 1e-9, dir_cols[1],
                                         dir_cols[2]), clusters=cs)
            return acc + jnp.sum(jnp.where(hit.mask, hit.t, 0.0))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    ms_c = timed(closest_k, dir_cols[0], REPS) * 1e3

    # Shadow wavefront from the actual primary hit points.
    t_safe = jnp.where(mask, t, 0.0)
    point = tuple(eye[a] + t_safe * dir_cols[a] for a in range(3))

    @jax.jit
    def shadow_counts(p0):
        occ, cnts = mk.any_hit_to_point(
            soup, sun, (p0, point[1], point[2]), skip=~mask,
            clusters=cs, with_counts=True)
        return cnts["mt_block_visits"], jnp.sum(occ)

    visits_s, nocc = shadow_counts(point[0])
    visits_s = int(visits_s)

    @functools.partial(jax.jit, static_argnames="k")
    def shadow_k(p0, k):
        def body(i, acc):
            occ = mk.any_hit_to_point(
                soup, sun + i * 1e-6, (p0, point[1], point[2]),
                skip=~mask, clusters=cs)
            return acc + jnp.sum(occ)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0)).astype(
            jnp.float32)

    ms_s = timed(shadow_k, point[0], REPS) * 1e3

    line = {
        "levels": LEVELS, "triangles": int(fj.shape[0]),
        "closest_visits": visits_c, "closest_ms": round(ms_c, 2),
        "shadow_visits": visits_s, "shadow_ms": round(ms_s, 2),
        "primary_hits": int(jnp.sum(mask)), "occluded": int(nocc),
        "us_per_visit_closest": round(ms_c * 1e3 / max(visits_c, 1), 2),
        "us_per_visit_shadow": round(ms_s * 1e3 / max(visits_s, 1), 2),
    }
    print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
