"""Cost of the closest-hit winner-gather epilogue at scene scale.

Times the detached winner SEARCH (megakernel._closest_search) against
the full closest_hit_common_origin on the LEVELS-subdivided bunny; the
difference is the winner-table build + row gather + recompute epilogue,
which scales with N_c * C (the table is rebuilt per call — loop-
invariant for static geometry but XLA does not hoist it out of frame
loops on its own).
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
    return best / REPS * 1e3


def main():
    verts, faces = load_obj(os.path.join(data_dir(), "bunny.obj"))
    if LEVELS:
        verts, faces = subdivide(verts, faces, LEVELS)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    cam = Camera.make(eye=eye, dir=verts.mean(axis=0) - eye, up=(0, 1, 0),
                      fov=60.0)
    W, H = 1920, 1080
    vj, fj = jnp.asarray(verts), jnp.asarray(faces)
    soup = triangle_soup(vj, fj, with_normals=False)
    cs = jax.jit(build_clusters_treelet)(soup)
    jax.block_until_ready(cs.lo)
    planes = camera_ray_columns(cam, W, H)
    dir_cols = tuple(tiling.swizzle_plane(p) for p in planes)

    @functools.partial(jax.jit, static_argnames="k")
    def search_k(d0, k):
        def body(i, acc):
            pidx, _ = mk._closest_search(
                cs, jnp.asarray(eye), (d0 + i * 1e-9, dir_cols[1],
                                       dir_cols[2]))
            return acc + jnp.sum(pidx)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0)).astype(
            jnp.float32)

    @functools.partial(jax.jit, static_argnames="k")
    def full_k(d0, k):
        def body(i, acc):
            hit = mk.closest_hit_common_origin(
                soup, jnp.asarray(eye), (d0 + i * 1e-9, dir_cols[1],
                                         dir_cols[2]), clusters=cs)
            return acc + jnp.sum(jnp.where(hit.mask, hit.t, 0.0))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    ms_search = timed(search_k, dir_cols[0], REPS)
    ms_full = timed(full_k, dir_cols[0], REPS)
    line = {"levels": LEVELS, "triangles": int(fj.shape[0]),
            "clusters": int(cs.num_clusters),
            "search_ms": round(ms_search, 2),
            "full_ms": round(ms_full, 2),
            "epilogue_ms": round(ms_full - ms_search, 2)}
    print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
