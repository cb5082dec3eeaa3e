"""Sub-phase decomposition of the TWO-LEVEL closest search at scale.

epilogue_probe.py put the 1.27M-tri closest SEARCH at ~220 ms against a
~134 ms walk floor (39.5k visits x 3.4 us); this isolates where the
other ~86 ms of prepass/setup goes: super interval entries, the per-tile
key sort, the member-box tensor build, hull scalars, tcap, and the walk
itself with every input precomputed.
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
from ceres_tpu.accel.clusters import (build_clusters_treelet,
                                      cluster_weights_common_origin_packed)
from ceres_tpu.ops import megakernel as mk

LEVELS = int(os.environ.get("LEVELS", 4))
REPS = int(os.environ.get("REPS", 5))


def timed(fn, *args):
    float(fn(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def loop(body):
    @jax.jit
    def run(*args):
        def b(i, acc):
            return acc + body(i, *args)
        return jax.lax.fori_loop(0, REPS, b, jnp.float32(0.0))
    return run


def main():
    verts, faces = load_obj(os.path.join(data_dir(), "bunny.obj"))
    verts, faces = subdivide(verts, faces, LEVELS)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    cam = Camera.make(eye=eye, dir=verts.mean(axis=0) - eye, up=(0, 1, 0),
                      fov=60.0)
    soup = triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)
    cs = jax.jit(build_clusters_treelet)(soup)
    jax.block_until_ready(cs.lo)
    planes = camera_ray_columns(cam, 1920, 1080)
    dir_cols = tuple(tiling.swizzle_plane(p) for p in planes)
    eye_j = jnp.asarray(eye)

    w = jax.jit(cluster_weights_common_origin_packed)(cs, eye_j)
    lo = cs.lo - eye_j
    hi = cs.hi - eye_j
    dp = tuple(mk._pad_rays(c) for c in dir_cols)
    dirs_tiled = tuple(c.reshape(-1, mk.TILE) for c in dp)
    alive = (dirs_tiled[0] ** 2 + dirs_tiled[1] ** 2
             + dirs_tiled[2] ** 2) > 0.0
    res = {}

    # Super-level setup (member boxes + hulls + union boxes).
    setup = loop(lambda i, lo_, hi_: sum(
        jnp.sum(x) for x in mk._hier_setup(
            lo_ + i * 0.0, hi_, dirs_tiled, alive, None, w, cs=cs)[1:3]
        if x is not None) + jnp.float32(0))
    res["hier_setup_ms"] = round(timed(setup, lo, hi), 2)

    # Eager (not jitted): S must stay a python int for the static args.
    S, hull, bbox, first, cull_lo, cull_hi, w2 = mk._hier_setup(
        lo, hi, dirs_tiled, alive, None, w, cs=cs)
    jax.block_until_ready(bbox)

    # Dense interval entries over supers (no sort).
    dlo, dhi = mk._hull(dirs_tiled, alive)
    ent_fn = loop(lambda i, l, h: jnp.sum(
        mk._interval_entry(l + i * 0.0, h, dlo, dhi)))
    res["interval_entries_ms"] = round(timed(ent_fn, cull_lo, cull_hi), 2)

    # Entries + pack + SORT (the full candidate-key prepass).
    keys_fn = loop(lambda i, l, h: jnp.sum(
        mk._tile_candidate_keys(l + i * 0.0, h, dirs_tiled,
                                alive=alive)[0]))
    res["candidate_keys_sorted_ms"] = round(
        timed(keys_fn, cull_lo, cull_hi), 2)

    keys, counts = jax.jit(functools.partial(
        mk._tile_candidate_keys, alive=alive))(cull_lo, cull_hi,
                                               dirs_tiled)
    root_lo, root_hi = mk._scene_root(cs)
    tcap = mk._ray_tcap(root_lo - eye_j, root_hi - eye_j, None, dp)
    feats = mk._feats_from_cols(dp, w.shape[1], tcap=tcap)
    jax.block_until_ready(keys)

    # The walk alone, every input precomputed — big arrays passed as
    # ARGUMENTS (closed-over 326 MB constants blow the remote-compile
    # payload limit, HTTP 413).
    stream = mk._use_stream(w2)

    @jax.jit
    def walk_fn(counts_, keys_, f, w_, hull_, bbox_, first_):
        def b(i, acc):
            return acc + mk._walk_pallas(
                counts_, keys_, f + i * 1e-7, w_, hull=hull_, bbox=bbox_,
                first=first_, tcap_col=4, mode="closest", stream=stream,
                interpret=False, S=S)[1][0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, b, jnp.float32(0.0))

    res["walk_only_ms"] = round(
        timed(walk_fn, counts, keys, feats, w2, hull, bbox, first), 2)

    res["meta"] = {"levels": LEVELS, "triangles": int(faces.shape[0]),
                   "clusters": int(cs.num_clusters), "S": int(S),
                   "supers": int(bbox.shape[0]), "stream": bool(stream)}
    print(json.dumps(res), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "hier_phases.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
