"""Isolate the winner-gather TRANSPOSE cost and race two formulations.

profile_backward.py shows the 1080p bwd/fwd gap is ~24 ms of vertex
cotangent paths; the suspected dominator is the backward of the winner
row gather `table[idx]` — a scatter-add of (R, 22) cotangent rows into
the (N_c*C, 22) table. This probe times, in isolation on the chip:

  gather_fwd      the forward row gather (baseline)
  scatter_vjp     jax.vjp of the gather (XLA's native scatter-add)
  sorted_segsum   the same transpose as sort-by-slot + row-gather of
                  the cotangents + segment_sum(indices_are_sorted)

with bunny-shaped data (R = 2.07M swizzled rays, 9,984 slots, 22 cols)
and REAL winner ids from a rendered frame (spatial coherence matters
for both formulations).
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
from ceres_tpu.models.mesh import triangle_soup
from ceres_tpu.render.scenes import data_dir
from ceres_tpu.utils import tiling
from ceres_tpu.accel.clusters import build_clusters_treelet
from ceres_tpu.ops import megakernel as mk

REPS = int(os.environ.get("REPS", 10))


def timed(fn, *args):
    # Scalar float() fetch, NOT block_until_ready: on the remote tunnel
    # block_until_ready returns before the device work runs (CLAUDE.md).
    float(fn(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def main():
    verts, faces = load_obj(os.path.join(data_dir(), "bunny.obj"))
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    cam = Camera.make(eye=eye, dir=verts.mean(axis=0) - eye, up=(0, 1, 0),
                      fov=60.0)
    soup = triangle_soup(jnp.asarray(verts), jnp.asarray(faces),
                         with_normals=False)
    cs = jax.jit(build_clusters_treelet)(soup)
    planes = camera_ray_columns(cam, 1920, 1080)
    dir_cols = tuple(tiling.swizzle_plane(p) for p in planes)
    hit = mk.closest_hit_common_origin(soup, jnp.asarray(eye), dir_cols,
                                       clusters=cs)
    # Real winner slot ids (clipped like the epilogue does).
    pidx, _ = mk._closest_search(cs, jnp.asarray(eye), dir_cols)
    idx = jnp.clip(pidx, 0)
    R = idx.shape[0]
    slots = cs.num_clusters * cs.cluster_size
    ncols = 22
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (slots, ncols), jnp.float32)
    cot = jax.random.normal(key, (R, ncols), jnp.float32)

    # Every body op must DEPEND on the loop index or XLA hoists /
    # constant-folds it (first probe version measured 0.01 ms for
    # everything): roll the index vector by i (keeps the realistic
    # coherent distribution) and scale the cotangents by (1 + i*eps).
    @functools.partial(jax.jit, static_argnames="k")
    def gather_fwd(table_, idx_, k):
        def body(i, acc):
            return acc + table_[jnp.roll(idx_, i)].sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnames="k")
    def scatter_vjp(table_, idx_, cot_, k):
        def body(i, acc):
            ii = jnp.roll(idx_, i)
            _, vjp = jax.vjp(lambda t: t[ii], table_)
            (dt,) = vjp(cot_ * (1.0 + i * 1e-9))
            return acc + dt.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnames="k")
    def sorted_segsum(idx_, cot_, k):
        def body(i, acc):
            ii = jnp.roll(idx_, i)
            order = jnp.argsort(ii).astype(jnp.int32)
            ids = ii[order]
            cs_ = (cot_ * (1.0 + i * 1e-9))[order]
            dt = jax.ops.segment_sum(cs_, ids, num_segments=slots,
                                     indices_are_sorted=True)
            return acc + dt.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    res = {
        "R": int(R), "slots": int(slots), "ncols": ncols,
        "gather_fwd_ms": round(timed(gather_fwd, table, idx, REPS), 2),
        "scatter_vjp_ms": round(timed(scatter_vjp, table, idx, cot, REPS),
                                2),
        "sorted_segsum_ms": round(timed(sorted_segsum, idx, cot, REPS), 2),
    }
    print(json.dumps(res), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scatter_probe.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
