"""Sub-phase decomposition of closest-hit and any-hit on the real chip."""

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
from ceres_tpu.utils import tiling
from ceres_tpu.accel import clusters as cl
from ceres_tpu.ops import megakernel as mk

REPS = 10


def timeit(fn, *args):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bunny.obj")
    verts, faces = load_obj(path)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    direction = verts.mean(axis=0) - eye
    camera = Camera.make(eye=eye, dir=direction, up=(0, 1, 0), fov=60.0)
    W, H = 1920, 1080
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)
    soup = triangle_soup(vj, fj, with_normals=True)
    dirs = tiling.swizzle(camera_rays(camera, W, H))
    cs = jax.jit(cl.build_clusters_treelet)(soup)
    dir_cols = (dirs[:, 0], dirs[:, 1], dirs[:, 2])
    eye_j = jnp.asarray(eye)

    # --- closest sub-phases -------------------------------------------
    @jax.jit
    def weights_only(e):
        def body(i, acc):
            w = mk._pack_weights(
                cl.cluster_weights_common_origin(cs, e + i * 1e-7))
            return acc + w[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"closest/weights+pack     {timeit(weights_only, eye_j)*1e3:8.2f} ms")

    w = jax.jit(lambda: mk._pack_weights(
        cl.cluster_weights_common_origin(cs, eye_j)))()
    lo = cs.lo - eye_j
    hi = cs.hi - eye_j
    root_lo, root_hi = mk._scene_root(cs)
    dirs_tiled = tuple(mk._tile_rays(c, mk.TILE) for c in dir_cols)

    @jax.jit
    def prepass_only(d0):
        def body(i, acc):
            dt = (d0 + i * 1e-7,) + dirs_tiled[1:]
            keys, counts = mk._tile_candidate_keys(lo, hi, dt)
            return acc + counts.sum() + keys[0, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    print(f"closest/prepass          {timeit(prepass_only, dirs_tiled[0])*1e3:8.2f} ms")

    @jax.jit
    def feats_only(d0):
        def body(i, acc):
            dc = (d0 + i * 1e-7,) + dir_cols[1:]
            tcap = mk._ray_tcap(root_lo - eye_j, root_hi - eye_j, None, dc)
            ft = mk._tile_rays(
                mk._feats_from_cols(dc, w.shape[1], tcap=tcap), mk.TILE)
            return acc + ft[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"closest/tcap+feats       {timeit(feats_only, dir_cols[0])*1e3:8.2f} ms")

    keys, counts = jax.jit(mk._tile_candidate_keys)(lo, hi, dirs_tiled)
    tcap = mk._ray_tcap(root_lo - eye_j, root_hi - eye_j, None, dir_cols)
    feats_tiled = mk._tile_rays(
        mk._feats_from_cols(dir_cols, w.shape[1], tcap=tcap), mk.TILE)

    @jax.jit
    def walk_only(f):
        def body(i, acc):
            pidx, steps = mk._walk_pallas(
                counts, keys, f + i * 1e-7, w, tcap_col=4,
                any_hit_mode=False, stream=False, interpret=False)
            return acc + steps[0, 0] + pidx[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    print(f"closest/walk             {timeit(walk_only, feats_tiled)*1e3:8.2f} ms")
    _, steps = jax.jit(mk._walk_pallas, static_argnames=(
        "tcap_col", "any_hit_mode", "stream", "interpret"))(
        counts, keys, feats_tiled, w, tcap_col=4, any_hit_mode=False,
        stream=False, interpret=False)
    print(f"  (scheduled={int(counts.sum())}, executed={int(steps[0,0])}, "
          f"tiles={counts.shape[0]})")

    pidx, _ = jax.jit(mk._walk_pallas, static_argnames=(
        "tcap_col", "any_hit_mode", "stream", "interpret"))(
        counts, keys, feats_tiled, w, tcap_col=4, any_hit_mode=False,
        stream=False, interpret=False)
    R = dirs.shape[0]
    pidx_flat = pidx.reshape(-1)[:R]
    payload = jnp.concatenate([soup.n, soup.corner_normals.reshape(-1, 9)],
                              axis=-1)

    @jax.jit
    def epilogue_only(pf):
        def body(i, acc):
            table = mk._winner_table(soup, cs, payload)
            rec = table[jnp.clip(pf + i * 0, 0)]
            t, u, v = mk._winner_tuv(rec, eye_j, dir_cols)
            return acc + t.sum() + rec[0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"closest/winner epilogue  {timeit(epilogue_only, pidx_flat)*1e3:8.2f} ms")

    # --- any-hit sub-phases -------------------------------------------
    hit = jax.jit(mk.closest_hit_common_origin)(soup, eye_j, dirs, clusters=cs)
    t_safe = jnp.where(hit.mask, hit.t, 0.0)
    point = eye_j + t_safe[:, None] * dirs
    n = soup.n[jnp.where(hit.mask, hit.prim_id, 0)]
    point = point + -1e-5 * n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    sun_line = sun - point
    sun_line = sun_line / jnp.linalg.norm(sun_line, axis=-1, keepdims=True)
    center = jnp.mean(soup.p0, axis=0)

    @jax.jit
    def any_weights(c):
        def body(i, acc):
            w2 = mk._pack_weights(cl.cluster_weights_generic(cs, c + i * 1e-7))
            return acc + w2[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"anyhit/weights+pack      {timeit(any_weights, center)*1e3:8.2f} ms")

    w2 = jax.jit(lambda: mk._pack_weights(cl.cluster_weights_generic(
        cs, center)))()
    o_cols = tuple(point[:, a] - center[a] for a in range(3))
    d_cols = (sun_line[:, 0], sun_line[:, 1], sun_line[:, 2])
    skip = ~hit.mask

    @jax.jit
    def any_pre(p0):
        def body(i, acc):
            oc = (p0 + i * 1e-7,) + o_cols[1:]
            dt = tuple(mk._tile_rays(c, mk.TILE) for c in d_cols)
            ot = tuple(mk._tile_rays(c, mk.TILE) for c in oc)
            alive = mk._tile_rays(~skip, mk.TILE)
            keys2, counts2 = mk._tile_candidate_keys(
                cs.lo - center, cs.hi - center, dt, ot, alive)
            return acc + counts2.sum() + keys2[0, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    print(f"anyhit/prepass           {timeit(any_pre, o_cols[0])*1e3:8.2f} ms")

    @jax.jit
    def any_feats(p0):
        def body(i, acc):
            oc = (p0 + i * 1e-7,) + o_cols[1:]
            dxo = (d_cols[1] * oc[2] - d_cols[2] * oc[1],
                   d_cols[2] * oc[0] - d_cols[0] * oc[2],
                   d_cols[0] * oc[1] - d_cols[1] * oc[0])
            tcap2 = mk._ray_tcap(cs.lo.min(0) - center, cs.hi.max(0) - center,
                                 oc, d_cols)
            ft = mk._tile_rays(mk._feats_from_cols(
                d_cols + dxo + oc, w2.shape[1], tcap=tcap2), mk.TILE)
            return acc + ft[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"anyhit/feats             {timeit(any_feats, o_cols[0])*1e3:8.2f} ms")

    dt = tuple(mk._tile_rays(c, mk.TILE) for c in d_cols)
    ot = tuple(mk._tile_rays(c, mk.TILE) for c in o_cols)
    alive = mk._tile_rays(~skip, mk.TILE)
    keys2, counts2 = jax.jit(mk._tile_candidate_keys)(
        cs.lo - center, cs.hi - center, dt, ot, alive)
    dxo = (d_cols[1] * o_cols[2] - d_cols[2] * o_cols[1],
           d_cols[2] * o_cols[0] - d_cols[0] * o_cols[2],
           d_cols[0] * o_cols[1] - d_cols[1] * o_cols[0])
    rl, rh = mk._scene_root(cs)
    tcap2 = mk._ray_tcap(rl - center, rh - center, o_cols, d_cols)
    feats2 = mk._tile_rays(mk._feats_from_cols(
        d_cols + dxo + o_cols, w2.shape[1], tcap=tcap2), mk.TILE)
    occ0 = mk._tile_rays(skip.astype(jnp.int32), mk.TILE)[..., None]

    @jax.jit
    def any_walk(f):
        def body(i, acc):
            occ, steps = mk._walk_pallas(
                counts2, keys2, f + i * 1e-7, w2, occ0, tcap_col=10,
                any_hit_mode=True, stream=False, interpret=False)
            return acc + steps[0, 0] + occ[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    print(f"anyhit/walk              {timeit(any_walk, feats2)*1e3:8.2f} ms")
    _, steps2 = jax.jit(mk._walk_pallas, static_argnames=(
        "tcap_col", "any_hit_mode", "stream", "interpret"))(
        counts2, keys2, feats2, w2, occ0, tcap_col=10, any_hit_mode=True,
        stream=False, interpret=False)
    print(f"  (scheduled={int(counts2.sum())}, executed={int(steps2[0,0])})")


if __name__ == "__main__":
    main()
