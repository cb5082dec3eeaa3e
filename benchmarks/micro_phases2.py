"""Sub-phase decomposition of closest-hit and any-hit on the real chip.

Mirrors the internals of megakernel._closest_search / any_hit_to_point so
each sub-phase (weights+pack, culling prepass, feature assembly, the walk
kernel itself, the winner-gather epilogue) can be timed in isolation.
Accepts MESH=bunny|dragon (default bunny).
"""

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
    mesh = os.environ.get("MESH", "bunny")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", f"{mesh}.obj")
    verts, faces = load_obj(path)
    eye = np.asarray([0.0, 0.1, -0.3], np.float32)
    if mesh == "dragon":
        eye = np.asarray([0.0, -10.0, 2.0], np.float32)
    direction = verts.mean(axis=0) - eye
    camera = Camera.make(eye=eye, dir=direction, up=(0, 1, 0), fov=60.0)
    W, H = 1920, 1080
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)
    soup = triangle_soup(vj, fj, with_normals=True)
    dirs = tiling.swizzle(camera_rays(camera, W, H))
    cs = jax.jit(cl.build_clusters_treelet)(soup)
    print(f"{mesh}: {soup.num_triangles} tris, {cs.num_clusters} clusters")
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
    dp = tuple(mk._pad_rays(c) for c in dir_cols)
    dirs_tiled = tuple(c.reshape(-1, mk.TILE) for c in dp)

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
            dpc = (d0 + i * 1e-7,) + dp[1:]
            tcap = mk._ray_tcap(root_lo - eye_j, root_hi - eye_j, None, dpc)
            ft = mk._feats_from_cols(dpc, w.shape[1], tcap=tcap)
            return acc + ft[0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"closest/tcap+feats       {timeit(feats_only, dp[0])*1e3:8.2f} ms")

    keys, counts = jax.jit(mk._tile_candidate_keys)(lo, hi, dirs_tiled)
    tcap = mk._ray_tcap(root_lo - eye_j, root_hi - eye_j, None, dp)
    feats = mk._feats_from_cols(dp, w.shape[1], tcap=tcap)

    @jax.jit
    def walk_only(f):
        def body(i, acc):
            pidx, steps = mk._walk_pallas(
                counts, keys, f + i * 1e-7, w, tcap_col=4,
                mode="closest", stream=False, interpret=False)
            return acc + steps[0, 0] + pidx[0]
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    print(f"closest/walk             {timeit(walk_only, feats)*1e3:8.2f} ms")
    _, steps = jax.jit(mk._walk_pallas, static_argnames=(
        "tcap_col", "mode", "stream", "interpret"))(
        counts, keys, feats, w, tcap_col=4, mode="closest",
        stream=False, interpret=False)
    print(f"  (scheduled={int(counts.sum())}, executed={int(steps[0,0])}, "
          f"tiles={counts.shape[0]})")

    pidx, _ = jax.jit(mk._walk_pallas, static_argnames=(
        "tcap_col", "mode", "stream", "interpret"))(
        counts, keys, feats, w, tcap_col=4, mode="closest",
        stream=False, interpret=False)
    R = dirs.shape[0]
    pidx_flat = pidx[:R]
    payload = [soup.n[:, a] for a in range(3)]
    payload += [soup.corner_normals[:, k, a]
                for k in range(3) for a in range(3)]

    @jax.jit
    def epilogue_only(pf):
        def body(i, acc):
            cols = mk._winner_table_cols(soup, cs, payload)
            table = jnp.stack(cols, axis=-1)
            idx = jnp.clip(pf + i * 0, 0)
            recT = jnp.matmul(jnp.eye(len(cols), dtype=table.dtype),
                              jnp.transpose(table[idx]),
                              precision=jax.lax.Precision.HIGHEST)
            rec = tuple(recT)
            t, u, v = mk._winner_tuv(rec, eye_j, dir_cols)
            return acc + t.sum() + rec[0][0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"closest/winner epilogue  {timeit(epilogue_only, pidx_flat)*1e3:8.2f} ms")

    # --- shadow (common-destination) sub-phases ------------------------
    hit = jax.jit(mk.closest_hit_common_origin)(soup, eye_j, dirs, clusters=cs)
    t_safe = jnp.where(hit.mask, hit.t, 0.0)
    point = eye_j + t_safe[:, None] * dirs
    n = soup.n[jnp.where(hit.mask, hit.prim_id, 0)]
    point = point + -1e-5 * n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    sun = jnp.asarray([-50.0, 100.0, 0.0], jnp.float32)
    skip = ~hit.mask
    p_cols = (point[:, 0], point[:, 1], point[:, 2])

    @jax.jit
    def dest_weights(s):
        def body(i, acc):
            w2 = mk._pack_weights(
                cl.cluster_weights_common_origin(cs, s + i * 1e-7))
            return acc + w2[0, 0, 0]
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    print(f"shadow/weights+pack      {timeit(dest_weights, sun)*1e3:8.2f} ms")

    w2 = jax.jit(lambda: mk._pack_weights(cl.cluster_weights_common_origin(
        cs, sun)))()
    d = tuple(p_cols[a] - sun[a] for a in range(3))
    dp2 = tuple(mk._pad_rays(c) for c in d)
    dirs_tiled2 = tuple(c.reshape(-1, mk.TILE) for c in dp2)
    skip_p = mk._pad_rays(skip)
    alive = ~skip_p.reshape(-1, mk.TILE)
    alive = alive & ((dirs_tiled2[0] ** 2 + dirs_tiled2[1] ** 2
                      + dirs_tiled2[2] ** 2) > 0.0)

    @jax.jit
    def dest_pre(d0):
        def body(i, acc):
            dt = (d0 + i * 1e-7,) + dirs_tiled2[1:]
            keys2, counts2 = mk._tile_candidate_keys(
                cs.lo - sun, cs.hi - sun, dt, alive=alive)
            return acc + counts2.sum() + keys2[0, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    print(f"shadow/prepass           {timeit(dest_pre, dirs_tiled2[0])*1e3:8.2f} ms")

    keys2, counts2 = jax.jit(mk._tile_candidate_keys)(
        cs.lo - sun, cs.hi - sun, dirs_tiled2, alive=alive)
    rl, rh = mk._scene_root(cs)
    tcap2 = jnp.minimum(mk._ray_tcap(rl - sun, rh - sun, None, dp2),
                        1.0 + mk._ULP_PAD)
    feats2 = mk._feats_from_cols(dp2, w2.shape[1], tcap=tcap2)
    occ0 = skip_p.astype(jnp.int32)

    @jax.jit
    def dest_walk(f):
        def body(i, acc):
            occ, steps = mk._walk_pallas(
                counts2, keys2, f + i * 1e-7, w2, occ0, tcap_col=4,
                mode="any_dest", stream=False, interpret=False)
            return acc + steps[0, 0] + occ[0]
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    print(f"shadow/walk              {timeit(dest_walk, feats2)*1e3:8.2f} ms")
    _, steps2 = jax.jit(mk._walk_pallas, static_argnames=(
        "tcap_col", "mode", "stream", "interpret"))(
        counts2, keys2, feats2, w2, occ0, tcap_col=4, mode="any_dest",
        stream=False, interpret=False)
    print(f"  (scheduled={int(counts2.sum())}, executed={int(steps2[0,0])})")


if __name__ == "__main__":
    main()
