"""Pallas ray-traversal megakernel: cluster-culled Möller-Trumbore.

TPU replacement for the reference's per-ray BVH traversal hot loop
(lib/bvh/single_ray_traverser.hpp:67-126 + triangle.hpp:95-115), inverted
for a lockstep vector machine and split into two phases so the Pallas
kernel never pays scalar-branch synchronization per culled cluster:

  1. **Culling prepass (pure JAX, dense).** Rays arrive in spatially
     coherent 512-ray pixel-block tiles (ceres_tpu.utils.tiling). Every
     (ray, cluster) slab test is evaluated as one dense vectorized pass —
     the FastNodeIntersector test (node_intersectors.hpp:83-103) with the
     RobustNodeIntersector's conservative padding — then reduced to a
     per-tile compacted cluster list sorted FRONT TO BACK by tile entry
     distance. XLA fuses this; there is no divergence and no scalar sync.
  2. **Intersection kernel (Pallas).** Per tile, a while-loop walks the
     sorted list and EARLY-EXITS once every ray's closest hit precedes the
     next cluster (the traverser's nearer-first + tmax-shrink pruning,
     single_ray_traverser.hpp:59,95-113, vectorized per tile). Each visit
     evaluates all R x C x 4 Möller-Trumbore numerators as ONE
     (R, Kp) @ (Kp, 4C) matmul on the MXU (the bilinear factorization of
     ceres_tpu.ops.intersect) with a branch-free division-free sign-test
     epilogue keeping per-ray closest (t, u, v, id) — or an any-hit flag
     (AnyPrimitiveIntersector semantics, primitive_intersectors.hpp:58-76)
     with its own all-occluded early exit. Cluster weight slabs are
     VMEM-resident (16 KB each).

Gradients: ``closest_hit_common_origin`` carries a custom VJP — backward
re-derives the winning intersections analytically in plain JAX (R winners,
not R x T pairs) and scatters grads to triangle records / camera / rays;
visibility stays detached (standard differentiable-rendering convention).
Occlusion (any-hit) is boolean and intentionally gradient-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ceres_tpu.accel import clusters as cl
from ceres_tpu.models.mesh import TriangleSoup
from ceres_tpu.ops.intersect import Hit

TILE = 512         # rays per grid step (= one 16 x 32 pixel block)


_BIG = 3.0e37      # "no hit yet" sentinel, finite to keep slab math NaN-free
_INV_CLAMP = 1e30
_PREPASS_TILES = 32  # tiles per chunk in the dense culling prepass
_WEIGHTS_CHUNK = 512  # clusters per kernel launch (8 MB of VMEM weights)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _safe_inverse(d):
    """Sign-preserving epsilon-clamped 1/d (reference vector.hpp:69-74)."""
    sign = jnp.where(d >= 0, 1.0, -1.0)
    return jnp.where(jnp.abs(d) < 1e-30, sign * _INV_CLAMP, 1.0 / d)


# ---------------------------------------------------------------------------
# Phase 1: dense culling prepass (pure JAX)
# ---------------------------------------------------------------------------

def _overlap_entry(lo, hi, origins, dirs):
    """Slab entry distance of rays (chunk, R, 3) vs clusters (N_c, 3).

    Returns (chunk, R, N_c) f32: the clamped slab entry distance
    ``max(tn, 0)`` where the ray overlaps the cluster box, +_BIG where it
    does not. ``origins`` may be None (rays from the coordinate origin).
    tmax is +BIG: conservative, the kernel's accept does the exact test.
    """
    inv = _safe_inverse(dirs)                                # (..., R, 3)
    if origins is None:
        t0 = lo[None, None] * inv[..., None, :]              # (c, R, N_c, 3)
        t1 = hi[None, None] * inv[..., None, :]
    else:
        rel_lo = lo[None, None] - origins[..., None, :]
        rel_hi = hi[None, None] - origins[..., None, :]
        t0 = rel_lo * inv[..., None, :]
        t1 = rel_hi * inv[..., None, :]
    tn = jnp.maximum(jnp.minimum(t0, t1).max(axis=-1), 0.0)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    # Conservative padding — the RobustNodeIntersector capability
    # (node_intersectors.hpp:54-79, Ize's robust traversal): widen the slab
    # interval by a few ulps so f32 rounding can never cull a cluster whose
    # exact interval is nonempty. Culling is a prefilter here (the kernel's
    # accept is exact), so padding costs only the occasional extra visit.
    hit = tn * (1.0 - 4e-6) <= jnp.minimum(tf, _BIG) * (1.0 + 4e-6)
    # Empty clusters (inf/-inf sentinel boxes from treelet padding) would
    # pass the inf-arithmetic slab test; mask them out explicitly.
    hit = hit & jnp.all(hi >= lo, axis=-1)[None, None, :]
    return jnp.where(hit, tn, _BIG)


def _tile_cluster_lists(lo, hi, dirs_tiled, origins_tiled=None, alive=None):
    """Per-tile overlapping-cluster lists, sorted FRONT TO BACK.

    dirs_tiled: (n_tiles, R, 3). Returns (lists (n_tiles, N_c) int32 with
    overlapping ids first in ascending tile entry distance, entry
    (n_tiles, N_c) f32 matching distances (+_BIG past count), counts
    (n_tiles,) int32). The ordering is the tile analog of the reference
    traverser's descend-nearer-first rule (single_ray_traverser.hpp:95-113)
    and enables the kernel's early exit once every ray's closest hit
    precedes the next cluster. Chunked over tiles to bound the dense
    (R, N_c) live set.
    """
    n_tiles = dirs_tiled.shape[0]
    pad = (-n_tiles) % _PREPASS_TILES

    def padt(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    dirs_p = padt(dirs_tiled).reshape(
        (-1, _PREPASS_TILES) + dirs_tiled.shape[1:])
    if origins_tiled is not None:
        orig_p = padt(origins_tiled).reshape(dirs_p.shape)
    if alive is not None:
        alive_p = padt(alive).reshape(dirs_p.shape[:3])

    def chunk_fn(args):
        if origins_tiled is None:
            d = args if alive is None else args[0]
            e = _overlap_entry(lo, hi, None, d)
        else:
            d, o = args[:2]
            e = _overlap_entry(lo, hi, o, d)
        if alive is not None:
            e = jnp.where(args[-1][..., None], e, _BIG)
        return jnp.min(e, axis=1)  # (chunk, N_c) nearest entry over rays

    if origins_tiled is None and alive is None:
        per_tile = jax.lax.map(chunk_fn, dirs_p)
    elif origins_tiled is None:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, alive_p))
    elif alive is None:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, orig_p))
    else:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, orig_p, alive_p))

    tn = per_tile.reshape(-1, lo.shape[0])[:n_tiles]       # (n_tiles, N_c)
    counts = jnp.sum(tn < _BIG, axis=1).astype(jnp.int32)  # (n_tiles,)
    order = jnp.argsort(tn, axis=1, stable=True)
    lists = order.astype(jnp.int32)
    entry = jnp.take_along_axis(tn, order, axis=1)
    return lists, entry, counts


# ---------------------------------------------------------------------------
# Phase 2: Pallas kernels
# ---------------------------------------------------------------------------

def _mt_channels(wj, feats, c_size):
    """Evaluate the 4 MT numerator channels for one cluster over a ray tile.

    wj: (Kp, 4 * C) weight slab (channels side by side along lanes);
    feats: (R, Kp) per-ray feature vectors, already padded with the
    implicit 1 and zeros. ONE ``jnp.dot`` -> the MXU evaluates all
    R x C x 4 numerators as a (R, Kp) @ (Kp, 4C) matmul — the point of the
    bilinear MT factorization (ceres_tpu.ops.intersect docstring); the
    previous chained VPU broadcast-FMA form was ~5x slower on real
    hardware.
    """
    out = jnp.dot(feats, wj, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)   # (R, 4C)
    return (out[:, :c_size], out[:, c_size:2 * c_size],
            out[:, 2 * c_size:3 * c_size], out[:, 3 * c_size:])


def _accept_sign(nu, nv, nd, nt):
    """Division-free MT accept: u,v,w,t >= 0 as sign tests on numerators.

    u = nu/det >= 0  <=>  nu * sign(det) >= 0 (det != 0), etc; w's numerator
    is det - nu - nv. Reproduces the reference's accept set
    (triangle.hpp:106-110) including its NaN/degenerate rejections, without
    materializing the divisions.
    """
    s = jnp.where(nd >= 0, 1.0, -1.0)
    return ((nu * s >= 0) & (nv * s >= 0)
            & ((nd - nu - nv) * s >= 0) & (nt * s >= 0) & (nd != 0))


def _closest_kernel(cnt_ref, list_ref, entry_ref, f_ref, w_ref, t_ref,
                    id_ref, u_ref, v_ref):
    """One ray-tile grid step: walk the culled clusters FRONT TO BACK and
    stop as soon as every ray's closest hit precedes the next cluster.

    This is the reference traverser's closest-hit pruning — descend nearer
    child first, shrink tmax, skip farther nodes already beyond it
    (single_ray_traverser.hpp:59,95-113) — vectorized per tile: the prune
    test compares the TILE's slowest ray (max t) against the next sorted
    entry distance, so it is conservative and exact.

    This launch's weight slabs are VMEM-resident (16 KB per cluster, at
    most _WEIGHTS_CHUNK of them — bigger scenes run as a chunk sequence
    merged by t-min, see _cluster_chunks); a (tiles x clusters)
    scalar-prefetch grid with skipped steps measured ~30% slower for
    coherent scenes and catastrophically slower for many-cluster ones.
    tmin = 0 (primary rays from the eye, reference ray.hpp:20).
    """
    count = cnt_ref[0, 0, 0]
    f = f_ref[0]                      # (R, Kp)
    R = f.shape[0]
    C = w_ref.shape[2] // 4
    n_c = list_ref.shape[2]

    t_ref[0, 0, :] = jnp.full((R,), _BIG, jnp.float32)
    id_ref[0, 0, :] = jnp.full((R,), -1, jnp.int32)
    u_ref[0, 0, :] = jnp.zeros((R,), jnp.float32)
    v_ref[0, 0, :] = jnp.zeros((R,), jnp.float32)

    def cond(k):
        more = k < count
        nxt = entry_ref[0, 0, jnp.minimum(k, n_c - 1)]
        return more & (jnp.max(t_ref[0, 0, :]) >= nxt)

    def body(k):
        cid = list_ref[0, 0, k]
        wj = w_ref[cid]               # (Kp, 4C)
        nu, nv, nd, nt = _mt_channels(wj, f, C)
        acc = _accept_sign(nu, nv, nd, nt)   # implies t >= 0 (nt*s >= 0)
        inv = 1.0 / jnp.where(nd != 0, nd, 1.0)
        tt = nt * inv
        # No running-t term in the pair mask: keeps the epilogue free of
        # the loop-carried dependency (only the final update reads t_ref),
        # so the next visit's matmul can overlap this epilogue.
        tpair = jnp.where(acc, tt, _BIG)
        t_min = jnp.min(tpair, axis=1)
        t_c = t_ref[0, 0, :]
        ids = jax.lax.broadcasted_iota(jnp.int32, tpair.shape, 1)
        idx = jnp.min(jnp.where(tpair <= t_min[:, None], ids, C), axis=1)
        # u, v of the winning lane (one-hot select: no per-ray gather).
        sel = ids == idx[:, None]
        u_min = jnp.sum(jnp.where(sel, nu * inv, 0.0), axis=1)
        v_min = jnp.sum(jnp.where(sel, nv * inv, 0.0), axis=1)
        better = t_min < t_c
        t_ref[0, 0, :] = jnp.where(better, t_min, t_c)
        id_ref[0, 0, :] = jnp.where(better, cid * C + idx, id_ref[0, 0, :])
        u_ref[0, 0, :] = jnp.where(better, u_min, u_ref[0, 0, :])
        v_ref[0, 0, :] = jnp.where(better, v_min, v_ref[0, 0, :])
        return k + 1

    jax.lax.while_loop(cond, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_pallas(feats_tiled, weights, lists, entry, counts, interpret):
    n_tiles, R, Kp = feats_tiled.shape
    n_c = weights.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
    ]
    out_spec = pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _closest_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(counts, lists, entry, feats_tiled, weights)


def _pack_weights(w):
    """(N_c, 4, C, K) -> (N_c, Kp, 4 * C): the matmul layout.

    Channels go side by side along the lane axis so the kernel's single
    (R, Kp) @ (Kp, 4C) dot yields [u_num | v_num | det | t_num] slabs; K is
    zero-padded to a sublane multiple (the padded feature entries are zero
    too, so the dot is unchanged).
    """
    n_c, ch, C, K = w.shape
    w = jnp.transpose(w, (0, 3, 1, 2)).reshape(n_c, K, ch * C)
    pad = (-K) % 8
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
    return w


def _pad_feats(feats, kp):
    """(R, K) ray features -> (R, kp): append the implicit 1 then zeros."""
    R, K = feats.shape
    ones = jnp.ones((R, 1), feats.dtype)
    out = jnp.concatenate([feats, ones], axis=-1)
    if kp > K + 1:
        out = jnp.pad(out, ((0, 0), (0, kp - K - 1)))
    return out


def _tile_rays(x, tile):
    """(R, ...) -> (n_tiles, tile, ...) zero-padded."""
    R = x.shape[0]
    pad = (-R) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x.reshape((-1, tile) + x.shape[1:])


def _cluster_chunks(n_c: int):
    """Static chunking of the cluster axis: the kernel holds one chunk's
    weight slabs in VMEM (16 KB/cluster), so bounding the chunk at
    _WEIGHTS_CHUNK clusters (8 MB) lifts the whole-scene-in-VMEM cap —
    scenes of any size run as a short static sequence of kernel launches
    whose hits merge by t-min."""
    return [(s, min(s + _WEIGHTS_CHUNK, n_c))
            for s in range(0, n_c, _WEIGHTS_CHUNK)]


def _closest_forward(p0, e1, e2, n, eye, dirs, cs=None):
    R = dirs.shape[0]
    if cs is None:
        soup = TriangleSoup(p0=p0, e1=e1, e2=e2, n=n)
        cs = cl.build_clusters_treelet(soup)
    w = _pack_weights(cl.cluster_weights_common_origin(cs, eye))
    # Shift cluster boxes by the origin so slab tests are origin-free.
    lo = jax.lax.stop_gradient(cs.lo - eye)
    hi = jax.lax.stop_gradient(cs.hi - eye)
    tile = TILE
    dirs_tiled = _tile_rays(dirs, tile)
    feats_tiled = _tile_rays(_pad_feats(dirs, w.shape[1]), tile)

    t = pidx = u = v = None
    for start, stop in _cluster_chunks(cs.num_clusters):
        lists, entry, counts = _tile_cluster_lists(
            lo[start:stop], hi[start:stop],
            jax.lax.stop_gradient(dirs_tiled))
        tc, pc, uc, vc = _closest_pallas(
            feats_tiled, w[start:stop], lists[:, None, :],
            entry[:, None, :], counts[:, None, None], _interpret())
        pc = jnp.where(pc >= 0, pc + start * cs.cluster_size, pc)
        if t is None:
            t, pidx, u, v = tc, pc, uc, vc
        else:
            better = tc < t
            t = jnp.where(better, tc, t)
            pidx = jnp.where(better, pc, pidx)
            u = jnp.where(better, uc, u)
            v = jnp.where(better, vc, v)
    t = t.reshape(-1)[:R]
    pidx = pidx.reshape(-1)[:R]
    u = u.reshape(-1)[:R]
    v = v.reshape(-1)[:R]
    mask = pidx >= 0
    prim = jnp.where(mask, cs.perm[jnp.clip(pidx, 0)], 0).astype(jnp.int32)
    t = jnp.where(mask, t, jnp.inf)
    u = jnp.where(mask, u, 0.0)
    v = jnp.where(mask, v, 0.0)
    return Hit(t=t, u=u, v=v, prim_id=prim, mask=mask)


@jax.custom_vjp
def _closest_hit(p0, e1, e2, n, eye, dirs):
    return _closest_forward(p0, e1, e2, n, eye, dirs)


def _closest_fwd(p0, e1, e2, n, eye, dirs):
    hit = _closest_forward(p0, e1, e2, n, eye, dirs)
    return hit, (p0, e1, e2, n, eye, dirs, hit.prim_id, hit.mask)


def _winner_tuv(p0w, e1w, e2w, nw, eye, d):
    """Reference MT recomputation for (ray, winning triangle) pairs.

    Exactly triangle.hpp:95-115 with c = p0 - eye: gradients of (t, u, v)
    w.r.t. every continuous input, evaluated only at the R winners instead
    of through the R x T search.
    """
    c = p0w - eye
    r = jnp.cross(d, c)
    det = jnp.sum(nw * d, axis=-1)
    inv = 1.0 / det
    u = jnp.sum(r * e2w, axis=-1) * inv
    v = jnp.sum(r * e1w, axis=-1) * inv
    t = jnp.sum(nw * c, axis=-1) * inv
    return t, u, v


def _closest_bwd(res, g):
    p0, e1, e2, n, eye, dirs, prim, mask = res
    gt = jnp.where(mask, g.t, 0.0)
    gu = jnp.where(mask, g.u, 0.0)
    gv = jnp.where(mask, g.v, 0.0)

    p0w, e1w, e2w, nw = p0[prim], e1[prim], e2[prim], n[prim]
    _, vjp = jax.vjp(_winner_tuv, p0w, e1w, e2w, nw,
                     jnp.broadcast_to(eye, dirs.shape), dirs)
    gp0w, ge1w, ge2w, gnw, geye_r, gdirs = vjp((gt, gu, gv))

    m = mask[:, None]
    zero = jnp.zeros_like(p0)
    gp0 = zero.at[prim].add(jnp.where(m, gp0w, 0.0))
    ge1 = zero.at[prim].add(jnp.where(m, ge1w, 0.0))
    ge2 = zero.at[prim].add(jnp.where(m, ge2w, 0.0))
    gn = zero.at[prim].add(jnp.where(m, gnw, 0.0))
    geye = jnp.sum(jnp.where(m, geye_r, 0.0), axis=0)
    gdirs = jnp.where(m, gdirs, 0.0)
    return gp0, ge1, ge2, gn, geye, gdirs


_closest_hit.defvjp(_closest_fwd, _closest_bwd)


def closest_hit_common_origin(soup: TriangleSoup, eye, dirs,
                              clusters=None) -> Hit:
    """Closest hit of normalized ``dirs`` rays all starting at ``eye``.

    With ``clusters`` (a prebuilt ClusterSet for this exact soup) the
    acceleration-structure build is skipped — the fast lane for frame
    loops over static geometry, where rebuilding the LBVH per frame
    dominates (XLA does not hoist it out of ``lax.map``). This lane is
    NON-differentiable (no custom VJP); pass ``clusters=None`` wherever
    gradients are needed.
    """
    if clusters is not None:
        cs = jax.tree.map(jax.lax.stop_gradient, clusters)
        args = jax.lax.stop_gradient(
            (soup.p0, soup.e1, soup.e2, soup.n, eye, dirs))
        return _closest_forward(*args, cs=cs)
    return _closest_hit(soup.p0, soup.e1, soup.e2, soup.n, eye, dirs)


def _any_kernel(cnt_ref, list_ref, f_ref, skip_ref, w_ref, occ_ref):
    """Occlusion tile: tmin = 0 / tmax = inf are the sign tests already.

    Early exit once every ray in the tile is occluded (or skipped) — the
    AnyPrimitiveIntersector's first-hit termination
    (single_ray_traverser.hpp:57-58,92-93) vectorized per tile.
    """
    count = cnt_ref[0, 0, 0]
    f = f_ref[0]                        # (R, Kp): [d, d x o, o, 1, pad]
    C = w_ref.shape[2] // 4
    occ_ref[0, 0, :] = skip_ref[0, 0, :]

    def cond(k):
        return (k < count) & (jnp.min(occ_ref[0, 0, :]) == 0)

    def body(k):
        cid = list_ref[0, 0, k]
        wj = w_ref[cid]                 # (Kp, 4C)
        nu, nv, nd, nt = _mt_channels(wj, f, C)
        acc = _accept_sign(nu, nv, nd, nt)
        hit_any = jnp.any(acc, axis=1).astype(jnp.int32)
        occ_ref[0, 0, :] = occ_ref[0, 0, :] | hit_any
        return k + 1

    jax.lax.while_loop(cond, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _any_pallas(feats_tiled, skip_tiled, weights, lists, counts, interpret):
    n_tiles, R, Kp = feats_tiled.shape
    n_c = weights.shape[0]
    return pl.pallas_call(
        _any_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
        interpret=interpret,
    )(counts, lists, feats_tiled, skip_tiled, weights)


def traversal_counts_common_origin(soup: TriangleSoup, eye, dirs):
    """(traversal_steps, intersections) for the primary wavefront.

    The SingleRayTraverser::Statistics capability
    (single_ray_traverser.hpp:131-163), recast for the cluster structure:
    ``traversal_steps`` counts kernel (tile, cluster) loop iterations (the
    analog of node visits), ``intersections`` the Möller-Trumbore pair
    evaluations those iterations perform (TILE rays x cluster_size
    triangles each, padding tiles included). Pure prepass math — inside
    one jit with the render the cluster build and culling lists are CSEd,
    so the counters are effectively free, like the reference's no-op
    counter trick (:146-152).
    """
    soup, eye, dirs = jax.lax.stop_gradient((soup, eye, dirs))
    cs = cl.build_clusters_treelet(soup)
    tile = TILE
    dirs_tiled = _tile_rays(dirs, tile)
    _, _, counts = _tile_cluster_lists(cs.lo - eye, cs.hi - eye, dirs_tiled)
    steps = jnp.sum(counts)
    return steps, steps * tile * cs.cluster_size


def traversal_counts_any(soup: TriangleSoup, origin_shift, origins, dirs,
                         skip=None):
    """(traversal_steps, intersections) for a generic-origin wavefront."""
    soup, origin_shift, origins, dirs = jax.lax.stop_gradient(
        (soup, origin_shift, origins, dirs))
    cs = cl.build_clusters_treelet(soup)
    lo = cs.lo - origin_shift
    hi = cs.hi - origin_shift
    if skip is None:
        skip = jnp.zeros(dirs.shape[:1], bool)
    tile = TILE
    _, _, counts = _tile_cluster_lists(
        lo, hi, _tile_rays(dirs, tile),
        _tile_rays(origins - origin_shift, tile), _tile_rays(~skip, tile))
    steps = jnp.sum(counts)
    return steps, steps * tile * cs.cluster_size


def any_hit(soup: TriangleSoup, origin_shift, origins, dirs, skip=None,
            clusters=None):
    """Occlusion test: True where a ray (origins[i], dirs[i]) hits anything.

    ``origin_shift`` recenters the world for conditioning (see
    ceres_tpu.ops.intersect docstring); ``skip`` marks rays whose answer is
    irrelevant (no primary hit) so they generate no traversal work.
    ``clusters`` skips the structure build (see closest_hit_common_origin).
    Boolean, intentionally non-differentiable (detached visibility).
    """
    p0, e1, e2, n, shift, origins, dirs = jax.lax.stop_gradient(
        (soup.p0, soup.e1, soup.e2, soup.n, origin_shift, origins, dirs))
    R = dirs.shape[0]
    if clusters is None:
        cs = cl.build_clusters_treelet(TriangleSoup(p0=p0, e1=e1, e2=e2, n=n))
    else:
        cs = jax.tree.map(jax.lax.stop_gradient, clusters)
    w = _pack_weights(cl.cluster_weights_generic(cs, shift))
    lo = cs.lo - shift
    hi = cs.hi - shift
    o = origins - shift
    if skip is None:
        skip = jnp.zeros((R,), bool)
    tile = TILE
    dirs_tiled = _tile_rays(dirs, tile)
    orig_tiled = _tile_rays(o, tile)
    feats_tiled = _tile_rays(_pad_feats(
        jnp.concatenate([dirs, jnp.cross(dirs, o), o], axis=-1),  # (R, 9)
        w.shape[1]), tile)

    occluded = skip
    for start, stop in _cluster_chunks(cs.num_clusters):
        # Rays already occluded by an earlier chunk skip this one's work
        # (both the culling lists and the kernel's all-resolved early exit
        # see them as done).
        alive = _tile_rays(~occluded, tile)
        lists, _, counts = _tile_cluster_lists(
            lo[start:stop], hi[start:stop], dirs_tiled, orig_tiled, alive)
        occ = _any_pallas(
            feats_tiled,
            _tile_rays(occluded.astype(jnp.int32), tile)[:, None, :],
            w[start:stop], lists[:, None, :], counts[:, None, None],
            _interpret(),
        )
        occluded = occluded | (occ.reshape(-1)[:R] == 1)
    return occluded & ~skip
