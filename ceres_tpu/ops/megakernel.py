"""Pallas ray-traversal megakernel: cluster-culled Möller-Trumbore.

TPU replacement for the reference's per-ray BVH traversal hot loop
(lib/bvh/single_ray_traverser.hpp:67-126 + triangle.hpp:95-115), inverted
for a lockstep vector machine and split into two phases so the Pallas
kernel never pays scalar-branch synchronization per culled cluster:

  1. **Culling prepass (pure JAX, dense).** Rays arrive in spatially
     coherent 512-ray pixel-block tiles (ceres_tpu.utils.tiling). Every
     (ray, cluster) slab test is evaluated as one dense vectorized pass —
     the FastNodeIntersector test (node_intersectors.hpp:83-103) over all
     pairs at once — then reduced to a per-tile *compacted list* of
     overlapping cluster ids. XLA fuses this; there is no divergence and
     no scalar sync.
  2. **Intersection kernel (Pallas).** Per tile, a while-loop over exactly
     ``count[tile]`` list entries — the actual work, typically a handful —
     evaluating each cluster's 128 triangles against all 512 rays as
     rank-K broadcast outer products (K = 4 common-origin / 10 generic;
     see ceres_tpu.ops.intersect for the Möller-Trumbore factorization)
     and keeping per-ray closest (t, u, v, id) or an any-hit flag
     (AnyPrimitiveIntersector semantics, primitive_intersectors.hpp:58-76).
     Cluster weight tensors are VMEM-resident; the loop body is branch-free.

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

TILE = 1024        # rays per grid step (= one 32 x 32 pixel block)
_BIG = 3.0e37      # "no hit yet" sentinel, finite to keep slab math NaN-free
_INV_CLAMP = 1e30
_PREPASS_TILES = 32  # tiles per chunk in the dense culling prepass


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _safe_inverse(d):
    """Sign-preserving epsilon-clamped 1/d (reference vector.hpp:69-74)."""
    sign = jnp.where(d >= 0, 1.0, -1.0)
    return jnp.where(jnp.abs(d) < 1e-30, sign * _INV_CLAMP, 1.0 / d)


# ---------------------------------------------------------------------------
# Phase 1: dense culling prepass (pure JAX)
# ---------------------------------------------------------------------------

def _overlap_mask(lo, hi, origins, dirs):
    """Slab overlap of rays (chunk, R, 3) vs clusters (N_c, 3) -> (chunk, R, N_c).

    ``origins`` may be None (rays from the coordinate origin). tmin = 0,
    tmax = +BIG: conservative, the kernel's accept does the exact test.
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
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    return jnp.maximum(tn, 0.0) <= jnp.minimum(tf, _BIG)


def _tile_cluster_lists(lo, hi, dirs_tiled, origins_tiled=None, alive=None):
    """Compacted per-tile overlapping-cluster lists.

    dirs_tiled: (n_tiles, R, 3). Returns (lists (n_tiles, N_c) int32 with
    overlapping ids first, counts (n_tiles, 1) int32). Chunked over tiles
    to bound the dense (R, N_c) live set.
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
            m = _overlap_mask(lo, hi, None, d)
        else:
            d, o = args[:2]
            m = _overlap_mask(lo, hi, o, d)
        if alive is not None:
            m = m & args[-1][..., None]
        return jnp.any(m, axis=1)  # (chunk, N_c) any over rays

    if origins_tiled is None and alive is None:
        per_tile = jax.lax.map(chunk_fn, dirs_p)
    elif origins_tiled is None:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, alive_p))
    elif alive is None:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, orig_p))
    else:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, orig_p, alive_p))

    mask = per_tile.reshape(-1, lo.shape[0])[:n_tiles]     # (n_tiles, N_c)
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)[:, None, None]
    lists = jnp.argsort(~mask, axis=1, stable=True).astype(jnp.int32)
    return lists[:, None, :], counts


# ---------------------------------------------------------------------------
# Phase 2: Pallas kernels
# ---------------------------------------------------------------------------

def _mt_channels(wj, coeffs, nk):
    """Evaluate the 4 MT numerator channels for one cluster over a ray tile.

    wj: (4, Kp, C) weight slab; coeffs: (R, nk) per-ray features (the
    implicit trailing 1-feature is wj[:, nk]); returns 4 arrays (R, C).
    """
    outs = []
    for ch in range(4):
        acc = jnp.broadcast_to(wj[ch, nk][None, :], (coeffs.shape[0], wj.shape[2]))
        for k in range(nk):
            acc = acc + coeffs[:, k:k + 1] * wj[ch, k][None, :]
        outs.append(acc)
    return outs


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


def _closest_kernel(sc_ref, cnt_ref, list_ref, d_ref, w_ref,
                    t_ref, id_ref):
    tmin = sc_ref[0, 0]
    count = cnt_ref[0, 0, 0]
    d = d_ref[0]                      # (R, 3)
    R = d.shape[0]
    C = w_ref.shape[3]

    t_ref[0, 0, :] = jnp.full((R,), _BIG)
    id_ref[0, 0, :] = jnp.full((R,), -1, jnp.int32)

    def body(k, _):
        cid = list_ref[0, 0, k]
        wj = w_ref[cid]               # (4, Kp, C)
        nu, nv, nd, nt = _mt_channels(wj, d, 3)
        t_c = t_ref[0, 0, :]
        acc = _accept_sign(nu, nv, nd, nt)
        tt = nt / jnp.where(nd != 0, nd, 1.0)
        tpair = jnp.where(acc & (tt >= tmin) & (tt <= t_c[:, None]), tt, _BIG)
        t_min = jnp.min(tpair, axis=1)
        ids = jax.lax.broadcasted_iota(jnp.int32, tpair.shape, 1)
        idx = jnp.min(jnp.where(tpair <= t_min[:, None], ids, C), axis=1)
        better = t_min < t_c
        t_ref[0, 0, :] = jnp.where(better, t_min, t_c)
        id_ref[0, 0, :] = jnp.where(better, cid * C + idx, id_ref[0, 0, :])
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_pallas(dirs_tiled, weights, lists, counts, scalars, interpret):
    n_tiles, R, _ = dirs_tiled.shape
    n_c = weights.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
    ]
    out_spec = pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _closest_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 2,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, counts, lists, dirs_tiled, weights)


def _pack_weights(w):
    """(N_c, 4, C, K) -> (N_c, 4, Kp, C) with K padded to a sublane multiple."""
    w = jnp.swapaxes(w, 2, 3)  # (N_c, 4, K, C)
    K = w.shape[2]
    pad = (-K) % 8
    if pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return w


def _tile_rays(x, tile):
    """(R, ...) -> (n_tiles, tile, ...) zero-padded."""
    R = x.shape[0]
    pad = (-R) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x.reshape((-1, tile) + x.shape[1:])


def _closest_forward(p0, e1, e2, n, eye, dirs):
    R = dirs.shape[0]
    soup = TriangleSoup(p0=p0, e1=e1, e2=e2, n=n)
    cs = cl.build_clusters(soup)
    w = _pack_weights(cl.cluster_weights_common_origin(cs, eye))
    # Shift cluster boxes by the origin so slab tests are origin-free.
    lo = jax.lax.stop_gradient(cs.lo - eye)
    hi = jax.lax.stop_gradient(cs.hi - eye)
    dirs_tiled = _tile_rays(dirs, TILE)
    lists, counts = _tile_cluster_lists(lo, hi, jax.lax.stop_gradient(dirs_tiled))
    scalars = jnp.array([[0.0, 0.0]], jnp.float32)  # tmin, spare
    t, pidx = _closest_pallas(dirs_tiled, w, lists, counts, scalars,
                              _interpret())
    t = t.reshape(-1)[:R]
    pidx = pidx.reshape(-1)[:R]
    mask = pidx >= 0
    prim = jnp.where(mask, cs.perm[jnp.clip(pidx, 0)], 0).astype(jnp.int32)
    t = jnp.where(mask, t, jnp.inf)
    # u, v recomputed for the R winners only (keeps the kernel loop lean;
    # identical formulas -> identical values).
    tw, uw, vw = _winner_tuv(soup.p0[prim], soup.e1[prim], soup.e2[prim],
                             soup.n[prim], eye, dirs)
    u = jnp.where(mask, uw, 0.0)
    v = jnp.where(mask, vw, 0.0)
    del tw
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


def closest_hit_common_origin(soup: TriangleSoup, eye, dirs) -> Hit:
    """Closest hit of normalized ``dirs`` rays all starting at ``eye``."""
    return _closest_hit(soup.p0, soup.e1, soup.e2, soup.n, eye, dirs)


def _any_kernel(sc_ref, cnt_ref, list_ref, f_ref, skip_ref, w_ref, occ_ref):
    tmin = sc_ref[0, 0]
    tmax = sc_ref[0, 1]
    count = cnt_ref[0, 0, 0]
    f = f_ref[0]                        # (R, 9): [d, d x o, o]
    occ_ref[0, 0, :] = skip_ref[0, 0, :]

    del tmin, tmax  # tmin = 0 / tmax = inf are the sign tests below

    def body(k, _):
        cid = list_ref[0, 0, k]
        wj = w_ref[cid]                 # (4, Kp, C)
        nu, nv, nd, nt = _mt_channels(wj, f, 9)
        acc = _accept_sign(nu, nv, nd, nt)  # t in [0, inf): sign test only
        hit_any = jnp.any(acc, axis=1).astype(jnp.int32)
        occ_ref[0, 0, :] = occ_ref[0, 0, :] | hit_any
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _any_pallas(feats_tiled, skip_tiled, weights, lists, counts, scalars,
                interpret):
    n_tiles, R, _ = feats_tiled.shape
    n_c = weights.shape[0]
    return pl.pallas_call(
        _any_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
        interpret=interpret,
    )(scalars, counts, lists, feats_tiled, skip_tiled, weights)


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
    cs = cl.build_clusters(soup)
    dirs_tiled = _tile_rays(dirs, TILE)
    _, counts = _tile_cluster_lists(cs.lo - eye, cs.hi - eye, dirs_tiled)
    steps = jnp.sum(counts)
    return steps, steps * TILE * cs.cluster_size


def traversal_counts_any(soup: TriangleSoup, origin_shift, origins, dirs,
                         skip=None):
    """(traversal_steps, intersections) for a generic-origin wavefront."""
    soup, origin_shift, origins, dirs = jax.lax.stop_gradient(
        (soup, origin_shift, origins, dirs))
    cs = cl.build_clusters(soup)
    lo = cs.lo - origin_shift
    hi = cs.hi - origin_shift
    if skip is None:
        skip = jnp.zeros(dirs.shape[:1], bool)
    _, counts = _tile_cluster_lists(
        lo, hi, _tile_rays(dirs, TILE),
        _tile_rays(origins - origin_shift, TILE), _tile_rays(~skip, TILE))
    steps = jnp.sum(counts)
    return steps, steps * TILE * cs.cluster_size


def any_hit(soup: TriangleSoup, origin_shift, origins, dirs, skip=None):
    """Occlusion test: True where a ray (origins[i], dirs[i]) hits anything.

    ``origin_shift`` recenters the world for conditioning (see
    ceres_tpu.ops.intersect docstring); ``skip`` marks rays whose answer is
    irrelevant (no primary hit) so they generate no traversal work.
    Boolean, intentionally non-differentiable (detached visibility).
    """
    p0, e1, e2, n, shift, origins, dirs = jax.lax.stop_gradient(
        (soup.p0, soup.e1, soup.e2, soup.n, origin_shift, origins, dirs))
    R = dirs.shape[0]
    cs = cl.build_clusters(TriangleSoup(p0=p0, e1=e1, e2=e2, n=n))
    w = _pack_weights(cl.cluster_weights_generic(cs, shift))
    lo = cs.lo - shift
    hi = cs.hi - shift
    o = origins - shift
    if skip is None:
        skip = jnp.zeros((R,), bool)
    dirs_tiled = _tile_rays(dirs, TILE)
    orig_tiled = _tile_rays(o, TILE)
    alive = _tile_rays(~skip, TILE)
    lists, counts = _tile_cluster_lists(lo, hi, dirs_tiled, orig_tiled, alive)
    feats = jnp.concatenate([dirs, jnp.cross(dirs, o), o], axis=-1)  # (R, 9)
    scalars = jnp.array([[0.0, _BIG]], jnp.float32)
    occ = _any_pallas(
        _tile_rays(feats, TILE),
        _tile_rays(skip.astype(jnp.int32), TILE)[:, None, :],
        w, lists, counts, scalars, _interpret(),
    )
    return (occ.reshape(-1)[:R] == 1) & ~skip
