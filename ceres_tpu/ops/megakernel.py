"""Pallas ray-traversal megakernel: cluster-culled Möller-Trumbore.

This is the TPU replacement for the reference's per-ray BVH traversal hot
loop (lib/bvh/single_ray_traverser.hpp:67-126 + triangle.hpp:95-115). The
structure is inverted for a lockstep vector machine:

  * Rays are processed in tiles of ``TILE`` (512) — one grid step per tile.
  * The scene is ``N_c`` morton-ordered clusters of ``C`` (128) triangles
    (ceres_tpu.accel.clusters); their packed MT weight tensors live wholly
    in VMEM, cluster AABBs in SMEM.
  * Per (tile, cluster): a vectorized slab test of all rays against the
    cluster AABB (the FastNodeIntersector test of node_intersectors.hpp:
    83-103, vectorized over rays instead of specialized per octant), with
    the closest-hit ``tmax``-shrinking bound (single_ray_traverser.hpp:59).
    Only when any ray overlaps does the cluster's dense MT evaluation run —
    rank-K broadcast outer products (K = 4 common-origin / 10 generic, see
    ceres_tpu.ops.intersect for the factorization) over an (R, C) tile.
  * Closest hit keeps per-ray (t, u, v, packed id) in the output block;
    any-hit keeps an occlusion mask and early-exits once every ray is done
    (AnyPrimitiveIntersector semantics, primitive_intersectors.hpp:58-76).

Divergence never exists: control flow is two scalar decisions per
(tile, cluster), everything else is dense vector work.

Gradients: ``closest_hit_common_origin`` carries a custom VJP — the
backward pass re-derives the winning (ray, triangle) intersection
analytically in plain JAX and scatters grads to the triangle records and
camera, the standard detached-visibility differentiable-rendering scheme.
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

TILE = 512            # rays per grid step
_BIG = 3.0e37    # "no hit yet" sentinel, finite to keep slab math NaN-free
_INV_CLAMP = 1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _safe_inverse(d):
    """Sign-preserving epsilon-clamped 1/d (reference vector.hpp:69-74)."""
    sign = jnp.where(d >= 0, 1.0, -1.0)
    return jnp.where(jnp.abs(d) < 1e-30, sign * _INV_CLAMP, 1.0 / d)


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


def _decode_update(nu, nv, nd, nt, tmin, t_cur):
    """Accept mask + per-ray closest candidate within one cluster."""
    inv_det = 1.0 / nd
    uu = nu * inv_det
    vv = nv * inv_det
    tt = nt * inv_det
    wbar = 1.0 - uu - vv
    # NaN-safe accept (triangle.hpp:106-110): NaN compares are False.
    acc = (uu >= 0) & (vv >= 0) & (wbar >= 0) & (tt >= tmin) & (tt <= t_cur[:, None])
    tpair = jnp.where(acc, tt, _BIG)
    t_min = jnp.min(tpair, axis=1)                        # (R,)
    C = nu.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, tpair.shape, 1)
    winner = tpair <= t_min[:, None]
    idx = jnp.min(jnp.where(winner, ids, C), axis=1)      # lowest-index winner
    onehot = ids == idx[:, None]
    u_best = jnp.sum(jnp.where(onehot, uu, 0.0), axis=1)
    v_best = jnp.sum(jnp.where(onehot, vv, 0.0), axis=1)
    return t_min, u_best, v_best, idx


def _slab(box_ref, j, o_or_none, inv_d, tmin, t_far):
    """Vectorized ray/AABB slab test -> (R,) overlap mask.

    Entry/exit ordering keeps the robust_min/max NaN semantics of
    node_intersectors.hpp:35-47 by clamping the inverse instead of allowing
    0 * inf.
    """
    tn = jnp.full_like(t_far, tmin)
    tf = t_far
    for a in range(3):
        lo_a = box_ref[a, j]
        hi_a = box_ref[3 + a, j]
        if o_or_none is None:
            t0 = lo_a * inv_d[a]
            t1 = hi_a * inv_d[a]
        else:
            t0 = (lo_a - o_or_none[a]) * inv_d[a]
            t1 = (hi_a - o_or_none[a]) * inv_d[a]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return tn <= tf


# ---------------------------------------------------------------------------
# Closest-hit kernel (common-origin rays: the primary wavefront)
# ---------------------------------------------------------------------------

def _closest_kernel(num_clusters, sc_ref, box_ref, d_ref, w_ref,
                    t_ref, u_ref, v_ref, id_ref):
    tmin = sc_ref[0, 0]
    d = d_ref[0]                      # (R, 3)
    inv_d = [_safe_inverse(d[:, a]) for a in range(3)]

    t_ref[0, 0, :] = jnp.full((d.shape[0],), _BIG)
    u_ref[0, 0, :] = jnp.zeros((d.shape[0],))
    v_ref[0, 0, :] = jnp.zeros((d.shape[0],))
    id_ref[0, 0, :] = jnp.full((d.shape[0],), -1, jnp.int32)

    C = w_ref.shape[3]

    def body(j, _):
        t_cur = t_ref[0, 0, :]
        overlap = _slab(box_ref, j, None, inv_d, tmin, t_cur)

        @pl.when(jnp.any(overlap))
        def _():
            wj = w_ref[j]             # (4, Kp, C)
            nu, nv, nd, nt = _mt_channels(wj, d, 3)
            t_c = t_ref[0, 0, :]
            t_min, u_b, v_b, idx = _decode_update(nu, nv, nd, nt, tmin, t_c)
            better = t_min < t_c
            t_ref[0, 0, :] = jnp.where(better, t_min, t_c)
            u_ref[0, 0, :] = jnp.where(better, u_b, u_ref[0, 0, :])
            v_ref[0, 0, :] = jnp.where(better, v_b, v_ref[0, 0, :])
            id_ref[0, 0, :] = jnp.where(better, j * C + idx, id_ref[0, 0, :])

        return 0

    jax.lax.fori_loop(0, num_clusters, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_pallas(dirs_tiled, weights, boxes, scalars, interpret):
    n_tiles, R, _ = dirs_tiled.shape
    n_c = weights.shape[0]
    kernel = functools.partial(_closest_kernel, n_c)
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
    ]
    out_spec = pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((6, n_c), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, boxes, dirs_tiled, weights)


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
    boxes = jnp.concatenate([cs.lo.T, cs.hi.T], axis=0)  # (6, N_c)
    # Shift boxes by the origin so the kernel's slab test is origin-free.
    boxes = boxes - jnp.concatenate([eye, eye])[:, None]
    scalars = jnp.array([[0.0, 0.0]], jnp.float32)  # tmin, spare
    dirs_tiled = _tile_rays(dirs, TILE)
    t, u, v, pidx = _closest_pallas(dirs_tiled, w, boxes, scalars, _interpret())
    t = t.reshape(-1)[:R]
    u = u.reshape(-1)[:R]
    v = v.reshape(-1)[:R]
    pidx = pidx.reshape(-1)[:R]
    mask = pidx >= 0
    prim = jnp.where(mask, cs.perm[jnp.clip(pidx, 0)], 0).astype(jnp.int32)
    t = jnp.where(mask, t, jnp.inf)
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


# ---------------------------------------------------------------------------
# Any-hit kernel (generic-origin rays: the shadow wavefront)
# ---------------------------------------------------------------------------

def _any_kernel(num_clusters, sc_ref, box_ref, f_ref, skip_ref, w_ref, occ_ref):
    tmin = sc_ref[0, 0]
    tmax = sc_ref[0, 1]
    f = f_ref[0]                        # (R, 9): [d, d x o, o]
    inv_d = [_safe_inverse(f[:, a]) for a in range(3)]
    o = [f[:, 6 + a] for a in range(3)]

    occ_ref[0, 0, :] = skip_ref[0, 0, :]
    R = f.shape[0]
    t_far = jnp.full((R,), tmax)

    def body(j, done):
        @pl.when(jnp.logical_not(done))
        def _():
            occ = occ_ref[0, 0, :]
            overlap = _slab(box_ref, j, o, inv_d, tmin, t_far) & (occ == 0)

            @pl.when(jnp.any(overlap))
            def _():
                wj = w_ref[j]           # (4, Kp, C)
                nu, nv, nd, nt = _mt_channels(wj, f, 9)
                inv_det = 1.0 / nd
                uu = nu * inv_det
                vv = nv * inv_det
                tt = nt * inv_det
                wbar = 1.0 - uu - vv
                acc = ((uu >= 0) & (vv >= 0) & (wbar >= 0)
                       & (tt >= tmin) & (tt <= tmax))
                hit_any = jnp.any(acc, axis=1).astype(jnp.int32)
                occ_ref[0, 0, :] = occ_ref[0, 0, :] | hit_any

        return done | jnp.all(occ_ref[0, 0, :] == 1)

    jax.lax.fori_loop(0, num_clusters, body, False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _any_pallas(feats_tiled, skip_tiled, weights, boxes, scalars, interpret):
    n_tiles, R, _ = feats_tiled.shape
    n_c = weights.shape[0]
    kernel = functools.partial(_any_kernel, n_c)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((6, n_c), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 9), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
        interpret=interpret,
    )(scalars, boxes, feats_tiled, skip_tiled, weights)


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
    boxes = jnp.concatenate([cs.lo.T, cs.hi.T], axis=0)
    boxes = boxes - jnp.concatenate([shift, shift])[:, None]
    o = origins - shift
    feats = jnp.concatenate([dirs, jnp.cross(dirs, o), o], axis=-1)  # (R, 9)
    if skip is None:
        skip = jnp.zeros((R,), bool)
    scalars = jnp.array([[0.0, _BIG]], jnp.float32)
    occ = _any_pallas(
        _tile_rays(feats, TILE),
        _tile_rays(skip.astype(jnp.int32), TILE)[:, None, :],
        w, boxes, scalars, _interpret(),
    )
    return (occ.reshape(-1)[:R] == 1) & ~skip
