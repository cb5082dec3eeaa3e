"""Pallas ray-traversal megakernel: work-list-scheduled Möller-Trumbore.

TPU replacement for the reference's per-ray BVH traversal hot loop
(lib/bvh/single_ray_traverser.hpp:67-126 + triangle.hpp:95-115), inverted
for a lockstep vector machine and split into three phases:

  1. **Interval culling prepass (pure JAX).** Rays arrive in spatially
     coherent 512-ray pixel-block tiles (ceres_tpu.utils.tiling). Each
     tile is summarized by interval hulls of its ray directions (and
     origins, for generic rays); every (tile, cluster) pair is culled
     with one conservative interval-arithmetic slab test — O(tiles x
     clusters) with NO ray dimension. Survivors are compacted per tile
     and sorted FRONT TO BACK by a lower bound of the tile entry distance
     (the tile analog of descend-nearer-first,
     single_ray_traverser.hpp:95-113).
  2. **Work-list scheduling (pure JAX).** Surviving (tile, cluster) pairs
     are compacted into a flat, tile-major work list of at most M_CAP
     entries per round. Pairs whose entry bound exceeds the tile's prune
     distance — max over rays of min(closest hit so far, scene-root exit)
     — are dropped: the traverser's tmax-shrink pruning
     (single_ray_traverser.hpp:59) without the background-pixel worst
     case (a miss ray is done at its root-box exit). If one round's
     budget doesn't cover the live set, further rounds re-cull against
     the improved prune (a `lax.while_loop`; real scenes take 1-2).
  3. **Intersection kernel (Pallas, scalar-prefetch work list).** ONE
     grid step per (tile, cluster) pair: the block index maps read the
     prefetched tile/cluster ids, so the pipeline streams each cluster's
     MT weight slab HBM -> VMEM double-buffered with no scalar stalls and
     no whole-scene VMEM residency (scene size is unbounded). Each step
     evaluates all R x C x 4 MT numerators — (R, K) @ (K, 4C) as K
     broadcast-FMA lane passes on the VPU (exact f32; K is 4 or 10, far
     too thin to feed the MXU) — with a branch-free sign-test epilogue
     keeping per-ray closest (t, packed id). Steps whose entry bound
     passed the tile's prune (maintained in SMEM as hits land) skip the
     math. Tile-major ordering means each tile's output block stays in
     VMEM across its steps and is written back exactly once.

Gradients flow with NO custom VJP: the kernel only *finds* winner ids
(integers, detached by construction — the standard differentiable-
rendering visibility convention), and (t, u, v) are recomputed at the R
winners by plain-JAX Möller-Trumbore (triangle.hpp:95-115), which JAX
differentiates w.r.t. triangle records, camera eye, and ray directions.
This also makes the prebuilt-``clusters`` fast lane fully differentiable:
the structure is only used for the detached search.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ceres_tpu.accel import clusters as cl
from ceres_tpu.models.mesh import TriangleSoup
from ceres_tpu.ops.intersect import Hit

TILE = 512         # rays per grid step (= one 16 x 32 pixel block)

_BIG = 3.0e37      # "no hit yet" sentinel, finite to keep slab math NaN-free
_VALID_CUT = 1.0e37  # entries >= this are padding, never real candidates
_INV_CLAMP = 1e30
_PREPASS_TILES = 256  # tiles per chunk in the interval culling prepass
_M_CAP_FACTOR = 2     # work-list entries per round = factor * n_tiles
_ULP_PAD = 4e-6       # conservative slab widening (RobustNodeIntersector,
                      # node_intersectors.hpp:54-79: never cull a true hit)
USE_MXU = False       # MT numerators: VPU broadcast-FMA (exact f32) vs MXU


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _safe_inverse(d):
    """Sign-preserving epsilon-clamped 1/d (reference vector.hpp:69-74)."""
    sign = jnp.where(d >= 0, 1.0, -1.0)
    return jnp.where(jnp.abs(d) < 1e-30, sign * _INV_CLAMP, 1.0 / d)


# ---------------------------------------------------------------------------
# Phase 1: interval culling prepass (pure JAX)
# ---------------------------------------------------------------------------

def _interval_entry(lo, hi, dlo, dhi, olo=None, ohi=None):
    """Conservative slab test of a ray BUNDLE hull against cluster boxes.

    lo, hi: (N_c, 3) cluster AABBs. dlo/dhi (n_t, 3): per-tile direction
    interval hull; olo/ohi: origin hull (None = common origin at 0, boxes
    pre-shifted). Returns (n_t, N_c) f32: a LOWER bound of any member
    ray's slab entry distance where overlap is possible, +_BIG where NO
    member ray can overlap. Interval arithmetic over the corner products
    of (box - o) * (1/d); axes whose direction interval straddles zero are
    unrestrictive (their 1/d is not an interval). Conservative by
    construction — pruning in the kernel is against per-ray exact hit
    distances, so looseness only costs scheduled (skippable) visits.
    """
    inv_a = _safe_inverse(dlo)[:, None, :]           # (n_t, 1, 3)
    inv_b = _safe_inverse(dhi)[:, None, :]
    straddle = ((dlo < 0) & (dhi > 0))[:, None, :]   # (n_t, 1, 3)

    if olo is None:
        n_lo = lo[None]                              # (1, N_c, 3) both ends
        n_hi = hi[None]
        corners = (n_lo * inv_a, n_lo * inv_b, n_hi * inv_a, n_hi * inv_b)
    else:
        nl1 = lo[None] - ohi[:, None, :]
        nl2 = lo[None] - olo[:, None, :]
        nh1 = hi[None] - ohi[:, None, :]
        nh2 = hi[None] - olo[:, None, :]
        corners = (nl1 * inv_a, nl1 * inv_b, nl2 * inv_a, nl2 * inv_b,
                   nh1 * inv_a, nh1 * inv_b, nh2 * inv_a, nh2 * inv_b)

    emin = functools.reduce(jnp.minimum, corners)
    emax = functools.reduce(jnp.maximum, corners)
    emin = jnp.where(straddle, -_BIG, emin)
    emax = jnp.where(straddle, _BIG, emax)
    tn = jnp.maximum(emin.max(axis=-1), 0.0)         # (n_t, N_c)
    tf = emax.min(axis=-1)
    hit = tn * (1.0 - _ULP_PAD) <= jnp.minimum(tf, _BIG) * (1.0 + _ULP_PAD)
    # Empty clusters (inf/-inf sentinel boxes from treelet padding) would
    # pass the inf-arithmetic test; mask them out explicitly.
    hit = hit & jnp.all(hi >= lo, axis=-1)[None, :]
    return jnp.where(hit, tn, _BIG)


def _hull(x, alive):
    """(n_t, R, 3) -> per-tile (lo, hi) hulls over alive rays."""
    am = alive[..., None]
    return (jnp.where(am, x, _BIG).min(axis=1),
            jnp.where(am, x, -_BIG).max(axis=1))


def _tile_cluster_lists(lo, hi, dirs_tiled, origins_tiled=None, alive=None):
    """Per-tile candidate cluster lists, sorted FRONT TO BACK.

    dirs_tiled: (n_tiles, R, 3). Returns (lists (n_tiles, N_c) int32 with
    candidate ids first in ascending entry-bound order, entry
    (n_tiles, N_c) f32 matching bounds (+_BIG past count), counts
    (n_tiles,) int32). Chunked over tiles to bound the live set.
    """
    n_tiles = dirs_tiled.shape[0]
    if alive is None:
        alive = jnp.sum(dirs_tiled * dirs_tiled, axis=-1) > 0.0
    pad = (-n_tiles) % _PREPASS_TILES

    def padt(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    dirs_p = padt(dirs_tiled).reshape(
        (-1, _PREPASS_TILES) + dirs_tiled.shape[1:])
    alive_p = padt(alive).reshape(dirs_p.shape[:3])
    if origins_tiled is not None:
        orig_p = padt(origins_tiled).reshape(dirs_p.shape)

    def chunk_fn(args):
        if origins_tiled is None:
            d, a = args
            dlo, dhi = _hull(d, a)
            e = _interval_entry(lo, hi, dlo, dhi)
        else:
            d, o, a = args
            dlo, dhi = _hull(d, a)
            olo, ohi = _hull(o, a)
            e = _interval_entry(lo, hi, dlo, dhi, olo, ohi)
        # Tiles with no alive rays (all padding / all skipped) get nothing.
        return jnp.where(jnp.any(a, axis=1)[:, None], e, _BIG)

    if origins_tiled is None:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, alive_p))
    else:
        per_tile = jax.lax.map(chunk_fn, (dirs_p, orig_p, alive_p))

    tn = per_tile.reshape(-1, lo.shape[0])[:n_tiles]       # (n_tiles, N_c)
    counts = jnp.sum(tn < _VALID_CUT, axis=1).astype(jnp.int32)
    order = jnp.argsort(tn, axis=1, stable=True)
    lists = order.astype(jnp.int32)
    entry = jnp.take_along_axis(tn, order, axis=1)
    return lists, entry, counts


def _ray_tcap(root_lo, root_hi, origins, dirs):
    """Per-ray visit cap: exit distance from the scene's root AABB.

    Every cluster box lies inside the root box, so a ray's slab entry to
    any cluster is <= its exit from the root. A ray that found no hit is
    therefore DONE once the walk passes its root exit — the fix for the
    background-pixel worst case (a miss ray no longer pins the tile's
    prune at +inf). Rays that miss the root entirely (or are padding) get
    a negative cap and never extend the walk. origins=None means the
    common-origin wavefront with pre-shifted boxes.
    """
    inv = _safe_inverse(dirs)
    if origins is None:
        t0 = root_lo * inv
        t1 = root_hi * inv
    else:
        t0 = (root_lo - origins) * inv
        t1 = (root_hi - origins) * inv
    tn = jnp.maximum(jnp.minimum(t0, t1).max(axis=-1), 0.0)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    alive = jnp.sum(dirs * dirs, axis=-1) > 0.0
    hit = (tn * (1.0 - _ULP_PAD) <= tf * (1.0 + _ULP_PAD)) & alive
    return jnp.where(hit, tf * (1.0 + _ULP_PAD), -1.0)


# ---------------------------------------------------------------------------
# Phase 2: work-list scheduling (pure JAX)
# ---------------------------------------------------------------------------

def _m_cap(n_tiles: int, n_c: int) -> int:
    """Static per-round work-list budget: ~_M_CAP_FACTOR visits per tile
    amortizes the compaction over real work; rounds absorb overflow."""
    return min(max(512, _M_CAP_FACTOR * n_tiles), n_tiles * n_c)


def _round_schedule(lists, entry, counts, cursor, prune, m_cap: int):
    """Compact the live (tile, cluster) pairs into one round's work list.

    A pair (i, k) is live iff cursor_i <= k < counts_i and
    entry[i, k] <= prune_i; entries are sorted ascending per tile, so the
    live span is contiguous from the cursor. The first m_cap live pairs in
    tile-major order are scheduled (tile-major = each tile's kernel output
    block is visited by one contiguous run of grid steps). Tiles whose
    live span was exhausted (not quota-truncated) are DONE — the prune
    only ever decreases, so their remaining entries can never come back.

    Returns (tile_of (M,), cid (M,), entry_m (M,), take (n_tiles,),
    new_cursor (n_tiles,), scheduled_live_total).
    """
    n_tiles, n_c = entry.shape
    s = jnp.sum(entry <= prune[:, None], axis=1).astype(jnp.int32)
    n_live = jnp.clip(s - cursor, 0, counts - cursor)
    off = jnp.cumsum(n_live) - n_live                       # exclusive
    take = jnp.clip(m_cap - off, 0, n_live)
    cum_take = jnp.cumsum(take)
    total_take = cum_take[-1]

    m = jnp.arange(m_cap, dtype=jnp.int32)
    tile_of = jnp.searchsorted(cum_take, m, side="right").astype(jnp.int32)
    tile_of = jnp.minimum(tile_of, n_tiles - 1)
    start = cum_take[tile_of] - take[tile_of]
    slot = jnp.clip(cursor[tile_of] + (m - start), 0, n_c - 1)
    valid = m < total_take
    entry_m = jnp.where(valid, entry[tile_of, slot], _BIG)
    cid = jnp.where(valid, lists[tile_of, slot], 0)
    new_cursor = jnp.where(take == n_live, counts, cursor + take)
    return tile_of, cid, entry_m, take, new_cursor, jnp.sum(n_live)


def _pending(entry, counts, cursor, prune):
    """True if any (tile, cluster) pair is still live for another round."""
    s = jnp.sum(entry <= prune[:, None], axis=1).astype(jnp.int32)
    n_live = jnp.clip(s - cursor, 0, counts - cursor)
    return jnp.sum(n_live) > 0


# ---------------------------------------------------------------------------
# Phase 3: Pallas work-list kernels
# ---------------------------------------------------------------------------

def _numerators(f, wj, n_feat: int):
    """All R x C x 4 MT numerators of one (ray tile, cluster) pair.

    f: (R, Kp) per-ray features ([d, 1] or [d, d x o, o, 1], zero-padded);
    wj: (Kp, 4C) the cluster's weight slab (channels side by side along
    lanes — the bilinear MT factorization, ceres_tpu.ops.intersect). The
    contraction depth n_feat is 4 or 10 — far below the MXU's 128-deep
    systolic passes — so the default path is n_feat broadcast-FMA lane
    passes on the VPU, exact f32 and ~16x less padded work than an MXU
    HIGHEST-precision pass.
    """
    if USE_MXU:
        return jnp.dot(f, wj, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    acc = f[:, 0:1] * wj[0:1, :]
    for k in range(1, n_feat):
        acc = acc + f[:, k : k + 1] * wj[k : k + 1, :]
    return acc


def _accept_min(nu, nv, nd, nt):
    """Division-free MT accept: u,v,w,t >= 0 as sign tests on numerators.

    u = nu/det >= 0  <=>  nu * sign(det) >= 0 (det != 0), etc; w's numerator
    is det - nu - nv. Reproduces the reference's accept set
    (triangle.hpp:106-110) including its NaN/degenerate rejections, without
    materializing the divisions.
    """
    s = jnp.where(nd >= 0, 1.0, -1.0)
    m = jnp.minimum(jnp.minimum(nu * s, nv * s),
                    jnp.minimum((nd - nu - nv) * s, nt * s))
    return (m >= 0) & (nd != 0)


def _make_closest_kernel(c_size: int, n_feat: int):
    def kernel(tid_ref, cid_ref, entry_ref, f_ref, tcap_ref, t_in_ref,
               w_ref, t_ref, id_ref, steps_ref, visits_ref, prune_ref):
        m = pl.program_id(0)
        first = (m == 0) | (tid_ref[m] != tid_ref[jnp.maximum(m - 1, 0)])
        tcap = tcap_ref[0, 0, :]

        @pl.when(m == 0)
        def _():
            steps_ref[0, 0] = 0
            visits_ref[0, 0] = 0

        @pl.when(first)
        def _():
            t0 = t_in_ref[0, 0, :]
            t_ref[0, 0, :] = t0
            id_ref[0, 0, :] = jnp.full_like(id_ref[0, 0, :], -1)
            prune_ref[0] = jnp.max(jnp.minimum(t0, tcap))

        e = entry_ref[0, 0]
        valid = e < _VALID_CUT
        go = valid & (e <= prune_ref[0])

        @pl.when(go)
        def _():
            out = _numerators(f_ref[0], w_ref[0], n_feat)   # (R, 4C)
            nu = out[:, :c_size]
            nv = out[:, c_size : 2 * c_size]
            nd = out[:, 2 * c_size : 3 * c_size]
            nt = out[:, 3 * c_size :]
            acc = _accept_min(nu, nv, nd, nt)               # implies t >= 0
            inv = 1.0 / jnp.where(nd != 0, nd, 1.0)
            tpair = jnp.where(acc, nt * inv, _BIG)
            t_min = jnp.min(tpair, axis=1)                  # (R,)
            t_c = t_ref[0, 0, :]
            better = t_min < t_c
            ids = jax.lax.broadcasted_iota(jnp.int32, tpair.shape, 1)
            idx = jnp.min(jnp.where(tpair <= t_min[:, None], ids, c_size),
                          axis=1)
            t_new = jnp.where(better, t_min, t_c)
            t_ref[0, 0, :] = t_new
            id_ref[0, 0, :] = jnp.where(
                better, cid_ref[m] * c_size + idx, id_ref[0, 0, :])
            prune_ref[0] = jnp.max(jnp.minimum(t_new, tcap))

        steps_ref[0, 0] += valid.astype(jnp.int32)
        visits_ref[0, 0] += go.astype(jnp.int32)

    return kernel


def _make_any_kernel(c_size: int, n_feat: int):
    def kernel(tid_ref, cid_ref, entry_ref, f_ref, tcap_ref, occ_in_ref,
               w_ref, occ_ref, steps_ref, visits_ref, prune_ref):
        m = pl.program_id(0)
        first = (m == 0) | (tid_ref[m] != tid_ref[jnp.maximum(m - 1, 0)])
        tcap = tcap_ref[0, 0, :]

        @pl.when(m == 0)
        def _():
            steps_ref[0, 0] = 0
            visits_ref[0, 0] = 0

        @pl.when(first)
        def _():
            o0 = occ_in_ref[0, 0, :]
            occ_ref[0, 0, :] = o0
            prune_ref[0] = jnp.max(jnp.where(o0 == 1, -1.0, tcap))

        e = entry_ref[0, 0]
        valid = e < _VALID_CUT
        go = valid & (e <= prune_ref[0])

        @pl.when(go)
        def _():
            out = _numerators(f_ref[0], w_ref[0], n_feat)
            nu = out[:, :c_size]
            nv = out[:, c_size : 2 * c_size]
            nd = out[:, 2 * c_size : 3 * c_size]
            nt = out[:, 3 * c_size :]
            acc = _accept_min(nu, nv, nd, nt)
            hit_any = jnp.any(acc, axis=1).astype(jnp.int32)
            occ_new = occ_ref[0, 0, :] | hit_any
            occ_ref[0, 0, :] = occ_new
            prune_ref[0] = jnp.max(jnp.where(occ_new == 1, -1.0, tcap))

        steps_ref[0, 0] += valid.astype(jnp.int32)
        visits_ref[0, 0] += go.astype(jnp.int32)

    return kernel


def _wl_grid_spec(m_cap, Kp, C4, n_state_out):
    """The shared work-list grid: one step per (tile, cluster) pair.

    Scalar-prefetched tile/cluster ids drive every block index map, so the
    pipeline streams per-step blocks (HBM -> VMEM, double-buffered) with
    no scalar stalls; tile-major ordering keeps each tile's blocks VMEM-
    resident across its contiguous run of steps.
    """
    vmem_out = pl.BlockSpec((1, 1, TILE), lambda m, tid, cid: (tid[m], 0, 0),
                            memory_space=pltpu.VMEM)
    smem_out = pl.BlockSpec((1, 1), lambda m, tid, cid: (0, 0),
                            memory_space=pltpu.SMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # tile ids, cluster ids
        grid=(m_cap,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda m, tid, cid: (m, 0),
                         memory_space=pltpu.SMEM),            # entry bound
            pl.BlockSpec((1, TILE, Kp), lambda m, tid, cid: (tid[m], 0, 0),
                         memory_space=pltpu.VMEM),            # ray features
            pl.BlockSpec((1, 1, TILE), lambda m, tid, cid: (tid[m], 0, 0),
                         memory_space=pltpu.VMEM),            # root-exit cap
            pl.BlockSpec((1, 1, TILE), lambda m, tid, cid: (tid[m], 0, 0),
                         memory_space=pltpu.VMEM),            # carried state
            pl.BlockSpec((1, Kp, C4), lambda m, tid, cid: (cid[m], 0, 0),
                         memory_space=pltpu.VMEM),            # weight slab
        ],
        out_specs=[vmem_out] * n_state_out + [smem_out, smem_out],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )


@functools.partial(jax.jit, static_argnames=("n_feat", "interpret"))
def _closest_round_pallas(tile_ids, cluster_ids, entry_m, feats, tcap, t_in,
                          w, n_feat, interpret):
    n_tiles, R, Kp = feats.shape
    m_cap = tile_ids.shape[0]
    C4 = w.shape[2]
    return pl.pallas_call(
        _make_closest_kernel(C4 // 4, n_feat),
        grid_spec=_wl_grid_spec(m_cap, Kp, C4, n_state_out=2),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_ids, cluster_ids, entry_m[:, None], feats, tcap, t_in, w)


@functools.partial(jax.jit, static_argnames=("n_feat", "interpret"))
def _any_round_pallas(tile_ids, cluster_ids, entry_m, feats, tcap, occ_in,
                      w, n_feat, interpret):
    n_tiles, R, Kp = feats.shape
    m_cap = tile_ids.shape[0]
    C4 = w.shape[2]
    return pl.pallas_call(
        _make_any_kernel(C4 // 4, n_feat),
        grid_spec=_wl_grid_spec(m_cap, Kp, C4, n_state_out=1),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_ids, cluster_ids, entry_m[:, None], feats, tcap, occ_in, w)


# ---------------------------------------------------------------------------
# Drivers: round loops
# ---------------------------------------------------------------------------

def _max_rounds(n_tiles: int, n_c: int, m_cap: int) -> int:
    return int(math.ceil((n_tiles * n_c) / m_cap)) + 1


def _closest_rounds(w, feats_tiled, tcap_tiled, lists, entry, counts,
                    n_feat: int):
    """Run scheduling rounds until no (tile, cluster) pair is live.

    Returns (t (n_tiles, 1, R), packed ids (n_tiles, 1, R), steps, visits).
    """
    n_tiles, n_c = entry.shape
    R = feats_tiled.shape[1]
    m_cap = _m_cap(n_tiles, n_c)
    interp = _interpret()

    def tile_prune(t):
        return jnp.max(jnp.minimum(t[:, 0, :], tcap_tiled[:, 0, :]), axis=1)

    def body(state):
        cursor, t, pid, steps, visits, _, rnd = state
        prune = tile_prune(t)
        tid, cid, entry_m, take, cursor, _ = _round_schedule(
            lists, entry, counts, cursor, prune, m_cap)
        t_r, id_r, s, v = _closest_round_pallas(
            tid, cid, entry_m, feats_tiled, tcap_tiled, t, w, n_feat, interp)
        touched = (take > 0)[:, None, None]
        better = touched & (t_r < t)
        t = jnp.where(better, t_r, t)
        pid = jnp.where(better, id_r, pid)
        pend = _pending(entry, counts, cursor, tile_prune(t))
        return (cursor, t, pid, steps + s[0, 0], visits + v[0, 0], pend,
                rnd + 1)

    def cond(state):
        _, _, _, _, _, pend, rnd = state
        return pend & (rnd < _max_rounds(n_tiles, n_c, m_cap))

    state = (jnp.zeros((n_tiles,), jnp.int32),
             jnp.full((n_tiles, 1, R), _BIG, jnp.float32),
             jnp.full((n_tiles, 1, R), -1, jnp.int32),
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(True), jnp.asarray(0, jnp.int32))
    state = body(state)                       # round 0 always runs
    state = jax.lax.while_loop(cond, body, state)
    _, t, pid, steps, visits, _, _ = state
    return t, pid, steps, visits


def _any_rounds(w, feats_tiled, tcap_tiled, occ0, lists, entry, counts,
                n_feat: int):
    """Occlusion rounds; occ0 (n_tiles, 1, R) int32 (1 = resolved/skip)."""
    n_tiles, n_c = entry.shape
    m_cap = _m_cap(n_tiles, n_c)
    interp = _interpret()

    def tile_prune(occ):
        return jnp.max(jnp.where(occ[:, 0, :] == 1, -1.0,
                                 tcap_tiled[:, 0, :]), axis=1)

    def body(state):
        cursor, occ, steps, visits, _, rnd = state
        prune = tile_prune(occ)
        tid, cid, entry_m, take, cursor, _ = _round_schedule(
            lists, entry, counts, cursor, prune, m_cap)
        occ_r, s, v = _any_round_pallas(
            tid, cid, entry_m, feats_tiled, tcap_tiled, occ, w, n_feat,
            interp)
        touched = (take > 0)[:, None, None]
        occ = jnp.where(touched, occ_r, occ)
        pend = _pending(entry, counts, cursor, tile_prune(occ))
        return (cursor, occ, steps + s[0, 0], visits + v[0, 0], pend,
                rnd + 1)

    def cond(state):
        _, _, _, _, pend, rnd = state
        return pend & (rnd < _max_rounds(n_tiles, n_c, m_cap))

    state = (jnp.zeros((n_tiles,), jnp.int32), occ0,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(True), jnp.asarray(0, jnp.int32))
    state = body(state)
    state = jax.lax.while_loop(cond, body, state)
    _, occ, steps, visits, _, _ = state
    return occ, steps, visits


# ---------------------------------------------------------------------------
# Packing helpers
# ---------------------------------------------------------------------------

def _pack_weights(w):
    """(N_c, 4, C, K) -> (N_c, Kp, 4 * C): the lane-slab layout.

    Channels go side by side along the lane axis so one step's numerators
    come out as [u_num | v_num | det | t_num] slabs; K is zero-padded to a
    sublane multiple (the padded feature entries are zero too, so the
    contraction is unchanged).
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


def _scene_root(cs):
    """Root AABB over the non-empty cluster boxes."""
    nonempty = jnp.all(cs.hi >= cs.lo, axis=-1, keepdims=True)
    root_lo = jnp.where(nonempty, cs.lo, _BIG).min(axis=0)
    root_hi = jnp.where(nonempty, cs.hi, -_BIG).max(axis=0)
    return root_lo, root_hi


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _closest_search(cs, eye, dirs):
    """Detached winner search: packed slot ids + counters (no gradients)."""
    cs, eye, dirs = jax.lax.stop_gradient((cs, eye, dirs))
    R = dirs.shape[0]
    w = _pack_weights(cl.cluster_weights_common_origin(cs, eye))
    lo = cs.lo - eye
    hi = cs.hi - eye
    root_lo, root_hi = _scene_root(cs)
    dirs_tiled = _tile_rays(dirs, TILE)
    feats_tiled = _tile_rays(_pad_feats(dirs, w.shape[1]), TILE)
    tcap_tiled = _tile_rays(
        _ray_tcap(root_lo - eye, root_hi - eye, None, dirs), TILE)[:, None, :]
    lists, entry, counts = _tile_cluster_lists(lo, hi, dirs_tiled)
    _, pidx, steps, visits = _closest_rounds(
        w, feats_tiled, tcap_tiled, lists, entry, counts, n_feat=4)
    return pidx.reshape(-1)[:R], {"traversal_steps": steps,
                                  "mt_block_visits": visits}


def _winner_tuv(p0w, e1w, e2w, nw, eye, d):
    """Reference Möller-Trumbore at (ray, winning triangle) pairs.

    Exactly triangle.hpp:95-115 with c = p0 - eye, evaluated only at the R
    winners instead of through the R x T search — this is where gradients
    of (t, u, v) w.r.t. vertices / camera / ray directions come from.
    """
    c = p0w - eye
    r = jnp.cross(d, c)
    det = jnp.sum(nw * d, axis=-1)
    # det == 0 can only occur at non-winner (masked) rays — the kernel's
    # accept requires det != 0 — but an unprotected 1/0 there would poison
    # gradients through the final jnp.where (0 cotangent x inf partial).
    inv = 1.0 / jnp.where(det != 0, det, 1.0)
    u = jnp.sum(r * e2w, axis=-1) * inv
    v = jnp.sum(r * e1w, axis=-1) * inv
    t = jnp.sum(nw * c, axis=-1) * inv
    return t, u, v


def closest_hit_common_origin(soup: TriangleSoup, eye, dirs, clusters=None,
                              with_counts=False):
    """Closest hit of normalized ``dirs`` rays all starting at ``eye``.

    With ``clusters`` (a prebuilt ClusterSet for this exact soup) the
    acceleration-structure build is skipped — the fast lane for frame
    loops over static geometry. Fully differentiable either way: the
    structure only drives the detached winner search; (t, u, v) come from
    a plain-JAX Möller-Trumbore recomputation at the winners, gathered
    from ``soup`` by original triangle id.

    ``with_counts=True`` additionally returns the traversal counters
    (actual kernel work-list steps and prune-gated MT block executions) —
    the SingleRayTraverser::Statistics capability
    (single_ray_traverser.hpp:131-163), measured, not scheduled.
    """
    cs = clusters
    if cs is None:
        cs = cl.build_clusters_treelet(
            jax.tree.map(jax.lax.stop_gradient, soup))
    pidx, counts = _closest_search(cs, eye, dirs)
    mask = pidx >= 0
    prim = jnp.where(mask, cs.perm[jnp.clip(pidx, 0)], 0).astype(jnp.int32)
    table = jnp.concatenate([soup.p0, soup.e1, soup.e2, soup.n], axis=-1)
    rec = table[prim]                               # one (R, 12) row gather
    t, u, v = _winner_tuv(rec[:, 0:3], rec[:, 3:6], rec[:, 6:9],
                          rec[:, 9:12], eye, dirs)
    hit = Hit(t=jnp.where(mask, t, jnp.inf),
              u=jnp.where(mask, u, 0.0),
              v=jnp.where(mask, v, 0.0),
              prim_id=prim, mask=mask)
    if with_counts:
        counts["mt_pairs"] = (counts["mt_block_visits"]
                              * TILE * cs.cluster_size)
        return hit, counts
    return hit


def any_hit(soup: TriangleSoup, origin_shift, origins, dirs, skip=None,
            clusters=None, with_counts=False):
    """Occlusion test: True where a ray (origins[i], dirs[i]) hits anything.

    ``origin_shift`` recenters the world for conditioning (see
    ceres_tpu.ops.intersect docstring); ``skip`` marks rays whose answer is
    irrelevant (no primary hit) so they generate no traversal work.
    ``clusters`` skips the structure build (see closest_hit_common_origin).
    Boolean, intentionally non-differentiable (detached visibility).
    ``with_counts=True`` additionally returns the measured traversal
    counters.
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
    root_lo, root_hi = _scene_root(cs)
    o = origins - shift
    if skip is None:
        skip = jnp.zeros((R,), bool)
    dirs_tiled = _tile_rays(dirs, TILE)
    orig_tiled = _tile_rays(o, TILE)
    alive = _tile_rays(~skip, TILE) & (
        jnp.sum(dirs_tiled * dirs_tiled, axis=-1) > 0.0)
    feats_tiled = _tile_rays(_pad_feats(
        jnp.concatenate([dirs, jnp.cross(dirs, o), o], axis=-1),  # (R, 9)
        w.shape[1]), TILE)
    tcap_tiled = _tile_rays(
        _ray_tcap(root_lo - shift, root_hi - shift, o, dirs), TILE)[:, None]
    occ0 = _tile_rays(skip.astype(jnp.int32), TILE)[:, None, :]
    # Padding rays are not skipped but have zero dirs -> tcap = -1, so they
    # never extend a tile's prune and never resolve to occluded.
    lists, entry, counts = _tile_cluster_lists(lo, hi, dirs_tiled,
                                               orig_tiled, alive)
    occ, steps, visits = _any_rounds(
        w, feats_tiled, tcap_tiled, occ0, lists, entry, counts, n_feat=10)
    result = (occ.reshape(-1)[:R] == 1) & ~skip
    if with_counts:
        cnts = {"traversal_steps": steps, "mt_block_visits": visits,
                "mt_pairs": visits * TILE * cs.cluster_size}
        return result, cnts
    return result
