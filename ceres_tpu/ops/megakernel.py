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

    LAYOUT: every tensor op is (n_t, N_c)-shaped — tiles on sublanes,
    clusters on lanes — with the xyz axis UNROLLED in Python. Putting the
    3-vector on the lane axis instead (the naive (n_t, N_c, 3) form) pads
    3 -> 128 lanes and wastes 42x of the VPU; measured 70 ms/frame vs ~2.
    An origin hull folds into the box corners (box - [olo, ohi] is just a
    wider box), so generic rays cost the same 4 corner products per axis
    as common-origin rays.
    """
    empty = jnp.any(hi < lo, axis=-1)[None, :]       # (1, N_c) treelet pad
    tn = None
    tf = None
    for a in range(3):
        la = lo[None, :, a]                          # (1, N_c)
        ha = hi[None, :, a]
        if olo is not None:
            la = la - ohi[:, a : a + 1]              # (n_t, N_c)
            ha = ha - olo[:, a : a + 1]
        ia = _safe_inverse(dlo[:, a : a + 1])        # (n_t, 1)
        ib = _safe_inverse(dhi[:, a : a + 1])
        c0 = la * ia
        c1 = la * ib
        c2 = ha * ia
        c3 = ha * ib
        emin = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
        emax = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
        straddle = (dlo[:, a : a + 1] < 0) & (dhi[:, a : a + 1] > 0)
        emin = jnp.where(straddle, -_BIG, emin)
        emax = jnp.where(straddle, _BIG, emax)
        tn = emin if tn is None else jnp.maximum(tn, emin)
        tf = emax if tf is None else jnp.minimum(tf, emax)
    tn = jnp.maximum(tn, 0.0)
    hit = tn * (1.0 - _ULP_PAD) <= jnp.minimum(tf, _BIG) * (1.0 + _ULP_PAD)
    # Empty clusters (inf/-inf sentinel boxes from treelet padding) would
    # pass the inf-arithmetic test; mask them out explicitly.
    hit = hit & ~empty
    return jnp.where(hit, tn, _BIG)


def _hull(cols, alive):
    """3-tuple of (n_t, R) ray columns -> per-tile (lo, hi) hulls (n_t, 3).

    Axis-unrolled so every reduction is (n_t, R)-shaped (R on lanes); the
    naive masked min/max over (n_t, R, 3) puts the 3-vector on the lane
    axis (3 -> 128 padding, 42x VPU waste)."""
    los = []
    his = []
    for a in range(3):
        xa = cols[a]                                 # (n_t, R)
        los.append(jnp.where(alive, xa, _BIG).min(axis=1))
        his.append(jnp.where(alive, xa, -_BIG).max(axis=1))
    return jnp.stack(los, axis=-1), jnp.stack(his, axis=-1)


def _tile_cluster_lists(lo, hi, dirs_tiled, origins_tiled=None, alive=None):
    """Per-tile candidate cluster lists, sorted FRONT TO BACK.

    dirs_tiled: 3-tuple of (n_tiles, R) direction columns (origins_tiled
    likewise). Returns (lists (n_tiles, N_c) int32 with candidate ids
    first in ascending entry-bound order, entry (n_tiles, N_c) f32
    matching bounds (+_BIG past count), counts (n_tiles,) int32).
    """
    if alive is None:
        alive = (dirs_tiled[0] * dirs_tiled[0] + dirs_tiled[1] * dirs_tiled[1]
                 + dirs_tiled[2] * dirs_tiled[2]) > 0.0

    dlo, dhi = _hull(dirs_tiled, alive)
    if origins_tiled is None:
        tn = _interval_entry(lo, hi, dlo, dhi)
    else:
        olo, ohi = _hull(origins_tiled, alive)
        tn = _interval_entry(lo, hi, dlo, dhi, olo, ohi)
    # Tiles with no alive rays (all padding / all skipped) get nothing.
    tn = jnp.where(jnp.any(alive, axis=1)[:, None], tn, _BIG)
    counts = jnp.sum(tn < _VALID_CUT, axis=1).astype(jnp.int32)
    order = jnp.argsort(tn, axis=1, stable=True)
    lists = order.astype(jnp.int32)
    entry = jnp.take_along_axis(tn, order, axis=1)
    return lists, entry, counts


def _ray_tcap(root_lo, root_hi, origin_cols, dir_cols):
    """Per-ray visit cap: exit distance from the scene's root AABB.

    Every cluster box lies inside the root box, so a ray's slab entry to
    any cluster is <= its exit from the root. A ray that found no hit is
    therefore DONE once the walk passes its root exit — the fix for the
    background-pixel worst case (a miss ray no longer pins the tile's
    prune at +inf). Rays that miss the root entirely (or are padding) get
    a negative cap and never extend the walk. origin_cols=None means the
    common-origin wavefront with pre-shifted boxes.

    Rays come in COLUMN form (3 separate (R,) arrays): every op here is a
    flat (R,) vector op — an (R, 3) form puts the 3-vector on the lane
    axis and wastes 42x of the VPU.
    """
    tn = None
    tf = None
    alive = None
    for a in range(3):
        d = dir_cols[a]
        inv = _safe_inverse(d)
        if origin_cols is None:
            t0 = root_lo[a] * inv
            t1 = root_hi[a] * inv
        else:
            t0 = (root_lo[a] - origin_cols[a]) * inv
            t1 = (root_hi[a] - origin_cols[a]) * inv
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        tn = near if tn is None else jnp.maximum(tn, near)
        tf = far if tf is None else jnp.minimum(tf, far)
        sq = d * d
        alive = sq if alive is None else alive + sq
    tn = jnp.maximum(tn, 0.0)
    hit = (tn * (1.0 - _ULP_PAD) <= tf * (1.0 + _ULP_PAD)) & (alive > 0.0)
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

        e = entry_ref[m]
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

        e = entry_ref[m]
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
    vmem_out = pl.BlockSpec(
        (1, 1, TILE), lambda m, tid, cid, ent: (tid[m], 0, 0),
        memory_space=pltpu.VMEM)
    smem_out = pl.BlockSpec((1, 1), lambda m, tid, cid, ent: (0, 0),
                            memory_space=pltpu.SMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # tile ids, cluster ids, entry bounds
        grid=(m_cap,),
        in_specs=[
            pl.BlockSpec((1, TILE, Kp),
                         lambda m, tid, cid, ent: (tid[m], 0, 0),
                         memory_space=pltpu.VMEM),            # ray features
            pl.BlockSpec((1, 1, TILE),
                         lambda m, tid, cid, ent: (tid[m], 0, 0),
                         memory_space=pltpu.VMEM),            # root-exit cap
            pl.BlockSpec((1, 1, TILE),
                         lambda m, tid, cid, ent: (tid[m], 0, 0),
                         memory_space=pltpu.VMEM),            # carried state
            pl.BlockSpec((1, Kp, C4),
                         lambda m, tid, cid, ent: (cid[m], 0, 0),
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
    )(tile_ids, cluster_ids, entry_m, feats, tcap, t_in, w)


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
    )(tile_ids, cluster_ids, entry_m, feats, tcap, occ_in, w)


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


def _cols(x):
    """(R, 3) array or 3-tuple of (R,) columns -> 3-tuple of columns.

    The public entry points accept either form; everything internal runs
    on flat (R,) columns (structure-of-arrays) because (R, 3) arrays put
    the 3-vector on the 128-lane axis and waste 42x of the VPU.
    """
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x[..., 0], x[..., 1], x[..., 2])


def _feats_from_cols(cols, kp):
    """Per-ray feature columns -> (R, kp): [cols..., 1, zero padding]."""
    R = cols[0].shape[0]
    arrs = list(cols) + [jnp.ones((R,), cols[0].dtype)]
    if kp > len(arrs):
        zero = jnp.zeros((R,), cols[0].dtype)
        arrs.extend([zero] * (kp - len(arrs)))
    return jnp.stack(arrs, axis=-1)


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

def _closest_search(cs, eye, dir_cols):
    """Detached winner search: packed slot ids + counters (no gradients)."""
    cs, eye, dir_cols = jax.lax.stop_gradient((cs, eye, dir_cols))
    R = dir_cols[0].shape[0]
    w = _pack_weights(cl.cluster_weights_common_origin(cs, eye))
    lo = cs.lo - eye
    hi = cs.hi - eye
    root_lo, root_hi = _scene_root(cs)
    dirs_tiled = tuple(_tile_rays(c, TILE) for c in dir_cols)
    feats_tiled = _tile_rays(_feats_from_cols(dir_cols, w.shape[1]), TILE)
    tcap_tiled = _tile_rays(
        _ray_tcap(root_lo - eye, root_hi - eye, None, dir_cols),
        TILE)[:, None, :]
    lists, entry, counts = _tile_cluster_lists(lo, hi, dirs_tiled)
    _, pidx, steps, visits = _closest_rounds(
        w, feats_tiled, tcap_tiled, lists, entry, counts, n_feat=4)
    return pidx.reshape(-1)[:R], {"traversal_steps": steps,
                                  "mt_block_visits": visits}


def _winner_tuv(rec, eye, dir_cols):
    """Reference Möller-Trumbore at (ray, winning triangle) pairs.

    Exactly triangle.hpp:95-115 with c = p0 - eye, evaluated only at the R
    winners instead of through the R x T search — this is where gradients
    of (t, u, v) w.r.t. vertices / camera / ray directions come from.
    ``rec`` is the (R, >=12) gathered winner table [p0, e1, e2, n, ...];
    all math is column (R,) ops.
    """
    p0 = (rec[:, 0], rec[:, 1], rec[:, 2])
    e1 = (rec[:, 3], rec[:, 4], rec[:, 5])
    e2 = (rec[:, 6], rec[:, 7], rec[:, 8])
    n = (rec[:, 9], rec[:, 10], rec[:, 11])
    d = dir_cols
    c = tuple(p0[a] - eye[a] for a in range(3))
    r = (d[1] * c[2] - d[2] * c[1],
         d[2] * c[0] - d[0] * c[2],
         d[0] * c[1] - d[1] * c[0])
    det = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
    # det == 0 can only occur at non-winner (masked) rays — the kernel's
    # accept requires det != 0 — but an unprotected 1/0 there would poison
    # gradients through the final jnp.where (0 cotangent x inf partial).
    inv = 1.0 / jnp.where(det != 0, det, 1.0)
    u = (r[0] * e2[0] + r[1] * e2[1] + r[2] * e2[2]) * inv
    v = (r[0] * e1[0] + r[1] * e1[1] + r[2] * e1[2]) * inv
    t = (n[0] * c[0] + n[1] * c[1] + n[2] * c[2]) * inv
    return t, u, v


def _winner_table(soup: TriangleSoup, cs, payload):
    """(N_c * C, 13 + P) packed winner table in cluster-slot order.

    Row ``slot`` holds [p0, e1, e2, n, perm_bits, payload...] of the
    triangle stored at that slot, so ONE row gather by the kernel's packed
    winner id serves the differentiable (t, u, v) recompute, the original
    triangle id (perm as f32 bits — a separate s32 gather by original id
    lowers to a 15 ms/frame scalar-loop custom call), and any per-triangle
    shading payload. Built from ``soup`` (NOT the stop-gradiented cluster
    arrays) so gradients flow to vertices through the gather.
    """
    src = jnp.clip(cs.perm, 0)
    valid = (cs.perm >= 0)[:, None]
    tri12 = jnp.concatenate([soup.p0, soup.e1, soup.e2, soup.n], axis=-1)
    parts = [jnp.where(valid, tri12[src], 0.0),
             jax.lax.bitcast_convert_type(cs.perm, jnp.float32)[:, None]]
    if payload is not None:
        parts.append(jnp.where(valid, payload[src], 0.0))
    return jnp.concatenate(parts, axis=-1)


def closest_hit_common_origin(soup: TriangleSoup, eye, dirs, clusters=None,
                              with_counts=False, payload=None):
    """Closest hit of normalized ``dirs`` rays all starting at ``eye``.

    ``dirs`` is (R, 3) or a 3-tuple of (R,) columns (the fast form — all
    internal math is structure-of-arrays). With ``clusters`` (a prebuilt
    ClusterSet for this exact soup) the acceleration-structure build is
    skipped — the fast lane for frame loops over static geometry. Fully
    differentiable either way: the structure only drives the detached
    winner search; (t, u, v) come from a plain-JAX Möller-Trumbore
    recomputation at the winners, gathered from ``soup`` by original
    triangle id.

    ``payload`` ((T, P) per-triangle rows, e.g. shading normals) rides the
    winner gather: returns (hit, payload_rows (R, P)) with zero rows at
    misses. ``with_counts=True`` additionally returns the traversal
    counters (actual kernel work-list steps and prune-gated MT block
    executions) — the SingleRayTraverser::Statistics capability
    (single_ray_traverser.hpp:131-163), measured, not scheduled.
    """
    dir_cols = _cols(dirs)
    cs = clusters
    if cs is None:
        cs = cl.build_clusters_treelet(
            jax.tree.map(jax.lax.stop_gradient, soup))
    pidx, counts = _closest_search(cs, eye, dir_cols)
    mask = pidx >= 0
    table = _winner_table(soup, cs, payload)
    rec = table[jnp.clip(pidx, 0)]               # ONE (R, 13+P) row gather
    prim = jnp.where(
        mask, jax.lax.bitcast_convert_type(rec[:, 12], jnp.int32), 0)
    t, u, v = _winner_tuv(rec, eye, dir_cols)
    hit = Hit(t=jnp.where(mask, t, jnp.inf),
              u=jnp.where(mask, u, 0.0),
              v=jnp.where(mask, v, 0.0),
              prim_id=prim, mask=mask)
    out = (hit,) if payload is None else (hit, rec[:, 13:])
    if with_counts:
        counts["mt_pairs"] = (counts["mt_block_visits"]
                              * TILE * cs.cluster_size)
        out = out + (counts,)
    return out[0] if len(out) == 1 else out


def any_hit(soup: TriangleSoup, origin_shift, origins, dirs, skip=None,
            clusters=None, with_counts=False):
    """Occlusion test: True where a ray (origins[i], dirs[i]) hits anything.

    ``origins``/``dirs`` are (R, 3) or 3-tuples of (R,) columns.
    ``origin_shift`` recenters the world for conditioning (see
    ceres_tpu.ops.intersect docstring); ``skip`` marks rays whose answer is
    irrelevant (no primary hit) so they generate no traversal work.
    ``clusters`` skips the structure build (see closest_hit_common_origin).
    Boolean, intentionally non-differentiable (detached visibility).
    ``with_counts=True`` additionally returns the measured traversal
    counters.
    """
    soup, shift, o_cols, d_cols = jax.lax.stop_gradient(
        (soup, origin_shift, _cols(origins), _cols(dirs)))
    R = d_cols[0].shape[0]
    if clusters is None:
        cs = cl.build_clusters_treelet(soup)
    else:
        cs = jax.tree.map(jax.lax.stop_gradient, clusters)
    w = _pack_weights(cl.cluster_weights_generic(cs, shift))
    lo = cs.lo - shift
    hi = cs.hi - shift
    root_lo, root_hi = _scene_root(cs)
    o = tuple(o_cols[a] - shift[a] for a in range(3))
    if skip is None:
        skip = jnp.zeros((R,), bool)
    dirs_tiled = tuple(_tile_rays(c, TILE) for c in d_cols)
    orig_tiled = tuple(_tile_rays(c, TILE) for c in o)
    alive = _tile_rays(~skip, TILE) & (
        (dirs_tiled[0] * dirs_tiled[0] + dirs_tiled[1] * dirs_tiled[1]
         + dirs_tiled[2] * dirs_tiled[2]) > 0.0)
    dxo = (d_cols[1] * o[2] - d_cols[2] * o[1],
           d_cols[2] * o[0] - d_cols[0] * o[2],
           d_cols[0] * o[1] - d_cols[1] * o[0])
    feats_tiled = _tile_rays(
        _feats_from_cols(d_cols + dxo + o, w.shape[1]), TILE)
    tcap_tiled = _tile_rays(
        _ray_tcap(root_lo - shift, root_hi - shift, o, d_cols),
        TILE)[:, None]
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
