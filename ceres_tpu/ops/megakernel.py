"""Pallas ray-traversal megakernel: per-tile front-to-back cluster walk.

TPU replacement for the reference's per-ray BVH traversal hot loop
(lib/bvh/single_ray_traverser.hpp:67-126 + triangle.hpp:95-115), inverted
for a lockstep vector machine and split into two phases:

  1. **Interval culling prepass (pure JAX).** Rays arrive in spatially
     coherent 512-ray pixel-block tiles (ceres_tpu.utils.tiling). Each
     tile is summarized by interval hulls of its ray directions (and
     origins, for generic rays); every (tile, cluster) pair is culled
     with one conservative interval-arithmetic slab test — O(tiles x
     clusters) with NO ray dimension. Survivors are packed into ONE
     sortable int32 key per pair ((entry-bound bits | cluster id) — the
     f32 bit pattern is order-isomorphic to the float for values >= 0)
     and sorted FRONT TO BACK per tile with a single payload-free
     `jnp.sort` (the tile analog of descend-nearer-first,
     single_ray_traverser.hpp:95-113).
  2. **Walk kernel (Pallas).** ONE grid step per ray tile: a while-loop
     walks that tile's sorted candidate list and EXITS as soon as the
     next entry bound exceeds the tile's prune — max over rays of
     min(closest-hit-so-far, scene-root exit) — i.e. the traverser's
     tmax-shrink pruning (single_ray_traverser.hpp:59,95-113) vectorized
     per tile, with the background-pixel worst case capped at the root
     exit. Each visit evaluates all R x C x 4 MT numerators as ONE
     (Kp, R)^T @ (Kp, 4C) `dot_general` on the MXU at
     Precision.HIGHEST (multi-pass bf16 — near-f32, not bit-exact; the
     winner (t, u, v) are recomputed in plain f32 JAX anyway). K is
     thin (8/128 of the systolic depth) but the MXU is otherwise idle,
     so even at low utilization it beats burning VPU issue slots; the
     accept is a branch-free sign test. The winner epilogue packs
     (t, lane id) into ONE int32 key
     (monotone bitcast; the low ceil(log2 C) mantissa bits carry the
     lane index) so per-visit selection is a single lane-axis min and a
     few (R, 1) column ops — no sublane<->lane relayouts, which cost 3x
     the whole MT math in the naive two-reduction form. All comparisons
     (t, tcap, entry, prune) stay in int-key space; the prune is padded
     +_PRUNE_PAD bits (~ *(1+5e-4): mantissa clearing + approx-reciprocal
     slack) so the understated t keys never cause a
     non-conservative early exit. Weight slabs are VMEM-resident for
     small scenes and double-buffered HBM->VMEM DMA (driven by the
     candidate list, prefetching visit k+1 during visit k) beyond
     _RESIDENT_W_BYTES — scene size is unbounded.

Gradients flow with NO custom VJP: the kernel only *finds* winner ids
(integers, detached by construction — the standard differentiable-
rendering visibility convention), and (t, u, v) are recomputed at the R
winners by plain-JAX Möller-Trumbore (triangle.hpp:95-115), which JAX
differentiates w.r.t. triangle records, camera eye, and ray directions.
This also makes the prebuilt-``clusters`` fast lane fully differentiable:
the structure is only used for the detached search. The kernel's internal
t is therefore never observable outside winner selection; clearing its low
mantissa bits only affects tie-breaks among hits within 2^-16 relative.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ceres_tpu.accel import clusters as cl
from ceres_tpu.models.mesh import TriangleSoup
from ceres_tpu.ops.intersect import Hit

# Rays per culling tile (= one 16 x 32 pixel block) and tiles walked per
# Pallas grid step (fixed-cost amortizer). Env-overridable tuning knobs
# (read once at import) for on-chip sweeps; the defaults are the measured
# optimum on bunny/dragon 1080p.
TILE = int(os.environ.get("CERES_TILE", 512))
_GROUP_TILES = int(os.environ.get("CERES_GROUP_TILES", 8))

_BIG = 3.0e37      # "no hit yet" sentinel, finite to keep slab math NaN-free
_VALID_CUT = 1.0e37  # entries >= this are padding, never real candidates
_INV_CLAMP = 1e30
_ULP_PAD = 4e-6       # conservative slab widening (RobustNodeIntersector,
                      # node_intersectors.hpp:54-79: never cull a true hit)
_DEST_EPS = 4e-6      # t-window margin for common-destination occlusion
                      # (self-shadow guard at the receiving point)
# Weight tensors up to this size stay VMEM-resident for the whole kernel;
# larger scenes switch to the double-buffered HBM streaming path.
_RESIDENT_W_BYTES = 8 << 20

# Above this many 128-triangle blocks the walk goes TWO-LEVEL: the dense
# culling prepass + sort runs over SUPERS of up to S member blocks, and
# the kernel gates each member block with an in-kernel interval test
# of the tile hull against the block's box (one vectorized slab test +
# one gate-bitmask reduce per super visit; culled blocks skip their MT
# matmul via lax.cond). Supers come from the LBVH's OWN upper levels
# when available (ClusterSet.super_first — a second treelet cut at <= S
# fine clusters per super, lbvh.super_cut), so a super's box is a real
# tree-node box; the fallback groups S consecutive blocks (treelet
# order is spatially coherent, but such unions are loose wherever the
# morton curve jumps). S grows with the scene so the prepass stays
# bounded at ~_SUPER_TARGET supers — the O(tiles x N_c) prepass ceiling
# (and its 134 MB key tensor at ~1M triangles) becomes O(tiles x 1024)
# regardless of scene size. Below the threshold the flat single-level
# walk is unchanged, and measured FASTER wherever it compiles (dragon's
# 368 blocks: 2x; a 318k-tri subdivided bunny at 4968 blocks: 275 vs
# 393 ms/frame with r4's consecutive-block supers) — the in-kernel
# gating carries per-super overhead the prepass savings don't repay at
# these sizes. The flat walk's hard wall
# is SMEM: its double-buffered per-group key window (G x n_c x 4 B x 2)
# exceeds the 1 MB budget at 16384 blocks (a 1.27M-triangle scene fails
# to compile flat; the two-level walk renders it). The threshold sits
# just under that wall with margin for the counts/hull windows — and is
# also near the flat walk's QUALITY wall: its packed keys clear
# ceil(log2 n_c) mantissa bits, so at 14.4k blocks entries quantize to
# a ~2e-3 relative grid and boundary visits explode (measured round 5,
# 1.27M tris on a 14,367-block quality cut: flat 837 ms / 250,924
# executed visits vs two-level 512 ms / 151,674 — the in-super priority
# walk gates on FULL-precision entries from bbox_ref instead).
_HIER_MIN_CLUSTERS = int(os.environ.get("CERES_HIER_MIN", 12288))
# Shadow-wavefront receiver regrouping (see any_hit_to_point):
# "auto" = on for scenes past the two-level threshold, "1"/"0" force.
_SHADOW_REGROUP = os.environ.get("CERES_SHADOW_REGROUP", "0")
_REGROUP_TILE = int(os.environ.get("CERES_REGROUP_TILE", 128))
_SUPER_TARGET = 1024
_SUPER_MAX = 32   # gate bitmask lives in one int32


def _super_slots(n_c: int) -> int:
    """Member slots per super (8..32, keeping the super count near
    _SUPER_TARGET) — the size the builder's super cut must match."""
    s = 8
    while -(-n_c // s) > _SUPER_TARGET and s < _SUPER_MAX:
        s *= 2
    return s


def _super_factor(n_c: int) -> int:
    """Blocks per super: 1 = flat walk; else _super_slots."""
    if n_c <= _HIER_MIN_CLUSTERS:
        return 1
    return _super_slots(n_c)

# Prune-key slack, in int32 ulps of the f32 bit pattern (~3e-5
# relative). The walk's early exit is only conservative if the padded
# prune covers every way the carried t keys UNDERSTATE the true hit
# distances — here only the cleared low mantissa bits (127 ulp; the
# winner t uses the EXACT reciprocal, see winner_update). Two measured
# dead ends are documented by this constant's history: an approximate
# reciprocal (error ~2^-16) made 256 ulp non-conservative (winner
# misses ~1e-3 relative on near-tie soups — the pad must dominate every
# understatement source), and widening to 4096 ulp cost a real 17% of
# frame time in extra boundary visits while the approx reciprocal
# itself saved nothing measurable.
_PRUNE_PAD = 256

# "No hit" sentinel whose low mantissa bits are zero (survives the winner
# key's idx-bit clearing), and its int32 bit pattern.
_BIG_CLEAN_I = int(np.float32(_BIG).view(np.int32) & ~np.int32(127))
_BIG_CLEAN = float(np.int32(_BIG_CLEAN_I).view(np.float32))
_NEG_I = int(np.float32(-1.0).view(np.int32))  # bits of -1.0 (prune killer)


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


def _cid_bits(n_c: int) -> int:
    """Low-bit width reserved for a cluster id in a packed candidate key."""
    return max(1, (n_c - 1).bit_length())


def _tile_candidate_keys(lo, hi, dirs_tiled, origins_tiled=None, alive=None):
    """Per-tile candidate keys, sorted FRONT TO BACK, as ONE int32 array.

    dirs_tiled: 3-tuple of (n_tiles, R) direction columns (origins_tiled
    likewise). Each candidate is packed as (entry-bound f32 bits with the
    low cid_bits cleared) | cluster id — the bit pattern of a non-negative
    f32 is order-isomorphic to the float, so ONE payload-free `jnp.sort`
    orders candidates by entry bound (clearing low mantissa bits only
    LOWERS the bound: still a conservative lower bound of any member
    ray's hit distance). Returns (keys (n_tiles, N_c) int32 ascending,
    counts (n_tiles,) int32 of real candidates).
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
    n_c = tn.shape[1]
    cmask = (1 << _cid_bits(n_c)) - 1
    cid = jax.lax.broadcasted_iota(jnp.int32, tn.shape, 1)
    keys = (jax.lax.bitcast_convert_type(tn, jnp.int32)
            & ~jnp.int32(cmask)) | cid
    return jnp.sort(keys, axis=1), counts


def _tile_cluster_lists(lo, hi, dirs_tiled, origins_tiled=None, alive=None):
    """Unpacked view of :func:`_tile_candidate_keys` (tests/profiling).

    Returns (lists (n_tiles, N_c) int32 candidate ids in ascending
    entry-bound order, entry (n_tiles, N_c) f32 bounds (low cid bits
    cleared; +_BIG past count), counts (n_tiles,) int32).
    """
    keys, counts = _tile_candidate_keys(lo, hi, dirs_tiled, origins_tiled,
                                        alive)
    cmask = jnp.int32((1 << _cid_bits(keys.shape[1])) - 1)
    lists = keys & cmask
    entry = jax.lax.bitcast_convert_type(keys & ~cmask, jnp.float32)
    return lists, entry, counts


def _super_members(lo, hi, first, S):
    """Super-level inputs from a per-super FIRST-member table.

    ``lo``/``hi`` are the (N_c, 3) fine block boxes ALREADY shifted into
    the kernel's frame; super j's members are the contiguous fine ids
    [first[j], first[j+1]) — at most S of them. ``first`` is either the
    tree-derived super cut (ClusterSet.super_first: real LBVH nodes,
    tight union boxes) or the uniform arange*S fallback (consecutive
    runs). Returns (super_lo, super_hi — the (n_s, 3) union boxes for
    the phase-1 prepass, empty-aware) and the (n_s, 8, S) member-box
    tensor the kernel gates with: rows 0-2 lo.xyz, 3-5 hi.xyz, 6 the
    empty flag, 7 pad (sublane-aligned). A super's union box equals the
    covering tree node's real box (the node box IS the union of its
    fine clusters' boxes).
    """
    n_c = lo.shape[0]
    n_s = first.shape[0]
    member = first[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    nxt = jnp.concatenate([first[1:], jnp.full((1,), n_c, jnp.int32)])
    valid = (member < nxt[:, None]) & (member < n_c)
    midx = jnp.clip(member, 0, n_c - 1)
    mlo = lo[midx]                                       # (n_s, S, 3)
    mhi = hi[midx]
    empty = jnp.any(mhi < mlo, axis=-1) | ~valid         # (n_s, S)
    lo_m = jnp.where(empty[..., None], _BIG, mlo)
    hi_m = jnp.where(empty[..., None], -_BIG, mhi)
    super_lo = lo_m.min(axis=1)
    super_hi = hi_m.max(axis=1)
    bbox = jnp.concatenate([
        jnp.transpose(mlo, (0, 2, 1)),
        jnp.transpose(mhi, (0, 2, 1)),
        empty[:, None, :].astype(lo.dtype),
        jnp.zeros((n_s, 1, S), lo.dtype)], axis=1)
    return super_lo, super_hi, bbox


def _tile_hulls(dirs_tiled, alive, origins_tiled=None):
    """(n_tiles, 16) per-tile hull scalars for the in-kernel block gate.

    Layout per tile: [1/dlo.xyz, 1/dhi.xyz, straddle.xyz, olo.xyz,
    ohi.xyz, pad] — the precomputed pieces of the _interval_entry test
    (safe inverses of the direction-interval ends and the zero-straddle
    flags), so the kernel's per-super gate is pure multiply/min/max on
    the S member boxes. Common-origin wavefronts (origins_tiled=None)
    get a zero origin hull: their boxes are pre-shifted.
    """
    dlo, dhi = _hull(dirs_tiled, alive)
    ia = _safe_inverse(dlo)
    ib = _safe_inverse(dhi)
    st = ((dlo < 0) & (dhi > 0)).astype(dlo.dtype)
    if origins_tiled is None:
        olo = jnp.zeros_like(dlo)
        ohi = jnp.zeros_like(dlo)
    else:
        olo, ohi = _hull(origins_tiled, alive)
    n_t = dlo.shape[0]
    return jnp.concatenate(
        [ia, ib, st, olo, ohi, jnp.zeros((n_t, 1), dlo.dtype)], axis=-1)


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
# Phase 2: the Pallas walk kernel
# ---------------------------------------------------------------------------

def _make_walk_kernel(c_size: int, n_c: int, R: int, G: int,
                      tcap_col: int, mode: str, stream: bool, S: int = 1,
                      window: bool = False):
    """One grid step per GROUP of G ray tiles: walk each tile's sorted
    candidate list FRONT TO BACK, early-exiting on the tile prune (see
    module docstring). Grouping amortizes Mosaic's fixed per-grid-step
    cost (~2 us measured: block bookkeeping + DMA descriptor setup) over
    G tiles — at 1080p that fixed cost alone was ~8 ms/frame per
    wavefront with one tile per step.

    Closest mode carries per-ray (t-key, packed winner id) columns; any-hit
    mode carries an occlusion flag column. All scalar comparisons happen on
    int32 f32-bit-patterns (order-isomorphic for values >= 0; Mosaic has no
    scalar bitcast). ``stream=True`` swaps the VMEM-resident weight tensor
    for double-buffered HBM DMA driven by the candidate list.

    ``S > 1`` is the TWO-LEVEL walk: each candidate is a SUPER of S
    blocks; ``n_c`` then counts supers. Per super visit the kernel
    interval-tests the tile hull (hull_ref scalars) against the S member
    block boxes (bbox_ref, one vectorized slab test), reduces the passing
    set to ONE gate bitmask scalar, and runs each passing block's MT
    matmul under lax.cond — culled blocks cost ~nothing. The per-visit
    gate is exactly the flat prepass's conservative test, deferred into
    the kernel so the dense prepass + sort stay O(tiles x supers).
    """
    ibits = max(1, (c_size - 1).bit_length())
    imask = (1 << ibits) - 1
    cmask = (1 << _cid_bits(n_c)) - 1
    any_hit_mode = mode in ("any", "any_dest")
    hier = S > 1

    def kernel(*refs):
        refs = list(refs)
        cnt_ref = refs.pop(0)
        key_ref = refs.pop(0)
        f_ref = refs.pop(0)
        occ0_ref = refs.pop(0) if any_hit_mode else None
        hull_ref = refs.pop(0) if hier else None
        bbox_ref = refs.pop(0) if hier else None
        first_ref = refs.pop(0) if hier else None
        w_ref = refs.pop(0)          # w_hbm when streaming
        out_ref = refs.pop(0)
        steps_ref = refs.pop(0)
        wbuf = refs.pop(0) if stream else None
        sem = refs.pop(0) if stream else None
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            steps_ref[0, 0] = 0

        # Loop-invariant lane ids for the winner key packing (hoisted out
        # of the walk loop: Mosaic does not CSE iota across iterations).
        ids = jax.lax.broadcasted_iota(jnp.int32, (R, c_size), 1)
        bitlane = None
        if hier:
            bitlane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

        total = 0
        for g in range(G):     # static unroll over the group's tiles
            count = cnt_ref[0, 0, g]
            # Feature block is CHANNEL-FIRST (Kp, G * R): rays ride the
            # dense lane axis. The (R, Kp) form would make XLA pad
            # Kp -> 128 lanes, and a 1080p frame's feats tensor balloons
            # 16x to ~1 GB of HBM traffic (measured 13-24 ms/frame of
            # pure concatenate before this layout).
            f = f_ref[:, g * R:(g + 1) * R]
            # Root-exit cap rides a spare (zero-weight) feature row; as
            # int bits it joins the key-space comparisons directly. Dead
            # rays carry tcap = -1.0 (negative bits) and never extend the
            # prune. One (1, R) -> (R, 1) relayout per tile, not per
            # visit.
            tcap_i = jax.lax.bitcast_convert_type(
                f[tcap_col:tcap_col + 1, :].reshape(R, 1), jnp.int32)
            if window:
                # Per-ray [tmin, tmax] accept window (bvh::Ray semantics,
                # ray.hpp:9-23) riding the next two spare feature rows.
                tmin_f = f[tcap_col + 1:tcap_col + 2, :].reshape(R, 1)
                tmax_f = f[tcap_col + 2:tcap_col + 3, :].reshape(R, 1)

            if stream:
                def _copy(k):
                    cid = key_ref[0, g, jnp.minimum(k, n_c - 1)] & cmask
                    if hier:
                        # Super fetch: S consecutive fine blocks from
                        # the super's first member (tree-derived supers
                        # are contiguous runs of fine ids) into the
                        # k-parity half of the FLAT (2 * S, ...) buffer
                        # (one dynamic index per member read).
                        fs = first_ref[0, cid]
                        src = w_ref.at[pl.ds(fs, S)]
                        dst = wbuf.at[pl.ds((k % 2) * S, S)]
                    else:
                        src = w_ref.at[cid]
                        dst = wbuf.at[k % 2]
                    return pltpu.make_async_copy(src, dst,
                                                 sem.at[k % 2])

                def start_fetch(k):
                    _copy(k).start()

                def wait_fetch(k):
                    _copy(k).wait()

                @pl.when(count > 0)
                def _():
                    start_fetch(0)

            if hier:
                # Per-tile hull scalars (precomputed in phase 1): safe
                # inverses of the direction-interval ends, straddle
                # flags, and the origin hull (zeros for common-origin
                # wavefronts whose boxes are pre-shifted).
                ia = [hull_ref[0, g, a] for a in range(3)]
                ib = [hull_ref[0, g, 3 + a] for a in range(3)]
                sf = [hull_ref[0, g, 6 + a] for a in range(3)]
                olo = [hull_ref[0, g, 9 + a] for a in range(3)]
                ohi = [hull_ref[0, g, 12 + a] for a in range(3)]

                def block_entries(sid):
                    """Int-key entry bounds of the tile hull against the
                    S member block boxes of super ``sid`` — the
                    _interval_entry test vectorized on S lanes. Each
                    block is later gated against the LIVE prune (updated
                    after every visit), preserving the flat walk's
                    front-to-back early-exit at block granularity."""
                    bb = bbox_ref[sid]                       # (8, S)
                    tn = None
                    tf = None
                    for a in range(3):
                        la = bb[a:a + 1, :] - ohi[a]
                        ha = bb[3 + a:4 + a, :] - olo[a]
                        c0 = la * ia[a]
                        c1 = la * ib[a]
                        c2 = ha * ia[a]
                        c3 = ha * ib[a]
                        emin = jnp.minimum(jnp.minimum(c0, c1),
                                           jnp.minimum(c2, c3))
                        emax = jnp.maximum(jnp.maximum(c0, c1),
                                           jnp.maximum(c2, c3))
                        wide = sf[a] > 0
                        emin = jnp.where(wide, -_BIG, emin)
                        emax = jnp.where(wide, _BIG, emax)
                        tn = emin if tn is None else jnp.maximum(tn, emin)
                        tf = emax if tf is None else jnp.minimum(tf, emax)
                    tn = jnp.maximum(tn, 0.0)
                    okb = (tn * (1.0 - _ULP_PAD)
                           <= jnp.minimum(tf, _BIG) * (1.0 + _ULP_PAD))
                    okb = okb & (bb[6:7, :] == 0.0)
                    return jax.lax.bitcast_convert_type(
                        jnp.where(okb, tn, _BIG), jnp.int32)   # (1, S)

                _IMAX = jnp.int32(0x7FFFFFFF)

            def cond(state):
                k, prune_i = state[0], state[1]
                # Compare the PURE entry bound: mask the low cid bits
                # before the prune test. They raise the key by up to
                # 2^cid_bits - 1 ulps, which EXCEEDS _PRUNE_PAD once
                # n_c > 256 — testing the full key would non-
                # conservatively end the walk while a remaining candidate
                # can still hold a closer hit. The cleared entry bound is
                # a lower bound of any member hit, so masking only costs
                # (skippable) boundary visits, never correctness.
                key_k = key_ref[0, g, jnp.minimum(k, n_c - 1)]
                return (k < count) & ((key_k & ~cmask) <= prune_i)

            def mt_accept(wj):
                """All R x C MT numerators of this cluster; sign-test
                accept.

                ONE (Kp, R)^T @ (Kp, 4C) dot — the MXU evaluates every
                numerator in a handful of systolic passes while the VPU
                runs the previous visit's epilogue. K is thin (8/128 of
                the systolic depth) but the MXU is otherwise idle, so
                even at 6% utilization it beats burning VPU issue slots.
                Zero-padded feature rows (including the tcap row)
                multiply zero weight rows, so the contraction is
                unchanged.
                """
                acc = jax.lax.dot_general(
                    f, wj, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)      # (R, 4C)
                nu = acc[:, :c_size]
                nv = acc[:, c_size:2 * c_size]
                nd = acc[:, 2 * c_size:3 * c_size]
                nt = acc[:, 3 * c_size:]
                s = jnp.where(nd >= 0, 1.0, -1.0)
                uvw = jnp.minimum(jnp.minimum(nu * s, nv * s),
                                  (nd - nu - nv) * s)
                if mode == "any_dest":
                    # Common-DESTINATION rays (origin = the light, t = 1
                    # at the receiving point): occluder iff the line hits
                    # the triangle strictly between light and receiver,
                    # 0 <= t <= 1 - eps. The upper window is
                    # (nt - (1 - eps) * nd) * s <= 0; the LOWER bound
                    # nt * s >= 0 rejects geometry BEHIND the light
                    # (t < 0) — without it, any in-scene light whose
                    # candidate clusters extend past it would darken
                    # receivers on the opposite side. The eps window
                    # replaces the receiver's geometric self-intersection
                    # offset, which at light distance L is below f32
                    # resolution of t (offset/L ~ 1e-7).
                    win = ((nt - (1.0 - _DEST_EPS) * nd) * s <= 0) \
                        & (nt * s >= 0)
                    ok = (uvw >= 0) & (nd != 0) & win
                else:
                    m = jnp.minimum(uvw, nt * s)
                    ok = (m >= 0) & (nd != 0)  # t >= 0 (nt*s >= 0)
                return ok, nd, nt

            def fetch_wait(k):
                """Stream bookkeeping only: prefetch k+1, wait for k.
                Hier bodies then index the wbuf REF per member block
                (wbuf[k % 2, s] — s is a traced lane id)."""
                @pl.when(k + 1 < count)
                def _():
                    start_fetch(k + 1)
                wait_fetch(k)

            def fetch_weights(k):
                if stream:
                    fetch_wait(k)
                    return wbuf[k % 2]
                return w_ref[key_ref[0, g, k] & cmask]

            def winner_update(wj, bid, t_i, pid):
                """MT accept + per-visit winner selection for one block.

                Measured DEAD END (round 5): wrapping the selection
                epilogue in lax.cond on a scalar any-accept reduce
                (skipping ~5 of 13 (R, C)-shaped VPU ops on no-accept
                visits) cost 8% on bunny 1080p (65.0 -> 60.2 Mrays/s)
                and 7% on the 1.27M-tri scene (602 -> 647 ms) — the
                reduce + branch outweigh the skipped work at these
                accept rates. Keep the epilogue unconditional.
                """
                ok, nd, nt = mt_accept(wj)
                # EXACT reciprocal: an approx=True variant saved no
                # measurable time (the divide is not the bottleneck) and
                # its ~2^-16 error forced a prune pad so wide the
                # extra boundary visits cost 17% of the frame. t only
                # feeds winner SELECTION (t/u/v are recomputed at the
                # winners in plain JAX); nd == 0 lanes produce inf/NaN
                # which ok (requiring nd != 0) masks to _BIG_CLEAN.
                tpair = jnp.where(ok, nt * pl.reciprocal(nd, approx=False),
                                  _BIG_CLEAN)
                if window:
                    tpair = jnp.where((tpair >= tmin_f) & (tpair <= tmax_f),
                                      tpair, _BIG_CLEAN)
                keys = ((jax.lax.bitcast_convert_type(tpair, jnp.int32)
                         & ~imask) | ids)
                kmin = jnp.min(keys, axis=1, keepdims=True)  # ONE reduce
                t_new = kmin & ~imask
                better = t_new < t_i
                t_i = jnp.where(better, t_new, t_i)
                pid = jnp.where(better, bid * c_size + (kmin & imask), pid)
                return t_i, pid

            if any_hit_mode and hier:
                def body(state):
                    k, prune_i, occ, nvis = state
                    sid = key_ref[0, g, k] & cmask
                    fs = first_ref[0, sid]
                    if stream:
                        fetch_wait(k)
                    ent_i = block_entries(sid)

                    # In-super PRIORITY walk (see the closest-mode body).
                    def in_cond(st2):
                        rem = st2[0]   # int32 bitmask of unvisited slots
                        live = ((rem >> bitlane) & 1) == 1
                        return jnp.min(jnp.where(live, ent_i, _IMAX)) \
                            <= st2[3]

                    def in_body(st2):
                        rem, occ_, nv_, _ = st2
                        live = ((rem >> bitlane) & 1) == 1
                        masked = jnp.where(live, ent_i, _IMAX)
                        m = jnp.min(masked)
                        s = jnp.min(jnp.where(masked == m, bitlane, _IMAX))
                        rem = rem & ~(jnp.int32(1) << s)
                        wj = wbuf[(k % 2) * S + s] if stream \
                            else w_ref[fs + s]
                        ok, _, _ = mt_accept(wj)
                        occ_ = occ_ | jnp.max(
                            jnp.where(ok, jnp.int32(1), jnp.int32(0)),
                            axis=1, keepdims=True)
                        pr_ = (jnp.max(jnp.where(occ_ > 0, _NEG_I,
                                                 tcap_i)) + _PRUNE_PAD)
                        return rem, occ_, nv_ + 1, pr_

                    rem0 = (jnp.int32(-1) if S == 32
                            else jnp.int32((1 << S) - 1))
                    _, occ, nvis, prune_i = jax.lax.while_loop(
                        in_cond, in_body,
                        (rem0, occ, nvis, prune_i))
                    return k + 1, prune_i, occ, nvis

                occ0 = occ0_ref[g * R:(g + 1) * R].reshape(R, 1)
                prune0 = (jnp.max(jnp.where(occ0 > 0, _NEG_I, tcap_i))
                          + _PRUNE_PAD)
                k, _, occ, nvis = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), prune0, occ0, jnp.int32(0)))
                out_ref[g * R:(g + 1) * R] = occ.reshape(R)
            elif any_hit_mode:
                def body(state):
                    k, prune_i, occ = state
                    wj = fetch_weights(k)
                    ok, _, _ = mt_accept(wj)
                    occ = occ | jnp.max(
                        jnp.where(ok, jnp.int32(1), jnp.int32(0)),
                        axis=1, keepdims=True)
                    prune_i = (jnp.max(jnp.where(occ > 0, _NEG_I, tcap_i))
                               + _PRUNE_PAD)
                    return k + 1, prune_i, occ

                occ0 = occ0_ref[g * R:(g + 1) * R].reshape(R, 1)
                prune0 = (jnp.max(jnp.where(occ0 > 0, _NEG_I, tcap_i))
                          + _PRUNE_PAD)
                state = jax.lax.while_loop(cond, body,
                                           (jnp.int32(0), prune0, occ0))
                k, _, occ = state
                nvis = k
                out_ref[g * R:(g + 1) * R] = occ.reshape(R)
            elif hier:
                def body(state):
                    k, prune_i, t_i, pid, nvis = state
                    sid = key_ref[0, g, k] & cmask
                    fs = first_ref[0, sid]
                    if stream:
                        fetch_wait(k)
                    ent_i = block_entries(sid)

                    # In-super PRIORITY walk: iteratively extract the
                    # remaining member with the SMALLEST entry bound and
                    # visit it only while that minimum is under the live
                    # prune. Replaces the S sequential lax.cond gates
                    # (which cost a masked reduce + branch PER SLOT even
                    # when every member is culled — measured ~40% of the
                    # 1.27M-tri frame) with ~2 lane reduces per EXECUTED
                    # visit, and visits members front-to-back, so the
                    # prune (refreshed after every visit) converges
                    # faster than slot order.
                    def in_cond(st2):
                        rem = st2[0]   # int32 bitmask of unvisited slots
                        live = ((rem >> bitlane) & 1) == 1
                        return jnp.min(jnp.where(live, ent_i, _IMAX)) \
                            <= st2[4]

                    def in_body(st2):
                        rem, t_, pid_, nv_, _ = st2
                        live = ((rem >> bitlane) & 1) == 1
                        masked = jnp.where(live, ent_i, _IMAX)
                        m = jnp.min(masked)
                        s = jnp.min(jnp.where(masked == m, bitlane, _IMAX))
                        rem = rem & ~(jnp.int32(1) << s)
                        wj = wbuf[(k % 2) * S + s] if stream \
                            else w_ref[fs + s]
                        t_, pid_ = winner_update(wj, fs + s, t_, pid_)
                        pr_ = (jnp.max(jnp.minimum(t_, tcap_i))
                               + _PRUNE_PAD)
                        return rem, t_, pid_, nv_ + 1, pr_

                    rem0 = (jnp.int32(-1) if S == 32
                            else jnp.int32((1 << S) - 1))
                    _, t_i, pid, nvis, prune_i = jax.lax.while_loop(
                        in_cond, in_body,
                        (rem0, t_i, pid, nvis, prune_i))
                    return k + 1, prune_i, t_i, pid, nvis

                t0 = jnp.full((R, 1), _BIG_CLEAN_I, jnp.int32)
                pid0 = jnp.full((R, 1), -1, jnp.int32)
                prune0 = jnp.max(tcap_i) + _PRUNE_PAD
                k, _, _, pid, nvis = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), prune0, t0, pid0, jnp.int32(0)))
                out_ref[g * R:(g + 1) * R] = pid.reshape(R)
            else:
                def body(state):
                    k, prune_i, t_i, pid = state
                    cid = key_ref[0, g, k] & cmask
                    wj = fetch_weights(k)
                    t_i, pid = winner_update(wj, cid, t_i, pid)
                    prune_i = jnp.max(jnp.minimum(t_i, tcap_i)) + _PRUNE_PAD
                    return k + 1, prune_i, t_i, pid

                t0 = jnp.full((R, 1), _BIG_CLEAN_I, jnp.int32)
                pid0 = jnp.full((R, 1), -1, jnp.int32)
                prune0 = jnp.max(tcap_i) + _PRUNE_PAD
                state = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), prune0, t0, pid0))
                k, _, _, pid = state
                nvis = k
                out_ref[g * R:(g + 1) * R] = pid.reshape(R)
            if stream:
                # Drain the in-flight prefetch a prune early-exit left
                # behind (the warmup fetch when the loop never ran, or
                # the k-th fetch issued by body(k-1)).
                @pl.when(k < count)
                def _():
                    wait_fetch(k)
            total = total + nvis
        steps_ref[0, 0] += total

    return kernel


@functools.partial(jax.jit, static_argnames=("tcap_col", "mode",
                                             "stream", "interpret", "S",
                                             "window"))
def _walk_pallas(counts, keys, feats, w, occ0=None, hull=None, bbox=None,
                 first=None, *, tcap_col, mode, stream, interpret, S=1,
                 window=False):
    """Launch the walk kernel over all tiles. Returns (out, steps).

    feats is CHANNEL-FIRST (Kp, n_tiles * R) — rays on the dense lane
    axis (see the kernel docstring for why ray-major would cost ~1 GB of
    lane padding per frame). occ0, when given, is flat (n_tiles * R,).
    out is flat (n_tiles * R,) int32 — packed winner slot ids (closest
    mode, -1 = miss) or occlusion flags (any-hit mode); 1-D keeps the
    buffer dense (a (tiles, R, 1) form is lane-padded 128x by XLA).
    steps is the MEASURED total of executed block visits (the
    Statistics capability, single_ray_traverser.hpp:131-163).

    ``S > 1`` selects the two-level walk: ``keys``/``counts`` are then
    per-SUPER (n_tiles, n_s) candidates, ``w`` holds the fine blocks
    (zero-padded by S), ``hull`` is the (n_tiles, 16) per-tile
    hull-scalar table, ``bbox`` the (n_s, 8, S) member-block box tensor
    and ``first`` the (n_s,) first-member table (member block m of
    super j is fine block first[j] + m).
    """
    Kp, R_total = feats.shape
    n_tiles = counts.shape[0]
    R = R_total // n_tiles
    C4 = w.shape[-1]
    if S > 1:
        n_s = bbox.shape[0]
        n_c = n_s                      # candidate-list width = supers
    else:
        n_c = w.shape[0]
    any_hit_mode = mode in ("any", "any_dest")
    G = min(_GROUP_TILES, n_tiles)
    pad_t = (-n_tiles) % G
    if pad_t:
        # Padding tiles have count 0: the walk skips them and writes the
        # init state (miss / unoccluded); their output rows are dropped.
        counts = jnp.pad(counts, (0, pad_t))
        keys = jnp.pad(keys, ((0, pad_t), (0, 0)))
        feats = jnp.pad(feats, ((0, 0), (0, pad_t * R)))
        if occ0 is not None:
            occ0 = jnp.pad(occ0, (0, pad_t * R))
        if hull is not None:
            hull = jnp.pad(hull, ((0, pad_t), (0, 0)))
    n_groups = (n_tiles + pad_t) // G
    in_specs = [
        pl.BlockSpec((1, 1, G), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, G, n_c), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((Kp, G * R), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [counts.reshape(n_groups, 1, G), keys.reshape(n_groups, G, n_c),
            feats]
    if any_hit_mode:
        in_specs.append(pl.BlockSpec((G * R,), lambda i: (i,),
                                     memory_space=pltpu.VMEM))
        args.append(occ0)
    if S > 1:
        in_specs.append(pl.BlockSpec((1, G, 16), lambda i: (i, 0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(hull.reshape(n_groups, G, 16))
        in_specs.append(pl.BlockSpec((n_s, 8, S), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bbox)
        in_specs.append(pl.BlockSpec((1, n_s), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(first.reshape(1, n_s))
    if stream:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    else:
        in_specs.append(pl.BlockSpec((w.shape[0], Kp, C4),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    args.append(w)
    wbuf_shape = (2 * S, Kp, C4) if S > 1 else (2, Kp, C4)
    out, steps = pl.pallas_call(
        _make_walk_kernel(C4 // 4, n_c, R, G, tcap_col, mode,
                          stream, S, window),
        grid_spec=pl.GridSpec(
            grid=(n_groups,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((G * R,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=([pltpu.VMEM(wbuf_shape, jnp.float32),
                             pltpu.SemaphoreType.DMA((2,))] if stream
                            else []),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_groups * G * R,), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return out[:R_total], steps


def _use_stream(w) -> bool:
    return w.size * 4 > _RESIDENT_W_BYTES


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


def _feats_from_cols(cols, kp, tcap=None, extra=()):
    """Per-ray feature columns -> CHANNEL-FIRST (kp, R).

    Layout: rows [cols..., 1, tcap?, extra..., zeros...], rays on the
    dense lane axis. The ray-major (R, kp) form would be lane-padded
    kp -> 128 by XLA (16x memory for kp = 8; measured 13-24 ms/frame of
    concatenate at 1080p). The root-exit cap rides the first spare
    (zero-weight-row) feature row, saving the kernel a separate input
    stream; its row index is ``len(cols) + 1`` (returned layout is
    static per n_feat). ``extra`` rows (e.g. the per-ray tmin/tmax
    window) follow the tcap row on further spare zero-weight rows.
    """
    R = cols[0].shape[0]
    arrs = list(cols) + [jnp.ones((R,), cols[0].dtype)]
    if tcap is not None:
        arrs.append(tcap)
    arrs.extend(extra)
    if len(arrs) > kp:
        raise ValueError(f"{len(arrs)} feature rows exceed kp={kp}")
    if kp > len(arrs):
        zero = jnp.zeros((R,), cols[0].dtype)
        arrs.extend([zero] * (kp - len(arrs)))
    return jnp.stack(arrs, axis=0)


def _pad_rays(x, tile=TILE):
    """(R, ...) -> (R_pad, ...) zero-padded to a multiple of ``tile``."""
    pad = (-x.shape[0]) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _tile_rays(x, tile):
    """(R, ...) -> (n_tiles, tile, ...) zero-padded."""
    x = _pad_rays(x, tile)
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

def _detach_f32(tree):
    """stop_gradient + cast floating leaves to f32: the SEARCH precision.

    The kernel's double-precision story (the reference's ``Scalar``
    float/double axis, anim.cpp:154-158): winner/occlusion SEARCH always
    runs the f32 TPU datapath; everything a float64 caller observes —
    (t, u, v) at the winners, shading, gradients — is recomputed in f64
    from the original arrays. The deviation from an all-f64 traversal is
    confined to winner tie-breaks within f32 resolution, the same class
    (and source) of deviation as the kernel's cleared-mantissa t keys.
    """
    def leaf(x):
        x = jax.lax.stop_gradient(x)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, jnp.float32)
        return x
    return jax.tree.map(leaf, tree)


def _hier_setup(lo, hi, dirs_tiled, alive, origins_tiled, w, cs=None):
    """Choose flat vs two-level walk and build the super-level inputs.

    Returns (S, hull, bbox, first, cull_lo, cull_hi, w): for S == 1 the
    inputs pass through untouched (flat walk); for S > 1 the phase-1
    culling boxes become the super unions, ``w`` is zero-padded by S
    blocks (the kernel reads members as first + s), and the kernel gets
    the per-tile hull table + member-box tensor + first-member table
    for in-kernel block gating. The super level comes from the
    ClusterSet's tree-derived cut when present (``cs.super_first``,
    real LBVH nodes); otherwise uniform S-runs of consecutive blocks.
    """
    n_c = lo.shape[0]
    if n_c <= _HIER_MIN_CLUSTERS:
        return 1, None, None, None, lo, hi, w
    if cs is not None and cs.super_first is not None and cs.super_S > 1:
        S = cs.super_S
        first = cs.super_first
    else:
        S = _super_slots(n_c)
        n_s = -(-n_c // S)
        first = jnp.minimum(jnp.arange(n_s, dtype=jnp.int32) * S, n_c)
    super_lo, super_hi, bbox = _super_members(lo, hi, first, S)
    hull = _tile_hulls(dirs_tiled, alive, origins_tiled)
    # Member reads run to first + S - 1 <= n_c + S - 1: zero-pad the
    # weight blocks (zero records are MT-rejected; gated off anyway).
    w = jnp.pad(w, ((0, S), (0, 0), (0, 0)))
    return S, hull, bbox, first, super_lo, super_hi, w


def _closest_search(cs, eye, dir_cols, tmin=None, tmax=None):
    """Detached winner search: packed slot ids + counters (no gradients).

    Always f32 (see _detach_f32) — float64 callers get f64 values from
    the plain-JAX recompute at the winners, not from the kernel.
    ``tmin``/``tmax`` (scalar or per-ray) restrict accepts to the
    bvh::Ray window [tmin, tmax] (ray.hpp:9-23); tmax additionally caps
    the walk (nothing past it needs visiting).
    """
    cs, eye, dir_cols, tmin, tmax = _detach_f32(
        (cs, eye, dir_cols, tmin, tmax))
    window = tmin is not None or tmax is not None
    R = dir_cols[0].shape[0]
    w = cl.cluster_weights_common_origin_packed(cs, eye)
    lo = cs.lo - eye
    hi = cs.hi - eye
    root_lo, root_hi = _scene_root(cs)
    dp = tuple(_pad_rays(c) for c in dir_cols)
    dirs_tiled = tuple(c.reshape(-1, TILE) for c in dp)
    alive = (dirs_tiled[0] * dirs_tiled[0] + dirs_tiled[1] * dirs_tiled[1]
             + dirs_tiled[2] * dirs_tiled[2]) > 0.0
    tcap = _ray_tcap(root_lo - eye, root_hi - eye, None, dp)
    extra = ()
    if window:
        tmin_a = (jnp.zeros((R,), jnp.float32) if tmin is None
                  else jnp.broadcast_to(jnp.asarray(tmin, jnp.float32),
                                        (R,)))
        tmax_a = (jnp.full((R,), _BIG, jnp.float32) if tmax is None
                  else jnp.broadcast_to(jnp.asarray(tmax, jnp.float32),
                                        (R,)))
        tmin_p = _pad_rays(tmin_a)
        tmax_p = _pad_rays(tmax_a)
        # Walk cap: no candidate past tmax can matter (padded
        # conservatively like the root exit). Dead rays keep tcap -1.
        tcap = jnp.where(tcap < 0, tcap,
                         jnp.minimum(tcap, tmax_p * (1.0 + _ULP_PAD)))
        extra = (tmin_p, tmax_p)
    feats = _feats_from_cols(dp, w.shape[1], tcap=tcap, extra=extra)
    S, hull, bbox, first, cull_lo, cull_hi, w = _hier_setup(
        lo, hi, dirs_tiled, alive, None, w, cs=cs)
    keys, counts = _tile_candidate_keys(cull_lo, cull_hi, dirs_tiled,
                                        alive=alive)
    pidx, steps = _walk_pallas(
        counts, keys, feats, w, hull=hull, bbox=bbox, first=first,
        tcap_col=4, mode="closest", stream=_use_stream(w),
        interpret=_interpret(), S=S, window=window)
    steps = steps[0, 0]
    return pidx.reshape(-1)[:R], {"traversal_steps": steps,
                                  "mt_block_visits": steps}


def _winner_tuv(rec, eye, dir_cols):
    """Reference Möller-Trumbore at (ray, winning triangle) pairs.

    Exactly triangle.hpp:95-115 with c = p0 - eye, evaluated only at the R
    winners instead of through the R x T search — this is where gradients
    of (t, u, v) w.r.t. vertices / camera / ray directions come from.
    ``rec`` is the sequence of gathered winner-table COLUMNS
    [p0 x3, e1 x3, e2 x3, ...]; all math is column (R,) ops. The face
    normal is RECOMPUTED as cross(e1, e2) — bit-identical to the stored
    soup.n (mesh.py builds it with the same formula) and 9 column ops
    beat gathering three more 8 MB winner columns per frame.
    """
    p0 = (rec[0], rec[1], rec[2])
    e1 = (rec[3], rec[4], rec[5])
    e2 = (rec[6], rec[7], rec[8])
    n = (e1[1] * e2[2] - e1[2] * e2[1],
         e1[2] * e2[0] - e1[0] * e2[2],
         e1[0] * e2[1] - e1[1] * e2[0])
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


def _winner_table_cols(soup: TriangleSoup, cs, payload_cols):
    """List of (N_c * C,) winner-table COLUMNS in cluster-slot order.

    Column layout: [p0 x3, e1 x3, e2 x3, perm, payload...] of
    the triangle stored at each slot, so per-column gathers by the
    kernel's packed winner id serve the differentiable (t, u, v)
    recompute, the original triangle id (perm as an exact f32 VALUE — ids
    are exact in a float32 mantissa up to 2^24 triangles, and a float
    value survives the dense-unpack matmul where a bit pattern would be
    denormal-flushed; a separate s32 gather by original id lowers to a
    15 ms/frame scalar-loop custom call), and any per-triangle shading
    payload. The face normal is NOT stored — _winner_tuv recomputes it
    as cross(e1, e2) (bit-identical; saves three 8 MB gathered columns
    per frame). COLUMNS, not a
    (slots, 10+P) table: a row-major table's minor dim is lane-padded
    to 128 by XLA, and every downstream column slice then re-streams
    the whole ~1 GB padded gather output (measured ~21 ms/frame at
    1080p). Built from ``soup`` (NOT the stop-gradiented cluster arrays)
    so gradients flow to vertices through the gather.
    """
    src = jnp.clip(cs.perm, 0)
    valid = cs.perm >= 0
    cols = []
    for arr in (soup.p0, soup.e1, soup.e2):
        for a in range(3):
            cols.append(jnp.where(valid, arr[src, a], 0.0))
    cols.append(cs.perm.astype(jnp.float32))
    for c in payload_cols or ():
        cols.append(jnp.where(valid, c[src], 0.0))
    return cols


def winner_table(soup: TriangleSoup, clusters, payload=None):
    """Precompute the STACKED winner table for a static-geometry loop.

    The table depends only on (soup, clusters, payload) — loop-invariant
    across frames of static geometry. Measured: XLA already hoists the
    construction inside jitted fori_loop frame loops (1.27M-tri frame
    603 vs 602 ms with/without), so this helps EAGER per-frame callers
    and makes the hoist explicit; the ~100 ms/frame epilogue at that
    scale is the per-ray random row gather over the scene-sized table
    (megakernel._closest_search vs closest_hit_common_origin probe,
    benchmarks/epilogue_probe.py), which precomputation cannot remove.
    Pass back via ``closest_hit_common_origin(..., table_cols=...)``;
    the payload must be the same sequence that call would receive.
    Differentiable w.r.t. ``soup`` exactly like the inline build.
    """
    return jnp.stack(_winner_table_cols(soup, clusters, payload), axis=-1)


def closest_hit_common_origin(soup: TriangleSoup, eye, dirs, clusters=None,
                              with_counts=False, payload=None,
                              tmin=None, tmax=None, normal_cols=False,
                              exact_f64=False, table_cols=None):
    """Closest hit of normalized ``dirs`` rays all starting at ``eye``.

    ``dirs`` is (R, 3) or a 3-tuple of (R,) columns (the fast form — all
    internal math is structure-of-arrays). With ``clusters`` (a prebuilt
    ClusterSet for this exact soup) the acceleration-structure build is
    skipped — the fast lane for frame loops over static geometry. Fully
    differentiable either way: the structure only drives the detached
    winner search; (t, u, v) come from a plain-JAX Möller-Trumbore
    recomputation at the winners, gathered from ``soup`` by original
    triangle id.

    ``tmin``/``tmax`` (scalar or per-ray (R,)) restrict accepted hits to
    the bvh::Ray window tmin <= t <= tmax (ray.hpp:9-23; default the
    unbounded [0, +big) the reference constructs). tmax also caps the
    walk, like the closest-hit tmax shrink (single_ray_traverser.hpp:59).

    ``payload`` (a sequence of P per-triangle (T,) columns, e.g. shading
    normals) rides the winner gather: returns (hit, payload_cols — a
    P-tuple of (R,) columns) with zeros at misses. ``normal_cols=True``
    PREPENDS the winner's face-normal columns (3) to the returned
    payload — recomputed as cross(e1, e2) from the already-gathered
    edge columns, bit-identical to gathering soup.n and three 8 MB
    winner columns cheaper per frame. ``with_counts=True``
    additionally returns the traversal
    counters (MEASURED walk-loop cluster visits — early exits included,
    so steps == executed MT blocks) — the SingleRayTraverser::Statistics
    capability (single_ray_traverser.hpp:131-163), measured, not
    scheduled.
    """
    dir_cols = _cols(dirs)
    cs = clusters
    if cs is None:
        cs = cl.build_clusters_treelet(
            jax.tree.map(jax.lax.stop_gradient, soup))
    if exact_f64:
        # ALL-f64 traversal (the reference's Scalar=double searched in
        # double everywhere): the plain-JAX cluster walk instead of the
        # f32 Pallas datapath. Same structure, same recompute epilogue.
        if jnp.asarray(soup.p0).dtype != jnp.float64:
            raise ValueError("exact_f64 requires a float64 soup "
                             "(enable jax_enable_x64)")
        from ceres_tpu.ops import walk_f64

        pidx, counts = walk_f64.closest_search_f64(
            cs, jnp.asarray(eye), dir_cols, tmin=tmin, tmax=tmax)
    else:
        pidx, counts = _closest_search(cs, eye, dir_cols, tmin=tmin,
                                       tmax=tmax)
    mask = pidx >= 0
    table = (table_cols if table_cols is not None
             else jnp.stack(_winner_table_cols(soup, cs, payload),
                            axis=-1))
    n_cols = table.shape[-1]
    idx = jnp.clip(pidx, 0)
    # ONE row gather (the TPU fast path; per-column 1-D gathers lower to
    # scalar loops, measured >10x slower), then an identity matmul to
    # materialize the columns DENSE. The matmul is not decoration: XLA
    # turns a plain transpose into a zero-cost layout bitcast, after
    # which every downstream column consumer re-streams the whole
    # lane-padded (R, 13+P) gather output — measured ~21 ms/frame at
    # 1080p. An MXU op is forced to produce a standard dense layout, so
    # the padded buffer is read once and the 13+P consumers each read an
    # 8 MB dense column. Exact (identity rows at HIGHEST precision) and
    # linear, so gradients pass through untouched.
    recT = jnp.matmul(jnp.eye(n_cols, dtype=table.dtype),
                      jnp.transpose(table[idx]),
                      precision=jax.lax.Precision.HIGHEST)
    rec = tuple(recT)
    prim = jnp.where(mask, rec[9].astype(jnp.int32), 0)
    t, u, v = _winner_tuv(rec, eye, dir_cols)
    hit = Hit(t=jnp.where(mask, t, jnp.inf),
              u=jnp.where(mask, u, 0.0),
              v=jnp.where(mask, v, 0.0),
              prim_id=prim, mask=mask)
    out_pay = tuple(rec[10:])
    if normal_cols:
        e1c, e2c = rec[3:6], rec[6:9]
        out_pay = (e1c[1] * e2c[2] - e1c[2] * e2c[1],
                   e1c[2] * e2c[0] - e1c[0] * e2c[2],
                   e1c[0] * e2c[1] - e1c[1] * e2c[0]) + out_pay
    out = ((hit,) if payload is None and not normal_cols
           else (hit, out_pay))
    if with_counts:
        counts["mt_pairs"] = (counts["mt_block_visits"]
                              * TILE * cs.cluster_size)
        out = out + (counts,)
    return out[0] if len(out) == 1 else out


def any_hit(soup: TriangleSoup, origin_shift, origins, dirs, skip=None,
            clusters=None, with_counts=False, exact_f64=False):
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
    if exact_f64:
        from ceres_tpu.ops import walk_f64

        cs64 = clusters if clusters is not None else \
            cl.build_clusters_treelet(
                jax.tree.map(jax.lax.stop_gradient, soup))
        result, cnts = walk_f64.any_hit_f64(
            cs64, jnp.asarray(origin_shift), _cols(origins), _cols(dirs),
            skip=skip)
        if with_counts:
            cnts["mt_pairs"] = (cnts["mt_block_visits"]
                                * TILE * cs64.cluster_size)
            return result, cnts
        return result
    soup, shift, o_cols, d_cols = _detach_f32(
        (soup, origin_shift, _cols(origins), _cols(dirs)))
    R = d_cols[0].shape[0]
    if clusters is None:
        cs = cl.build_clusters_treelet(soup)
    else:
        cs = _detach_f32(clusters)
    w = cl.cluster_weights_generic_packed(cs, shift)
    lo = cs.lo - shift
    hi = cs.hi - shift
    root_lo, root_hi = _scene_root(cs)
    o = tuple(o_cols[a] - shift[a] for a in range(3))
    if skip is None:
        skip = jnp.zeros((R,), bool)
    dp = tuple(_pad_rays(c) for c in d_cols)
    op = tuple(_pad_rays(c) for c in o)
    dirs_tiled = tuple(c.reshape(-1, TILE) for c in dp)
    orig_tiled = tuple(c.reshape(-1, TILE) for c in op)
    skip_p = _pad_rays(skip)
    alive = ~skip_p.reshape(-1, TILE)
    alive = alive & ((dirs_tiled[0] * dirs_tiled[0]
                      + dirs_tiled[1] * dirs_tiled[1]
                      + dirs_tiled[2] * dirs_tiled[2]) > 0.0)
    dxo = (dp[1] * op[2] - dp[2] * op[1],
           dp[2] * op[0] - dp[0] * op[2],
           dp[0] * op[1] - dp[1] * op[0])
    # Padding rays are not skipped but have zero dirs -> tcap = -1, so they
    # never extend a tile's prune and never resolve to occluded.
    tcap = _ray_tcap(root_lo - shift, root_hi - shift, op, dp)
    feats = _feats_from_cols(dp + dxo + op, w.shape[1], tcap=tcap)
    occ0 = skip_p.astype(jnp.int32)
    S, hull, bbox, first, cull_lo, cull_hi, w = _hier_setup(
        lo, hi, dirs_tiled, alive, orig_tiled, w, cs=cs)
    keys, counts = _tile_candidate_keys(cull_lo, cull_hi, dirs_tiled,
                                        orig_tiled, alive)
    occ, steps = _walk_pallas(
        counts, keys, feats, w, occ0, hull=hull, bbox=bbox, first=first,
        tcap_col=10, mode="any", stream=_use_stream(w),
        interpret=_interpret(), S=S)
    steps = steps[0, 0]
    result = (occ.reshape(-1)[:R] == 1) & ~skip
    if with_counts:
        cnts = {"traversal_steps": steps, "mt_block_visits": steps,
                "mt_pairs": steps * TILE * cs.cluster_size}
        return result, cnts
    return result


def any_hit_to_point(soup: TriangleSoup, dest, points, skip=None,
                     clusters=None, with_counts=False, exact_f64=False,
                     regroup=None):
    """Occlusion between each ``points[i]`` and the common point ``dest``.

    THE shadow-ray fast path: every shadow ray of a frame aims at the one
    sun, so the wavefront is re-parameterized as rays FROM ``dest``
    (t = 0) TO each receiving point (t = 1). A line through a fixed point
    is characterized by its direction alone — exactly the common-ORIGIN
    case — so the K = 4 feature factorization applies (2.5x fewer FMA
    lanes than the 10-feature generic form the reference-equivalent ray
    would need) and the per-tile direction hulls are as tight as the
    receiving points are coherent. The accept keeps the Möller-Trumbore
    sign test but swaps the t >= 0 bound for the window t <= 1 - eps:
    occluders strictly between light and receiver. Replaces the
    reference's shadow query (render.hpp:134-141) with one semantic
    deviation, documented at RenderConfig.reference_compat: the
    reference's tmax is unbounded, so geometry BEYOND the light also
    darkens there.

    ``points`` is (R, 3) or a 3-tuple of (R,) columns. ``skip`` marks
    rays whose answer is irrelevant. Boolean, intentionally
    non-differentiable (detached visibility).
    """
    if exact_f64:
        from ceres_tpu.ops import walk_f64

        cs64 = clusters if clusters is not None else \
            cl.build_clusters_treelet(
                jax.tree.map(jax.lax.stop_gradient, soup))
        result, cnts = walk_f64.any_hit_to_point_f64(
            cs64, jnp.asarray(dest), _cols(points), skip=skip)
        if with_counts:
            cnts["mt_pairs"] = (cnts["mt_block_visits"]
                                * TILE * cs64.cluster_size)
            return result, cnts
        return result
    soup, dest, p_cols = _detach_f32((soup, dest, _cols(points)))
    R = p_cols[0].shape[0]
    if clusters is None:
        cs = cl.build_clusters_treelet(soup)
    else:
        cs = _detach_f32(clusters)
    w = cl.cluster_weights_common_origin_packed(cs, dest)
    lo = cs.lo - dest
    hi = cs.hi - dest
    root_lo, root_hi = _scene_root(cs)
    if skip is None:
        skip = jnp.zeros((R,), bool)
    if regroup is None:
        # Screen tiles that straddle a DEPTH discontinuity mix receivers
        # from distant surfaces, so their world-space hulls sweep fat
        # tubes from the light (measured: candidate count correlates
        # 0.65 with per-tile receiver depth spread on the 1.27M-tri
        # scene; discontinuous tiles schedule 5x the supers). Re-tiling
        # the wavefront by receiver-POSITION morton code makes every
        # tile a compact surface patch and groups skip rays into dead
        # all-skip tiles. Measured NEGATIVE on the 1.27M-tri scene,
        # twice, for two different reasons: at the full 512-ray tile the
        # regrouped tiles are DENSE (screen tiles were ~20% alive), so
        # patches grow 5x and visits RISE (816 vs 602 ms/frame); at
        # 128-ray tiles the lane-work halves (67M -> 33M lane-visits)
        # but the walk goes DMA-bound — the 512 KB super fetch is per
        # SUPER VISIT, independent of tile width, so 4x the tiles means
        # 4x the stream traffic (613 ms: the prepass win refunded).
        # Default OFF; CERES_SHADOW_REGROUP=1 or regroup=True re-enable
        # (e.g. for VMEM-resident scenes where no DMA is involved).
        regroup = (_SHADOW_REGROUP == "1"
                   or (_SHADOW_REGROUP == "auto"
                       and cs.num_clusters > _HIER_MIN_CLUSTERS))
    perm = None
    if regroup:
        from ceres_tpu.accel import morton

        code = morton.morton_codes(jnp.stack(p_cols, axis=-1),
                                   root_lo, root_hi)
        code = jnp.where(skip, jnp.int32(0x7FFFFFFF), code)
        perm = jnp.argsort(code).astype(jnp.int32)
        # ONE row gather + identity matmul for dense columns (the winner
        # gather pattern; per-column 1-D gathers lower to scalar loops).
        table = jnp.stack([p_cols[0], p_cols[1], p_cols[2],
                           skip.astype(jnp.float32)], axis=-1)
        recT = jnp.matmul(jnp.eye(4, dtype=table.dtype),
                          jnp.transpose(table[perm]),
                          precision=jax.lax.Precision.HIGHEST)
        p_cols = (recT[0], recT[1], recT[2])
        skip = recT[3] > 0.5
    # Regrouped tiles are DENSE (every lane alive — skips pack into dead
    # tail tiles), so a full-TILE patch covers ~5x the surface of the
    # sparsely-alive screen tiles it replaces and its hull schedules
    # more, not less (measured 816 vs 602 ms/frame at 1.27M tris).
    # Shrink the tile so a regrouped patch matches the alive-lane count
    # the screen tiling had.
    tile = _REGROUP_TILE if perm is not None else TILE
    d = tuple(p_cols[a] - dest[a] for a in range(3))    # t=1 at the point
    dp = tuple(_pad_rays(c, tile) for c in d)
    dirs_tiled = tuple(c.reshape(-1, tile) for c in dp)
    skip_p = _pad_rays(skip, tile)
    alive = ~skip_p.reshape(-1, tile)
    alive = alive & ((dirs_tiled[0] * dirs_tiled[0]
                      + dirs_tiled[1] * dirs_tiled[1]
                      + dirs_tiled[2] * dirs_tiled[2]) > 0.0)
    # Visit cap: nothing past the receiving point can occlude, so the
    # root-exit cap is additionally clamped to t = 1 (+ slack for the
    # conservative entry bounds). Padding rays (zero dirs) keep tcap -1.
    tcap = _ray_tcap(root_lo - dest, root_hi - dest, None, dp)
    tcap = jnp.minimum(tcap, 1.0 + _ULP_PAD)
    feats = _feats_from_cols(dp, w.shape[1], tcap=tcap)
    occ0 = skip_p.astype(jnp.int32)
    S, hull, bbox, first, cull_lo, cull_hi, w = _hier_setup(
        lo, hi, dirs_tiled, alive, None, w, cs=cs)
    keys, counts = _tile_candidate_keys(cull_lo, cull_hi, dirs_tiled,
                                        alive=alive)
    occ, steps = _walk_pallas(
        counts, keys, feats, w, occ0, hull=hull, bbox=bbox, first=first,
        tcap_col=4, mode="any_dest", stream=_use_stream(w),
        interpret=_interpret(), S=S)
    steps = steps[0, 0]
    result = (occ.reshape(-1)[:R] == 1) & ~skip
    if perm is not None:
        # Scatter back to the caller's ray order (one int column).
        result = jnp.zeros((R,), jnp.int32).at[perm].set(
            result.astype(jnp.int32)) == 1
    if with_counts:
        cnts = {"traversal_steps": steps, "mt_block_visits": steps,
                "mt_pairs": steps * tile * cs.cluster_size}
        return result, cnts
    return result
