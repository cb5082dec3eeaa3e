"""LBVH: Karras-style linear BVH built with sort + vectorized searches.

Capability parity with the reference's morton-code builder stack
(lib/bvh/linear_bvh_builder.hpp:16-186, morton_code_based_builder.hpp:16-86,
bottom_up_algorithm.hpp:15-86, hierarchy_refitter.hpp:10-46), redesigned for
XLA: no work queues, no atomics, no per-node recursion — one radix sort
(``jax.lax.sort``), then every internal node's range/split found
*independently* by fixed-trip-count doubling + binary search over the
sorted keys (the scheme of Karras 2012, which the reference's iterated
merge loop approximates), then bounding boxes refit bottom-up with a fixed
number of level passes instead of the reference's atomic-flag climb.

Tree shape: T leaves (one per triangle, in morton order), T-1 internal
nodes. Internal node i covers the contiguous sorted-triangle range
[range_lo[i], range_hi[i]] and splits it at gamma[i]: left child covers
[lo, gamma], right child [gamma+1, hi]; a child is a leaf iff its range is
one triangle. Keys are (morton30, index) pairs so they are strictly
unique — the index tiebreak replaces the reference's duplicate-key
prefix-level trick (linear_bvh_builder.hpp:158-160).

Everything is jittable with static shapes; gradients never flow through
tree topology (ordering is detached), but refit is differentiable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ceres_tpu.accel import morton
from ceres_tpu.models.mesh import TriangleSoup

MAX_DEPTH = 64  # matches the reference's builder bound (top_down_builder.hpp:36)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Lbvh:
    """Flattened LBVH over T morton-sorted triangles.

    Internal node arrays have length T-1 (node 0 is the root); leaf k is
    the k-th sorted triangle. ``left``/``right`` encode children as
    non-negative internal-node ids or ``-(leaf_id + 1)`` for leaves.
    """

    order: jax.Array      # (T,) int32: sorted position -> original triangle id
    left: jax.Array       # (T-1,) int32
    right: jax.Array      # (T-1,) int32
    range_lo: jax.Array   # (T-1,) int32 inclusive
    range_hi: jax.Array   # (T-1,) int32 inclusive
    parent: jax.Array     # (T-1,) int32, -1 for root
    leaf_parent: jax.Array  # (T,) int32 parent internal node of each leaf
    node_lo: jax.Array    # (T-1, 3) internal-node AABB min
    node_hi: jax.Array    # (T-1, 3)
    leaf_lo: jax.Array    # (T, 3) leaf AABB min (sorted order)
    leaf_hi: jax.Array    # (T, 3)

    @property
    def num_triangles(self) -> int:
        return self.order.shape[0]


def _delta_fn(hi_keys, lo_keys, n):
    """delta(i, j): common-prefix length of keys i and j; -1 out of range."""

    def delta(i, j):
        ok = (j >= 0) & (j <= n - 1)
        js = jnp.clip(j, 0, n - 1)
        hx = hi_keys[i] ^ hi_keys[js]
        lx = lo_keys[i] ^ lo_keys[js]
        d = jnp.where(hx != 0, jax.lax.clz(hx), 32 + jax.lax.clz(lx))
        return jnp.where(ok, d, -1)

    return delta


def build_lbvh(soup: TriangleSoup) -> Lbvh:
    """Build the LBVH for a triangle soup (T >= 2)."""
    T = soup.num_triangles
    if T < 2:
        raise ValueError("LBVH needs at least 2 triangles")

    centers = jax.lax.stop_gradient((soup.p0 + soup.p1 + soup.p2) / 3.0)
    lo_w = centers.min(axis=0)
    hi_w = centers.max(axis=0)
    codes = morton.morton_codes(centers, lo_w, hi_w)
    order = jnp.argsort(codes).astype(jnp.int32)
    hi_keys = codes[order]                      # (T,) int32, sorted
    lo_keys = jnp.arange(T, dtype=jnp.int32)    # tiebreak: unique by position

    n = T
    delta = _delta_fn(hi_keys, lo_keys, n)
    i = jnp.arange(n - 1, dtype=jnp.int32)

    # Direction: toward the longer common prefix (Karras eq. for d).
    d = jnp.where(delta(i, i + 1) >= delta(i, i - 1), 1, -1).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # Upper bound for the range length by doubling (fixed 32 steps covers
    # any T < 2^31).
    def dbl_body(_, lmax):
        probe = i + lmax * d
        grow = delta(i, probe) > delta_min
        return jnp.where(grow, lmax * 2, lmax)

    lmax = jax.lax.fori_loop(0, 32, dbl_body, jnp.full_like(i, 2))

    # Binary search the exact other end j = i + l*d.
    def bs_body(k, carry):
        l, step = carry
        step = jnp.maximum(step // 2, 1)
        probe = i + (l + step) * d
        ok = delta(i, probe) > delta_min
        l = jnp.where(ok, l + step, l)
        return l, step

    l, _ = jax.lax.fori_loop(
        0, 33, bs_body, (jnp.zeros_like(i), lmax))
    j = i + l * d

    # Split position gamma by binary search on the node's own prefix.
    delta_node = delta(i, j)

    def split_body(k, carry):
        s, step = carry
        step = (step + 1) // 2
        probe = i + (s + step) * d
        ok = delta(i, probe) > delta_node
        s = jnp.where(ok & (s + step < l), s + step, s)
        return s, step

    s, _ = jax.lax.fori_loop(0, 33, split_body,
                             (jnp.zeros_like(i), l))
    gamma = i + s * d + jnp.minimum(d, 0)

    rlo = jnp.minimum(i, j)
    rhi = jnp.maximum(i, j)
    left_is_leaf = rlo == gamma
    right_is_leaf = rhi == gamma + 1
    left = jnp.where(left_is_leaf, -(gamma + 1), gamma)
    right = jnp.where(right_is_leaf, -(gamma + 2), gamma + 1)

    # Parents by scatter (the bottom_up_algorithm parents array); children
    # that are leaves scatter into the dropped out-of-range slot instead.
    parent = jnp.full((n - 1,), -1, jnp.int32)
    leaf_parent = jnp.zeros((n,), jnp.int32)
    parent = parent.at[jnp.where(left_is_leaf, n - 1, gamma)].set(i, mode="drop")
    parent = parent.at[jnp.where(right_is_leaf, n - 1, gamma + 1)].set(
        i, mode="drop")
    leaf_parent = leaf_parent.at[jnp.where(left_is_leaf, gamma, n)].set(
        i, mode="drop")
    leaf_parent = leaf_parent.at[jnp.where(right_is_leaf, gamma + 1, n)].set(
        i, mode="drop")

    # Leaf AABBs in sorted order.
    p0 = soup.p0[order]
    p1 = (soup.p0 - soup.e1)[order]
    p2 = (soup.p0 + soup.e2)[order]
    pts = jnp.stack([p0, p1, p2], axis=1)
    leaf_lo = pts.min(axis=1)
    leaf_hi = pts.max(axis=1)

    node_lo, node_hi = _refit_boxes(left, right, leaf_lo, leaf_hi)

    return Lbvh(order=order, left=left, right=right,
                range_lo=rlo, range_hi=rhi, parent=parent,
                leaf_parent=leaf_parent,
                node_lo=node_lo, node_hi=node_hi,
                leaf_lo=leaf_lo, leaf_hi=leaf_hi)


def _child_box(c, node_lo, node_hi, leaf_lo, leaf_hi):
    """AABB of a child encoded as internal id or -(leaf+1)."""
    is_leaf = c < 0
    leaf_id = jnp.clip(-c - 1, 0)
    int_id = jnp.clip(c, 0)
    lo = jnp.where(is_leaf[:, None], leaf_lo[leaf_id], node_lo[int_id])
    hi = jnp.where(is_leaf[:, None], leaf_hi[leaf_id], node_hi[int_id])
    return lo, hi


def _refit_boxes(left, right, leaf_lo, leaf_hi):
    """Bottom-up AABB computation by fixed-depth iteration.

    Replaces the reference's atomic-flag bottom-up climb
    (bottom_up_algorithm.hpp:70-83): MAX_DEPTH dense passes of
    child-gather + min/max converge because every pass finalizes the next
    level up (morton trees over (code, index) keys are at most 62 deep;
    MAX_DEPTH=64 covers it).
    """
    n1 = left.shape[0]
    node_lo = jnp.broadcast_to(jnp.inf, (n1, 3))
    node_hi = jnp.broadcast_to(-jnp.inf, (n1, 3))

    def body(_, carry):
        nlo, nhi = carry
        llo, lhi = _child_box(left, nlo, nhi, leaf_lo, leaf_hi)
        rlo, rhi = _child_box(right, nlo, nhi, leaf_lo, leaf_hi)
        return jnp.minimum(llo, rlo), jnp.maximum(lhi, rhi)

    return jax.lax.fori_loop(0, MAX_DEPTH, body, (node_lo, node_hi))


def refit(bvh: Lbvh, soup: TriangleSoup) -> Lbvh:
    """Recompute all AABBs for moved vertices, keeping the topology.

    The HierarchyRefitter capability (hierarchy_refitter.hpp:10-46) for
    animated geometry: differentiable w.r.t. the soup.
    """
    p0 = soup.p0[bvh.order]
    p1 = (soup.p0 - soup.e1)[bvh.order]
    p2 = (soup.p0 + soup.e2)[bvh.order]
    pts = jnp.stack([p0, p1, p2], axis=1)
    leaf_lo = pts.min(axis=1)
    leaf_hi = pts.max(axis=1)
    node_lo, node_hi = _refit_boxes(bvh.left, bvh.right, leaf_lo, leaf_hi)
    return dataclasses.replace(bvh, node_lo=node_lo, node_hi=node_hi,
                               leaf_lo=leaf_lo, leaf_hi=leaf_hi)


def sah_cost(bvh: Lbvh, traversal_cost: float = 1.0) -> jax.Array:
    """Whole-tree SAH cost, normalized by root area.

    The quality metric of sah_based_algorithm.hpp:21-32 with leaf size 1:
    cost = (traversal_cost * sum(inner half areas) + sum(leaf half areas))
           / root half area.
    """

    def half_area(lo, hi):
        d = hi - lo
        return d[..., 0] * (d[..., 1] + d[..., 2]) + d[..., 1] * d[..., 2]

    inner = jnp.sum(half_area(bvh.node_lo, bvh.node_hi)) * traversal_cost
    leaves = jnp.sum(half_area(bvh.leaf_lo, bvh.leaf_hi))
    return (inner + leaves) / half_area(bvh.node_lo[0], bvh.node_hi[0])


def cluster_cut(bvh: Lbvh, cluster_size: int):
    """Partition sorted triangles into treelet clusters of <= cluster_size.

    A node is *cut* when its range fits in a cluster but its parent's does
    not; cut-node ranges tile [0, T) exactly (every internal range is
    contiguous in morton order). Returns (starts, cluster_of_sorted_pos):
    ``starts`` is a (T,) 0/1 array marking cluster starts; cluster ids are
    its prefix sums. Replaces the LeafCollapser capability
    (leaf_collapser.hpp:18-148) — instead of collapsing leaves into the
    node array, the collapsed subtrees *become* the traversal primitive.
    """
    T = bvh.num_triangles
    size = bvh.range_hi - bvh.range_lo + 1
    psize = jnp.where(bvh.parent >= 0, size[jnp.clip(bvh.parent, 0)], T + 1)
    cut = (size <= cluster_size) & (psize > cluster_size)
    # Leaves whose parent is already too big form singleton clusters.
    leaf_psize = size[bvh.leaf_parent]
    leaf_cut = leaf_psize > cluster_size

    starts = jnp.zeros((T,), jnp.int32)
    starts = starts.at[jnp.where(cut, bvh.range_lo, T)].set(1, mode="drop")
    starts = starts.at[jnp.where(leaf_cut, jnp.arange(T, dtype=jnp.int32),
                                 T)].set(1, mode="drop")
    cluster_of = jnp.cumsum(starts) - 1
    return starts, cluster_of


def super_cut(bvh: Lbvh, fine_starts: jax.Array, max_fine: int):
    """SECOND-level treelet cut: supers of <= ``max_fine`` FINE clusters.

    The two-level walk's upper level (megakernel two-level mode): a super
    is a maximal subtree containing at most ``max_fine`` fine-cluster
    starts (``fine_starts`` is :func:`cluster_cut`'s starts array), so
    every super is a REAL tree node whose box is the union of whole fine
    clusters — in contrast to unions of S *consecutive* blocks, which
    are loose wherever the morton curve jumps. A super's fine members
    are contiguous in cut order (cut ranges tile the sorted positions
    and never split a fine cluster: a cut node strictly inside a fine
    cluster would have a parent with <= 1 start, never > max_fine).

    Returns (starts2, super_of_pos): same encoding as cluster_cut, at
    super granularity.
    """
    T = bvh.num_triangles
    ps = jnp.cumsum(fine_starts)                     # starts up to pos
    lo = bvh.range_lo
    cnt = ps[bvh.range_hi] - jnp.where(lo > 0, ps[jnp.clip(lo - 1, 0)], 0)
    pcnt = jnp.where(bvh.parent >= 0, cnt[jnp.clip(bvh.parent, 0)], T + 1)
    cut = (cnt <= max_fine) & (pcnt > max_fine)
    leaf_pcnt = cnt[bvh.leaf_parent]
    leaf_cut = leaf_pcnt > max_fine

    starts2 = jnp.zeros((T,), jnp.int32)
    starts2 = starts2.at[jnp.where(cut, lo, T)].set(1, mode="drop")
    starts2 = starts2.at[jnp.where(leaf_cut, jnp.arange(T, dtype=jnp.int32),
                                  T)].set(1, mode="drop")
    super_of = jnp.cumsum(starts2) - 1
    return starts2, super_of
