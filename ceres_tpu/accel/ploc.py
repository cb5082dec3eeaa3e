"""PLOC: parallel locally-ordered agglomerative clustering, pure JAX.

Capability parity with LocallyOrderedClusteringBuilder
(lib/bvh/locally_ordered_clustering_builder.hpp:20-235): morton-sort the
leaves, then repeatedly let every cluster pick its minimum-union-area
neighbor within a +-``search_radius`` window of the sorted order; mutual
pairs merge. The reference resolves conflicts with atomics and compacts
with a prefix sum across a thread pool — here one ``lax.while_loop``
iteration does the whole round as dense vector ops: windowed area
candidates as shifted-array passes, mutual-match detection by gather,
compaction by cumsum. At least one pair (the global minimum) merges each
round, so the loop terminates in <= N-1 rounds (typically ~log N).

Output is a binary tree in the Lbvh child encoding (internal id >= 0,
leaf encoded -(leaf+1)); leaves are morton-ordered triangles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ceres_tpu.accel import morton
from ceres_tpu.models.mesh import TriangleSoup

SEARCH_RADIUS = 14  # reference default (locally_ordered_clustering_builder.hpp:57)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlocTree:
    order: jax.Array    # (T,) morton order: sorted pos -> original tri id
    left: jax.Array     # (T-1,) child code (internal id or -(leaf+1))
    right: jax.Array    # (T-1,)
    node_lo: jax.Array  # (T-1, 3)
    node_hi: jax.Array  # (T-1, 3)
    leaf_lo: jax.Array  # (T, 3)
    leaf_hi: jax.Array  # (T, 3)
    root: jax.Array     # () int32: internal id of the root


def _half_area(lo, hi):
    d = jnp.maximum(hi - lo, 0.0)
    return d[..., 0] * (d[..., 1] + d[..., 2]) + d[..., 1] * d[..., 2]


def build_ploc(soup: TriangleSoup, search_radius: int = SEARCH_RADIUS) -> PlocTree:
    T = soup.num_triangles
    if T < 2:
        raise ValueError("PLOC needs at least 2 triangles")

    centers = jax.lax.stop_gradient((soup.p0 + soup.p1 + soup.p2) / 3.0)
    order = morton.morton_order(centers)
    p0 = jax.lax.stop_gradient(soup.p0)[order]
    p1 = jax.lax.stop_gradient(soup.p0 - soup.e1)[order]
    p2 = jax.lax.stop_gradient(soup.p0 + soup.e2)[order]
    pts = jnp.stack([p0, p1, p2], axis=1)
    leaf_lo = pts.min(axis=1)
    leaf_hi = pts.max(axis=1)

    n_nodes = 2 * T - 1  # leaves [0, T) + internals [T, 2T-1) in one pool
    INF = jnp.inf
    all_lo = jnp.concatenate([leaf_lo, jnp.full((T - 1, 3), INF)])
    all_hi = jnp.concatenate([leaf_hi, jnp.full((T - 1, 3), -INF)])
    active = jnp.arange(T, dtype=jnp.int32)        # node-pool ids, padded
    left = jnp.zeros((T - 1,), jnp.int32)
    right = jnp.zeros((T - 1,), jnp.int32)

    def round_fn(state):
        active, num_active, all_lo, all_hi, left, right, num_internal = state
        idx = jnp.arange(T)
        valid = idx < num_active
        ids = jnp.where(valid, active, 0)
        alo = all_lo[ids]
        ahi = all_hi[ids]

        best_area = jnp.full((T,), INF)
        best_j = idx.astype(jnp.int32)
        for d in range(1, search_radius + 1):
            # Pair (i, i+d): union area, valid when both ends are active.
            u_lo = jnp.minimum(alo, jnp.roll(alo, -d, axis=0))
            u_hi = jnp.maximum(ahi, jnp.roll(ahi, -d, axis=0))
            area = _half_area(u_lo, u_hi)
            ok = valid & (idx + d < num_active)
            area = jnp.where(ok, area, INF)
            # i prefers i+d
            better = area < best_area
            best_area = jnp.where(better, area, best_area)
            best_j = jnp.where(better, (idx + d).astype(jnp.int32), best_j)
            # i+d prefers i
            area_s = jnp.roll(area, d, axis=0)
            better = area_s < best_area
            best_area = jnp.where(better, area_s, best_area)
            best_j = jnp.where(better, (idx - d).astype(jnp.int32), best_j)

        mutual = (best_j[jnp.clip(best_j, 0, T - 1)] == idx) & valid
        merge_lead = mutual & (best_j > idx)      # i merges with j = best_j > i

        # Allocate new internal nodes for the leads.
        lead_rank = jnp.cumsum(merge_lead.astype(jnp.int32)) - 1
        new_id = T + num_internal + lead_rank      # node-pool id
        n_merges = jnp.sum(merge_lead.astype(jnp.int32))

        j_ids = active[jnp.clip(best_j, 0, T - 1)]
        m_lo = jnp.minimum(alo, all_lo[j_ids])
        m_hi = jnp.maximum(ahi, all_hi[j_ids])

        # Scatter the merged nodes (drop non-leads).
        tgt = jnp.where(merge_lead, new_id, n_nodes)
        all_lo = all_lo.at[tgt].set(m_lo, mode="drop")
        all_hi = all_hi.at[tgt].set(m_hi, mode="drop")

        def encode(pool_id):
            return jnp.where(pool_id < T, -(pool_id + 1), pool_id - T)

        itgt = jnp.where(merge_lead, new_id - T, T - 1)
        left = left.at[itgt].set(encode(ids), mode="drop")
        right = right.at[itgt].set(encode(j_ids), mode="drop")

        # Compact: leads become their new node, partners vanish.
        partner = mutual & (best_j < idx)
        keep = valid & ~partner
        new_active_entry = jnp.where(merge_lead, new_id.astype(jnp.int32),
                                     active)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        compact_tgt = jnp.where(keep, pos, T)
        active = jnp.full((T,), 0, jnp.int32).at[compact_tgt].set(
            new_active_entry, mode="drop")
        return (active, num_active - n_merges, all_lo, all_hi, left, right,
                num_internal + n_merges)

    def cond_fn(state):
        return state[1] > 1

    state = (active, jnp.int32(T), all_lo, all_hi, left, right, jnp.int32(0))
    active, _, all_lo, all_hi, left, right, num_internal = jax.lax.while_loop(
        cond_fn, round_fn, state)

    return PlocTree(order=order, left=left, right=right,
                    node_lo=all_lo[T:], node_hi=all_hi[T:],
                    leaf_lo=leaf_lo, leaf_hi=leaf_hi,
                    root=active[0] - T)


def sah_cost(tree: PlocTree, traversal_cost: float = 1.0) -> jax.Array:
    """Whole-tree SAH cost (sah_based_algorithm.hpp:21-32), leaf size 1."""
    inner = jnp.sum(_half_area(tree.node_lo, tree.node_hi)) * traversal_cost
    leaves = jnp.sum(_half_area(tree.leaf_lo, tree.leaf_hi))
    root = tree.root
    return (inner + leaves) / _half_area(tree.node_lo[root], tree.node_hi[root])
