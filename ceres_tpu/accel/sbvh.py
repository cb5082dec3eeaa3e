"""Spatial-split BVH (SBVH) golden builder: Stich et al. 2009 semantics.

Capability parity with the reference's SpatialSplitBvhBuilder
(lib/bvh/spatial_split_bvh_builder.hpp:22-566) and the axis-plane triangle
clip it relies on (lib/bvh/triangle.hpp:60-93), rebuilt from scratch in
NumPy. Like the other golden builders (ceres_tpu.accel.golden_builders)
this is the host-side *quality oracle*: it emits the same FlatBvh layout —
child pairs adjacent, interleaved bounds — but its leaf ranges index a
*reference* array that may contain duplicates (spatial splits duplicate
straddling primitives into both children, budgeted by ``split_factor``).

Key constants preserved: ``split_factor = 0.3`` (the reference-duplication
budget, spatial_split_bvh_builder.hpp:547), ``alpha = 1e-5`` (spatial
splits are attempted only when the object split's children overlap by more
than alpha x root area, :74-75), 64 spatial bins (:66).
"""

from __future__ import annotations

import numpy as np

from ceres_tpu.accel.golden_builders import (
    MAX_DEPTH,
    MAX_LEAF_SIZE,
    TRAVERSAL_COST,
    FlatBvh,
    _half_area,
    _interleave,
)

SPLIT_FACTOR = 0.3   # spatial_split_bvh_builder.hpp:547
ALPHA = 1e-5         # :74-75
BIN_COUNT = 64       # :66


def split_triangle_box(p0, p1, p2, axis: int, pos: float):
    """Clip a triangle at the plane x[axis] = pos; return both halves' AABBs.

    The Triangle::split capability (triangle.hpp:60-93): walk the three
    edges; each vertex extends its own side's box; an edge crossing the
    plane contributes the (exactly-on-plane) intersection point to *both*
    boxes. Returns ((left_lo, left_hi), (right_lo, right_hi)); a side the
    triangle never touches comes back as an empty box (lo > hi).
    """
    verts = np.asarray([p0, p1, p2], np.float64)
    left_lo = np.full(3, np.inf)
    left_hi = np.full(3, -np.inf)
    right_lo = np.full(3, np.inf)
    right_hi = np.full(3, -np.inf)
    for i in range(3):
        a = verts[i]
        b = verts[(i + 1) % 3]
        if a[axis] <= pos:
            left_lo = np.minimum(left_lo, a)
            left_hi = np.maximum(left_hi, a)
        if a[axis] >= pos:
            right_lo = np.minimum(right_lo, a)
            right_hi = np.maximum(right_hi, a)
        # Edge straddles the plane -> both boxes get the crossing point.
        if (a[axis] < pos < b[axis]) or (b[axis] < pos < a[axis]):
            t = (pos - a[axis]) / (b[axis] - a[axis])
            q = a + t * (b - a)
            q[axis] = pos  # exact, regardless of FP in the lerp
            left_lo = np.minimum(left_lo, q)
            left_hi = np.maximum(left_hi, q)
            right_lo = np.minimum(right_lo, q)
            right_hi = np.maximum(right_hi, q)
    return (left_lo, left_hi), (right_lo, right_hi)


class SpatialSplitBvhBuilder:
    """Golden SBVH: full-sweep object splits + binned spatial splits.

    Works over *references* — (primitive id, clipped AABB, center) triples —
    so one triangle may appear in several leaves. ``build`` returns a
    FlatBvh whose ``prim_indices`` has ``reference_count >= T`` entries.
    """

    def __init__(self, p0, p1, p2, max_leaf_size: int = MAX_LEAF_SIZE,
                 split_factor: float = SPLIT_FACTOR,
                 bin_count: int = BIN_COUNT, alpha: float = ALPHA):
        self.p0 = np.asarray(p0, np.float64)
        self.p1 = np.asarray(p1, np.float64)
        self.p2 = np.asarray(p2, np.float64)
        T = self.p0.shape[0]
        pts = np.stack([self.p0, self.p1, self.p2], axis=1)
        self.tri_lo = pts.min(axis=1)
        self.tri_hi = pts.max(axis=1)
        self.max_leaf = max_leaf_size
        self.bin_count = bin_count
        self.alpha = alpha
        self.budget = int(split_factor * T)
        cap = 2 * (T + self.budget) + 1
        self.bounds = np.zeros((cap, 6), np.float32)
        self.prim_count = np.zeros(cap, np.uint32)
        self.first_child = np.zeros(cap, np.uint32)
        self.node_count = 1
        # Reference soup: start with one reference per primitive.
        self.ref_id = list(range(T))
        self.ref_lo = [self.tri_lo[i].copy() for i in range(T)]
        self.ref_hi = [self.tri_hi[i].copy() for i in range(T)]
        self.out_refs: list[int] = []
        self.leaves: list[tuple[int, int, int]] = []  # (node, start, count)

    # -- shared helpers ----------------------------------------------------

    def _union(self, refs):
        lo = np.min([self.ref_lo[r] for r in refs], axis=0)
        hi = np.max([self.ref_hi[r] for r in refs], axis=0)
        return lo, hi

    def build(self) -> FlatBvh:
        T = self.p0.shape[0]
        if T == 0:
            raise ValueError("empty scene")
        refs = list(range(T))
        lo, hi = self._union(refs)
        self.root_area = float(_half_area(lo, hi))
        self.bounds[0] = _interleave(lo.astype(np.float32),
                                     hi.astype(np.float32))
        self._recurse(0, refs, 0)
        # Emit leaf ranges into the flat reference array.
        for node, start, count in self.leaves:
            self.first_child[node] = start
            self.prim_count[node] = count
        n = self.node_count
        return FlatBvh(bounds=self.bounds[:n].copy(),
                       prim_count=self.prim_count[:n].copy(),
                       first_child=self.first_child[:n].copy(),
                       prim_indices=np.asarray(self.out_refs, np.uint32),
                       node_count=n)

    def _make_leaf(self, node, refs):
        start = len(self.out_refs)
        self.out_refs.extend(self.ref_id[r] for r in refs)
        self.leaves.append((node, start, len(refs)))

    # -- object split (full sweep, sweep_sah_builder semantics) ------------

    def _object_split(self, refs):
        size = len(refs)
        lo = np.asarray([self.ref_lo[r] for r in refs])
        hi = np.asarray([self.ref_hi[r] for r in refs])
        centers = (lo + hi) * 0.5
        best = (np.inf, None, None, None, 0.0)
        for axis in range(3):
            order = np.argsort(centers[:, axis], kind="stable")
            lo_s, hi_s = lo[order], hi[order]
            left_lo = np.minimum.accumulate(lo_s, 0)
            left_hi = np.maximum.accumulate(hi_s, 0)
            right_lo = np.minimum.accumulate(lo_s[::-1], 0)[::-1]
            right_hi = np.maximum.accumulate(hi_s[::-1], 0)[::-1]
            k = np.arange(1, size)
            cost = (_half_area(left_lo[:-1], left_hi[:-1]) * k
                    + _half_area(right_lo[1:], right_hi[1:]) * (size - k))
            i = int(np.argmin(cost))
            if cost[i] < best[0]:
                # Overlap of the two children (drives the spatial-split
                # attempt decision, spatial_split_bvh_builder.hpp:237-247).
                olo = np.maximum(left_lo[i], right_lo[i + 1])
                ohi = np.minimum(left_hi[i], right_hi[i + 1])
                overlap = float(_half_area(olo, ohi)) if (ohi > olo).all() else 0.0
                best = (cost[i], axis, order, i + 1, overlap)
        cost, axis, order, mid, overlap = best
        left = [refs[j] for j in order[:mid]]
        right = [refs[j] for j in order[mid:]]
        return cost, left, right, overlap

    # -- spatial split (binned, with reference clipping) --------------------

    def _spatial_split(self, refs, node_lo, node_hi):
        """Best binned spatial split; returns (cost, axis, position) or None."""
        best = (np.inf, None, None)
        K = self.bin_count
        lo = np.asarray([self.ref_lo[r] for r in refs])
        hi = np.asarray([self.ref_hi[r] for r in refs])
        for axis in range(3):
            extent = node_hi[axis] - node_lo[axis]
            if extent <= 0:
                continue
            edges = node_lo[axis] + extent * np.arange(1, K) / K
            # Chained-bin entry/exit counts (the reference streams each
            # reference through the bins it straddles, :296-346); here the
            # per-bin clipped boxes come from repeated plane clips.
            first = np.clip(((lo[:, axis] - node_lo[axis]) / extent * K)
                            .astype(np.int64), 0, K - 1)
            last = np.clip(((hi[:, axis] - node_lo[axis]) / extent * K)
                           .astype(np.int64), 0, K - 1)
            bin_lo = np.full((K, 3), np.inf)
            bin_hi = np.full((K, 3), -np.inf)
            entry = np.zeros(K, np.int64)
            exit_ = np.zeros(K, np.int64)
            for j, r in enumerate(refs):
                entry[first[j]] += 1
                exit_[last[j]] += 1
                cur_lo = self.ref_lo[r]
                cur_hi = self.ref_hi[r]
                i = int(self.ref_id[r])
                for b in range(first[j], last[j] + 1):
                    if b < last[j]:
                        (seg, cur) = self._clip_ref(
                            i, cur_lo, cur_hi, axis,
                            node_lo[axis] + extent * (b + 1) / K)
                        cur_lo, cur_hi = cur
                    else:
                        seg = (cur_lo, cur_hi)
                    bin_lo[b] = np.minimum(bin_lo[b], seg[0])
                    bin_hi[b] = np.maximum(bin_hi[b], seg[1])
            left_lo = np.minimum.accumulate(bin_lo, 0)
            left_hi = np.maximum.accumulate(bin_hi, 0)
            right_lo = np.minimum.accumulate(bin_lo[::-1], 0)[::-1]
            right_hi = np.maximum.accumulate(bin_hi[::-1], 0)[::-1]
            lcnt = np.cumsum(entry)
            rcnt = np.cumsum(exit_[::-1])[::-1]
            cost = (_half_area(left_lo[:-1], left_hi[:-1]) * lcnt[:-1]
                    + _half_area(right_lo[1:], right_hi[1:]) * rcnt[1:])
            cost = np.where((lcnt[:-1] == 0) | (rcnt[1:] == 0), np.inf, cost)
            b = int(np.argmin(cost))
            if cost[b] < best[0]:
                best = (float(cost[b]), axis, float(edges[b]))
        if best[1] is None:
            return None
        return best

    def _clip_ref(self, tri, cur_lo, cur_hi, axis, pos):
        """Clip reference (already a sub-box of triangle ``tri``) at a plane.

        Returns ((left_lo, left_hi), (right_lo, right_hi)) both intersected
        with the incoming reference box (the chained clipping of
        spatial_split_bvh_builder.hpp:318-335).
        """
        (llo, lhi), (rlo, rhi) = split_triangle_box(
            self.p0[tri], self.p1[tri], self.p2[tri], axis, pos)
        llo = np.maximum(llo, cur_lo)
        lhi = np.minimum(lhi, cur_hi)
        rlo = np.maximum(rlo, cur_lo)
        rhi = np.minimum(rhi, cur_hi)
        lhi[axis] = min(lhi[axis], pos)
        rlo[axis] = max(rlo[axis], pos)
        return (llo, lhi), ((rlo, rhi))

    def _apply_spatial(self, refs, axis, pos):
        """Partition references at the plane, duplicating straddlers.

        Straddling references are duplicated while the budget lasts
        (clipped boxes on both sides); once exhausted they are *unsplit* to
        the side holding more of their extent (the reference's unsplitting
        fallback, :422-454).
        """
        left, right = [], []
        for r in refs:
            if self.ref_hi[r][axis] <= pos:
                left.append(r)
            elif self.ref_lo[r][axis] >= pos:
                right.append(r)
            else:
                (llo, lhi), (rlo, rhi) = self._clip_ref(
                    int(self.ref_id[r]), self.ref_lo[r], self.ref_hi[r],
                    axis, pos)
                degenerate = (lhi < llo).any() or (rhi < rlo).any()
                if self.budget > 0 and not degenerate:
                    self.budget -= 1
                    self.ref_lo[r], self.ref_hi[r] = llo, lhi
                    left.append(r)
                    self.ref_id.append(self.ref_id[r])
                    self.ref_lo.append(rlo)
                    self.ref_hi.append(rhi)
                    right.append(len(self.ref_id) - 1)
                else:
                    mid = (self.ref_lo[r][axis] + self.ref_hi[r][axis]) * 0.5
                    (left if mid <= pos else right).append(r)
        return left, right

    # -- recursion ----------------------------------------------------------

    def _recurse(self, node, refs, depth):
        size = len(refs)
        if size <= 1 or depth >= MAX_DEPTH:
            self._make_leaf(node, refs)
            return
        node_lo, node_hi = self._union(refs)
        node_area = float(_half_area(node_lo, node_hi))

        obj_cost, obj_l, obj_r, overlap = self._object_split(refs)
        use_spatial = None
        # Try a spatial split only when object-split children overlap
        # significantly (alpha threshold on root area, :74-75,237-247).
        if overlap > self.alpha * self.root_area and self.budget > 0:
            sp = self._spatial_split(refs, node_lo, node_hi)
            if sp is not None and sp[0] < obj_cost:
                use_spatial = sp

        best_cost = use_spatial[0] if use_spatial else obj_cost
        if (best_cost / max(node_area, 1e-300) + TRAVERSAL_COST
                >= size and size <= self.max_leaf):
            self._make_leaf(node, refs)
            return

        if use_spatial:
            _, axis, pos = use_spatial
            left, right = self._apply_spatial(refs, axis, pos)
            if not left or not right:  # numerical corner: fall back
                left, right = obj_l, obj_r
        else:
            left, right = obj_l, obj_r

        child = self.node_count
        self.node_count += 2  # adjacent child pair (bvh.hpp:86-91)
        self.first_child[node] = child
        self.prim_count[node] = 0
        for c, part in ((child, left), (child + 1, right)):
            lo, hi = self._union(part)
            self.bounds[c] = _interleave(lo.astype(np.float32),
                                         hi.astype(np.float32))
        self._recurse(child, left, depth + 1)
        self._recurse(child + 1, right, depth + 1)


def build_sbvh(p0, p1, p2, **kw) -> FlatBvh:
    return SpatialSplitBvhBuilder(p0, p1, p2, **kw).build()


def validate_sbvh(bvh: FlatBvh, num_triangles: int) -> None:
    """SBVH-specific invariants: leaf ranges partition the reference array
    (which may repeat primitive ids), every primitive appears at least
    once, and child boxes nest in their parent."""
    R = bvh.prim_indices.shape[0]
    seen = np.zeros(R, bool)
    covered = np.zeros(num_triangles, bool)
    stack = [0]
    visited = 0
    while stack:
        i = stack.pop()
        visited += 1
        lo_i = bvh.bounds[i, 0::2]
        hi_i = bvh.bounds[i, 1::2]
        if bvh.prim_count[i] > 0:
            a = int(bvh.first_child[i])
            b = a + int(bvh.prim_count[i])
            assert b <= R
            assert not seen[a:b].any(), "leaf reference ranges overlap"
            seen[a:b] = True
            covered[bvh.prim_indices[a:b].astype(np.int64)] = True
        else:
            c = int(bvh.first_child[i])
            assert 0 < c < bvh.node_count - 1
            for ch in (c, c + 1):
                assert (bvh.bounds[ch, 0::2] >= lo_i - 1e-4).all()
                assert (bvh.bounds[ch, 1::2] <= hi_i + 1e-4).all()
                stack.append(ch)
    assert seen.all(), "reference array has dead entries"
    assert covered.all(), "a primitive vanished from every leaf"
    assert visited == bvh.node_count
