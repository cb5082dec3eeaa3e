"""Triangle-mesh scene model.

Capability parity with the reference's Triangle primitive and per-vertex
normal averaging (reference: lib/bvh/triangle.hpp:27-34, lib/obj_norms.hpp:94-111),
rebuilt as flat JAX arrays so every derived quantity is differentiable
w.r.t. vertex positions.

Conventions reproduced exactly:
  * Triangle record is the precomputed Möller-Trumbore form
    ``p0, e1 = p0 - p1, e2 = p2 - p0, n = cross(e1, e2)`` — the left-handed
    normal convention of the reference (triangle.hpp:31-33).
  * Vertex normals accumulate the *unnormalized* face normal ``n`` (whose
    magnitude is twice the face area, so the average is area-weighted) onto
    each of the face's three corners and are normalized once at the end
    (obj_norms.hpp:94-96,109-111).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mesh:
    """An indexed triangle mesh: (V, 3) float vertices + (F, 3) int32 faces."""

    vertices: jax.Array  # (V, 3) float
    faces: jax.Array     # (F, 3) int32

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleSoup:
    """Flat per-triangle arrays in precomputed Möller-Trumbore form.

    All fields are (F, 3). ``corner_normals`` is (F, 3, 3): the averaged,
    normalized vertex normal at each of the triangle's three corners in face
    winding order — what the reference calls ``tri_norms``
    (obj_norms.hpp:113-115).
    """

    p0: jax.Array
    e1: jax.Array  # p0 - p1
    e2: jax.Array  # p2 - p0
    n: jax.Array   # cross(e1, e2): left-handed, |n| = 2 * area
    corner_normals: Optional[jax.Array] = None

    @property
    def num_triangles(self) -> int:
        return self.p0.shape[0]

    @property
    def p1(self) -> jax.Array:
        return self.p0 - self.e1

    @property
    def p2(self) -> jax.Array:
        return self.p0 + self.e2

    def bounds(self) -> tuple[jax.Array, jax.Array]:
        """Per-triangle AABBs: ((F, 3) lo, (F, 3) hi)."""
        pts = jnp.stack([self.p0, self.p1, self.p2], axis=1)  # (F, 3, 3)
        return pts.min(axis=1), pts.max(axis=1)

    def centers(self) -> jax.Array:
        """Triangle centroids, (F, 3) (reference: triangle.hpp:46-48)."""
        return (self.p0 + self.p1 + self.p2) / 3.0

    def areas(self) -> jax.Array:
        """Triangle areas = |n| / 2 (reference: triangle.hpp:56-58)."""
        return 0.5 * jnp.linalg.norm(self.n, axis=-1)


def face_normals(vertices: jax.Array, faces: jax.Array) -> jax.Array:
    """Unnormalized left-handed face normals: cross(p0 - p1, p2 - p0)."""
    p0 = vertices[faces[:, 0]]
    p1 = vertices[faces[:, 1]]
    p2 = vertices[faces[:, 2]]
    return jnp.cross(p0 - p1, p2 - p0)


def vertex_normals(vertices: jax.Array, faces: jax.Array) -> jax.Array:
    """Area-weighted averaged vertex normals, (V, 3), normalized.

    Each face's unnormalized normal is scattered onto its three corner
    vertices; the per-vertex sums are normalized once at the end — exactly
    the reference accumulation (obj_norms.hpp:94-96,109-111). Differentiable
    w.r.t. ``vertices``.
    """
    n = face_normals(vertices, faces)
    acc = jnp.zeros_like(vertices)
    acc = acc.at[faces[:, 0]].add(n)
    acc = acc.at[faces[:, 1]].add(n)
    acc = acc.at[faces[:, 2]].add(n)
    # Vertices referenced by no face keep a zero accumulator; guard the
    # normalize so they come out zero instead of NaN (they are never shaded).
    length = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return acc / jnp.where(length > 0, length, 1.0)


def triangle_soup(
    vertices: jax.Array,
    faces: jax.Array,
    with_normals: bool = True,
) -> TriangleSoup:
    """Build the flat Möller-Trumbore triangle records from an indexed mesh."""
    p0 = vertices[faces[:, 0]]
    p1 = vertices[faces[:, 1]]
    p2 = vertices[faces[:, 2]]
    e1 = p0 - p1
    e2 = p2 - p0
    n = jnp.cross(e1, e2)
    corner = None
    if with_normals:
        vn = vertex_normals(vertices, faces)
        corner = vn[faces]  # (F, 3, 3)
    return TriangleSoup(p0=p0, e1=e1, e2=e2, n=n, corner_normals=corner)


def soup_from_points(p0: jax.Array, p1: jax.Array, p2: jax.Array) -> TriangleSoup:
    """Triangle records straight from three (F, 3) corner-point arrays."""
    e1 = p0 - p1
    e2 = p2 - p0
    return TriangleSoup(p0=p0, e1=e1, e2=e2, n=jnp.cross(e1, e2))


def subdivide(vertices, faces, levels: int = 1):
    """Midpoint (1 -> 4) subdivision of an indexed mesh, ``levels`` times.

    Large-scene generator for the streaming benchmarks (the reference has
    no subdivision; its largest asset is the 23k-triangle dragon). Shared
    edges get shared midpoints, so the surface stays watertight. NumPy
    host-side (scene prep, like OBJ loading).
    """
    import numpy as np

    v = np.asarray(vertices)
    f = np.asarray(faces)
    for _ in range(levels):
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges_sorted = np.sort(edges, axis=1)
        uniq, inv = np.unique(edges_sorted, axis=0, return_inverse=True)
        mids = 0.5 * (v[uniq[:, 0]] + v[uniq[:, 1]])
        m01 = inv[:len(f)] + len(v)
        m12 = inv[len(f):2 * len(f)] + len(v)
        m20 = inv[2 * len(f):] + len(v)
        v = np.concatenate([v, mids])
        f = np.concatenate([
            np.stack([f[:, 0], m01, m20], 1),
            np.stack([m01, f[:, 1], m12], 1),
            np.stack([m20, m12, f[:, 2]], 1),
            np.stack([m01, m12, m20], 1),
        ]).astype(f.dtype)
    return v.astype(np.asarray(vertices).dtype), f
