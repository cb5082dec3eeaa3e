"""Sphere primitive: batched ray-sphere intersection.

Capability parity with bvh::Sphere (lib/bvh/sphere.hpp:13-61): quadratic-
formula intersection with the same accept semantics (nearest root in
[tmin, tmax], fall back to the far root when the near one is behind tmin).
The reference apps never render spheres; the primitive exists in the
library surface, so it exists here — as dense (R, S) pair evaluation (the
sphere count of any plausible scene is tiny next to triangles).
Differentiable w.r.t. centers, radii, and rays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SphereHit(NamedTuple):
    t: jax.Array        # (R,) hit distance, +inf on miss
    sphere_id: jax.Array  # (R,) int32
    mask: jax.Array     # (R,) bool


def intersect_pairs(origins, dirs, centers, radii, tmin=0.0, tmax=jnp.inf):
    """All (ray, sphere) hit distances -> (R, S), +inf where missed.

    Uses the stabilized quadratic: oc = o - c, b = oc.d, disc = b^2 -
    (|oc|^2 - r^2); roots -b -+ sqrt(disc) for normalized d
    (sphere.hpp:33-52 semantics).
    """
    oc = origins[:, None, :] - centers[None, :, :]          # (R, S, 3)
    b = jnp.sum(oc * dirs[:, None, :], axis=-1)             # (R, S)
    c = jnp.sum(oc * oc, axis=-1) - radii[None, :] ** 2
    disc = b * b - c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t_near = -b - sq
    t_far = -b + sq
    t = jnp.where(t_near >= tmin, t_near, t_far)
    accept = ok & (t >= tmin) & (t <= tmax)
    return jnp.where(accept, t, jnp.inf)


def closest_hit(origins, dirs, centers, radii, tmin=0.0, tmax=jnp.inf) -> SphereHit:
    """Closest sphere per ray (ClosestPrimitiveIntersector semantics)."""
    t = intersect_pairs(origins, dirs, centers, radii, tmin, tmax)
    sid = jnp.argmin(t, axis=-1).astype(jnp.int32)
    t_best = jnp.min(t, axis=-1)
    return SphereHit(t=t_best, sphere_id=sid, mask=jnp.isfinite(t_best))


def any_hit(origins, dirs, centers, radii, tmin=0.0, tmax=jnp.inf):
    """Occlusion against spheres (AnyPrimitiveIntersector semantics)."""
    t = intersect_pairs(origins, dirs, centers, radii, tmin, tmax)
    return jnp.any(jnp.isfinite(t), axis=-1)


def normal_at(point, centers, sphere_id):
    """Outward unit normal of the hit sphere at ``point``."""
    d = point - centers[sphere_id]
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)
