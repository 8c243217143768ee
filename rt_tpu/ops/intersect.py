"""Vectorized ray-primitive intersection (pure jnp reference path).

Semantics mirror the reference renderers' linear closest-hit scans
(/root/reference/src/renderers/mg_ray_tracer.cpp:36-102):

* ``min_hit_dist = 0.001`` epsilon (mg_ray_tracer.cpp:20).
* Within a primitive class, the *earliest index* wins distance ties (the
  scan keeps the incumbent unless the new hit is strictly nearer,
  mg_ray_tracer.cpp:47) — matching ``argmin``'s first-occurrence rule.
* Across classes the combination is ``select(spheres, select(boxes,
  planes))`` where the first argument wins ties (mg_ray_tracer.cpp:95-102,
  160-162): spheres beat planes/boxes at equal distance.
* Boxes never hit in the path tracers (``test_boxes`` is a stub,
  mg_ray_tracer.cpp:89-93); the rasterizer *does* test them
  (rasterizer.cpp:61-63).  ``closest_hit(..., include_boxes=...)`` selects.

Sphere root selection: the nearer root if it is >= min_dist, else the far
root (exit point).  For exterior geometry this is identical to the
reference; for rays starting on/inside a sphere (dielectric refraction)
it is the numerically robust choice — the reference's behaviour there
hinges on float error in ``muu::ray::hits`` (see sm_ray_tracer.cpp:181-219,
whose dielectric is itself marked TODO).

All functions are differentiable w.r.t. primitive parameters and ray
origin/direction; the winning-index selection is piecewise constant and
contributes no gradient (detached-sampling convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MIN_HIT_DIST = 0.001
_BIG = jnp.float32(3.0e38)

__all__ = ["HitRecord", "closest_hit", "hit_spheres", "hit_planes", "hit_boxes", "MIN_HIT_DIST"]


class HitRecord(NamedTuple):
    """Closest-hit result for a batch of rays."""

    t: jax.Array         # (N,) f32 distance; _BIG where no hit
    normal: jax.Array    # (N, 3) f32
    material: jax.Array  # (N,) int32
    hit: jax.Array       # (N,) bool


def _count_mask(n_padded: int, count: int) -> jax.Array:
    """Validity mask for padded tables; count is static so this folds to a
    compile-time constant."""
    return jnp.arange(n_padded) < count


def hit_spheres(origins, dirs, centers, radii, count, *, min_dist=MIN_HIT_DIST):
    """Per-ray nearest sphere.  Returns (t, index) with t=_BIG on miss.

    Quadratic with unit direction: oc = o - c, b = oc·d, c0 = |oc|^2 - r^2,
    disc = b^2 - c0, roots -b ∓ sqrt(disc).
    """
    oc = origins[:, None, :] - centers[None, :, :]          # (N, S, 3)
    b = jnp.sum(oc * dirs[:, None, :], axis=-1)             # (N, S)
    c0 = jnp.sum(oc * oc, axis=-1) - radii[None, :] ** 2    # (N, S)
    disc = b * b - c0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 >= min_dist, t0, t1)
    valid = (disc >= 0.0) & (t >= min_dist) & _count_mask(centers.shape[0], count)[None, :]
    t = jnp.where(valid, t, _BIG)
    idx = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0], idx


def hit_planes(origins, dirs, normals, ds, count, *, min_dist=MIN_HIT_DIST):
    """Per-ray nearest plane (double-sided).  n·x + d = 0 →
    t = -(n·o + d) / (n·dir)."""
    ndotd = dirs @ normals.T                                 # (N, P)
    ndoto = origins @ normals.T + ds[None, :]                # (N, P)
    safe = jnp.where(jnp.abs(ndotd) > 1e-12, ndotd, 1.0)
    t = -ndoto / safe
    valid = (jnp.abs(ndotd) > 1e-12) & (t >= min_dist) & _count_mask(normals.shape[0], count)[None, :]
    t = jnp.where(valid, t, _BIG)
    idx = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0], idx


def hit_boxes(origins, dirs, centers, extents, count, *, min_dist=MIN_HIT_DIST):
    """Per-ray nearest axis-aligned box via the slab test.  extents are
    half-extents (muu::bounding_box convention, soa.toml:35-45).  Rays
    starting inside a box hit its exit face."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-12, dirs, 1e-12)  # (N, 3)
    lo = centers[None, :, :] - extents[None, :, :]             # (N?, B, 3)
    hi = centers[None, :, :] + extents[None, :, :]
    ta = (lo - origins[:, None, :]) * inv[:, None, :]
    tb = (hi - origins[:, None, :]) * inv[:, None, :]
    tmin = jnp.max(jnp.minimum(ta, tb), axis=-1)               # (N, B)
    tmax = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t = jnp.where(tmin >= min_dist, tmin, tmax)
    valid = (tmax >= tmin) & (t >= min_dist) & _count_mask(centers.shape[0], count)[None, :]
    t = jnp.where(valid, t, _BIG)
    idx = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0], idx


def _box_normal(origins, dirs, t, centers, extents, idx):
    """Outward normal of the slab face hit at parameter t (sign of the
    dominant component of the local hit position, scaled by extents)."""
    c = centers[idx]
    e = jnp.maximum(extents[idx], 1e-12)
    p = origins + t[:, None] * dirs
    local = (p - c) / e
    ax = jnp.argmax(jnp.abs(local), axis=-1)
    n = jax.nn.one_hot(ax, 3, dtype=local.dtype) * jnp.sign(
        jnp.take_along_axis(local, ax[:, None], axis=-1)
    )
    return n


def closest_hit(
    spheres,
    planes,
    boxes,
    origins,
    dirs,
    *,
    min_dist: float = MIN_HIT_DIST,
    include_boxes: bool = False,
    box_normals_up: bool = False,
) -> HitRecord:
    """Closest hit over the whole scene for a flat ray batch.

    Args:
      spheres/planes/boxes: the scene tables (rt_tpu.scene dataclasses).
      origins, dirs: (N, 3) f32; dirs unit.
      include_boxes: False reproduces the path tracers (box stub,
        mg_ray_tracer.cpp:89-93); True tests boxes (rasterizer.cpp:61-63).
      box_normals_up: reproduce the rasterizer's never-assigned box normal
        (stays 'up', rasterizer.cpp:38,55-58).
    """
    n = origins.shape[0]

    ts, is_ = hit_spheres(origins, dirs, spheres.center, spheres.radius, spheres.count, min_dist=min_dist)
    tp, ip = hit_planes(origins, dirs, planes.normal, planes.d, planes.count, min_dist=min_dist)

    # select(a=spheres, b=planes): a wins ties (mg_ray_tracer.cpp:95-102).
    sphere_wins = ts <= tp
    if include_boxes and boxes.count > 0:
        tb, ib = hit_boxes(origins, dirs, boxes.center, boxes.extents, boxes.count, min_dist=min_dist)
    else:
        tb = jnp.full((n,), _BIG)
        ib = jnp.zeros((n,), jnp.int32)

    # Combine: spheres beat planes at ties; boxes beat planes at ties but
    # lose to spheres (select chain mg_ray_tracer.cpp:160-162).
    t_sp = jnp.where(sphere_wins, ts, tp)
    box_wins = tb < t_sp
    t = jnp.where(box_wins, tb, t_sp)
    hit = t < _BIG

    # Normals & material ids by winner class.
    hit_p = origins + t[:, None] * dirs
    sphere_n = hit_p - spheres.center[is_]
    sphere_n = sphere_n / jnp.maximum(jnp.linalg.norm(sphere_n, axis=-1, keepdims=True), 1e-30)
    plane_n = planes.normal[ip]
    if include_boxes and boxes.count > 0:
        if box_normals_up:
            box_n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (n, 3))
        else:
            box_n = _box_normal(origins, dirs, tb, boxes.center, boxes.extents, ib)
    else:
        box_n = jnp.zeros((n, 3), jnp.float32)

    normal = jnp.where(sphere_wins[:, None] & ~box_wins[:, None], sphere_n, plane_n)
    normal = jnp.where(box_wins[:, None], box_n, normal)

    mat = jnp.where(sphere_wins, spheres.material[is_], planes.material[ip])
    if include_boxes and boxes.count > 0:
        mat = jnp.where(box_wins, boxes.material[ib], mat)

    return HitRecord(t=t, normal=normal, material=mat.astype(jnp.int32), hit=hit)
