from .intersect import (
    HitRecord,
    closest_hit,
    hit_boxes,
    hit_planes,
    hit_spheres,
    sphere_stage,
)

__all__ = [
    "HitRecord",
    "closest_hit",
    "hit_spheres",
    "hit_planes",
    "hit_boxes",
    "sphere_stage",
]
