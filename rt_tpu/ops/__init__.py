from .intersect import HitRecord, closest_hit, hit_spheres, hit_planes, hit_boxes

__all__ = ["HitRecord", "closest_hit", "hit_spheres", "hit_planes", "hit_boxes"]
