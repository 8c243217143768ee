"""Independent NumPy mirror of the reference renderer semantics.

This is the parity oracle: a direct, *recursive* transcription of the C++
reference's behaviour (/root/reference/src/renderers/mg_ray_tracer.cpp,
sm_ray_tracer.cpp, rasterizer.cpp) in plain NumPy, written separately from
the rt_tpu wavefront implementation.  The reference binary itself cannot be
built in this environment (meson wraps need network access), so agreement
between two independently-derived implementations of the documented
semantics is the correctness evidence.

Randomness is injected: ``rng(bounce) -> (unit_vecs (N,3), coins (N,))`` so
tests can feed the exact same threefry draws to both implementations and
require near-bitwise agreement.
"""

from __future__ import annotations

import numpy as np

MIN_HIT_DIST = 0.001
BIG = 3.0e38

# BRDF classes per material type (mg_ray_tracer.cpp:142-152, sm:221-236)
MG_TABLE = ["lambert", "metal"] + ["lambert"] * 6
SM_TABLE = ["lambert", "metal", "dielectric", "dielectric", "dielectric",
            "dielectric", "dielectric", "lambert"]


def generate_rays(cam_pos, cam_rot, vfov, near, size, pixel_pos):
    """Primary rays via near/far-plane unprojection (camera.hpp:42-48,
    mg_ray_tracer.cpp:189-193)."""
    w, h = size
    th = np.tan(vfov / 2)
    aspect = w / h
    nx = 2.0 * pixel_pos[:, 0] / w - 1.0
    ny = 1.0 - 2.0 * pixel_pos[:, 1] / h
    d_view = np.stack([nx * th * aspect, ny * th, -np.ones_like(nx)], axis=-1)
    d_world = d_view @ np.asarray(cam_rot).T
    origins = np.asarray(cam_pos) + d_world * near
    dirs = d_world / np.linalg.norm(d_world, axis=-1, keepdims=True)
    return origins.astype(np.float32), dirs.astype(np.float32)


def hit_spheres_np(o, d, centers, radii, min_dist=MIN_HIT_DIST):
    if len(centers) == 0:
        n = o.shape[0]
        return np.full(n, BIG, np.float32), np.zeros(n, np.int64)
    oc = o[:, None, :] - centers[None, :, :]
    b = np.sum(oc * d[:, None, :], axis=-1)
    c0 = np.sum(oc * oc, axis=-1) - radii[None, :] ** 2
    disc = b * b - c0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0, t1 = -b - sq, -b + sq
    t = np.where(t0 >= min_dist, t0, t1)
    ok = (disc >= 0) & (t >= min_dist)
    t = np.where(ok, t, BIG)
    idx = np.argmin(t, axis=-1)
    return t[np.arange(len(t)), idx], idx


def hit_planes_np(o, d, normals, ds, min_dist=MIN_HIT_DIST):
    if len(normals) == 0:
        n = o.shape[0]
        return np.full(n, BIG, np.float32), np.zeros(n, np.int64)
    nd = d @ normals.T
    no = o @ normals.T + ds[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(np.abs(nd) > 1e-12, -no / nd, BIG)
    ok = (np.abs(nd) > 1e-12) & (t >= min_dist)
    t = np.where(ok, t, BIG)
    idx = np.argmin(t, axis=-1)
    return t[np.arange(len(t)), idx], idx


def hit_boxes_np(o, d, centers, extents, min_dist=MIN_HIT_DIST):
    if len(centers) == 0:
        n = o.shape[0]
        return np.full(n, BIG, np.float32), np.zeros(n, np.int64)
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    lo = centers[None] - extents[None]
    hi = centers[None] + extents[None]
    ta = (lo - o[:, None, :]) * inv[:, None, :]
    tb = (hi - o[:, None, :]) * inv[:, None, :]
    tmin = np.max(np.minimum(ta, tb), axis=-1)
    tmax = np.min(np.maximum(ta, tb), axis=-1)
    t = np.where(tmin >= min_dist, tmin, tmax)
    ok = (tmax >= tmin) & (t >= min_dist)
    t = np.where(ok, t, BIG)
    idx = np.argmin(t, axis=-1)
    return t[np.arange(len(t)), idx], idx


def closest_hit_np(scene, o, d, include_boxes=False):
    """select(spheres, planes): spheres win ties (mg_ray_tracer.cpp:95-102,
    160-162).  Returns (t, normal, material, hit)."""
    n = o.shape[0]
    ts, si = hit_spheres_np(o, d, scene["sph_c"], scene["sph_r"])
    tp, pi = hit_planes_np(o, d, scene["pl_n"], scene["pl_d"])
    sphere_wins = ts <= tp
    t = np.where(sphere_wins, ts, tp)
    if include_boxes:
        tb, bi = hit_boxes_np(o, d, scene["box_c"], scene["box_e"])
        box_wins = tb < t
    else:
        tb = np.full(n, BIG, np.float32)
        bi = np.zeros(n, np.int64)
        box_wins = np.zeros(n, bool)
    t = np.where(box_wins, tb, t)
    hit = t < BIG

    hp = o + t[:, None] * d
    sn = hp - scene["sph_c"][si] if len(scene["sph_c"]) else np.zeros((n, 3))
    with np.errstate(invalid="ignore", divide="ignore"):
        sn = sn / np.maximum(np.linalg.norm(sn, axis=-1, keepdims=True), 1e-30)
    pn = scene["pl_n"][pi] if len(scene["pl_n"]) else np.zeros((n, 3))
    normal = np.where(sphere_wins[:, None] & ~box_wins[:, None], sn, pn)
    # rasterizer quirk: box normals stay 'up' (rasterizer.cpp:38,55-58)
    normal = np.where(box_wins[:, None], np.array([0.0, 1.0, 0.0]), normal)

    mat = np.where(sphere_wins,
                   scene["sph_m"][si] if len(scene["sph_m"]) else 0,
                   scene["pl_m"][pi] if len(scene["pl_m"]) else 0)
    if include_boxes and len(scene["box_m"]):
        mat = np.where(box_wins, scene["box_m"][bi], mat)
    return t.astype(np.float32), normal.astype(np.float32), mat.astype(np.int64), hit


def sky_np(d):
    t = 0.5 * (d[:, 1] + 1.0)
    return ((1 - t)[:, None] * np.array([1.0, 1.0, 1.0])
            + t[:, None] * np.array([0.5, 0.7, 1.0])).astype(np.float32)


def reflect_np(v, n):
    return v - 2.0 * np.sum(v * n, axis=-1, keepdims=True) * n


def trace_np(scene, o, d, depth, bounce, rng, table):
    """Recursive trace (mg_ray_tracer.cpp:155-174), vectorized over rays but
    keeping the reference's recursive structure."""
    n = o.shape[0]
    if depth == 0:
        return np.zeros((n, 3), np.float32)

    t, normal, mat, hit = closest_hit_np(scene, o, d)
    col = np.where(hit[:, None], 0.0, sky_np(d)).astype(np.float32)

    ur, coin = rng(bounce)
    albedo = scene["mat_albedo"][mat][:, :3]
    rough = scene["mat_rough"][mat][:, None]
    refl = scene["mat_refl"][mat]
    att = albedo * refl[:, None]

    cls = np.array([{"lambert": 0, "metal": 1, "dielectric": 2}[table[c]] for c in range(8)])[
        scene["mat_type"][mat]
    ]

    # lambert (mg:109-123)
    lam = normal + ur
    ln = np.linalg.norm(lam, axis=-1, keepdims=True)
    lam = np.where(ln < 1e-8, normal, lam / np.maximum(ln, 1e-30))

    # metal (mg:125-140)
    met = reflect_np(d, normal) + rough * ur
    met_abs = np.sum(met * normal, axis=-1) <= 0.0
    met = met / np.maximum(np.linalg.norm(met, axis=-1, keepdims=True), 1e-30)

    # dielectric (sm:181-219)
    dn = np.sum(d * normal, axis=-1)
    inside = dn > 0
    on = np.where(inside[:, None], -normal, normal)
    eta = np.where(inside, refl, 1.0 / np.maximum(refl, 1e-12))
    cosine = np.where(inside, refl * dn, -dn)
    cos_i = -np.sum(d * on, axis=-1)
    sin2 = eta * eta * (1 - cos_i**2)
    tir = sin2 > 1
    cos_t = np.sqrt(np.maximum(1 - sin2, 0))
    refr = eta[:, None] * d + (eta * cos_i - cos_t)[:, None] * on
    r0 = ((1 - refl) / (1 + refl)) ** 2
    prob = np.where(tir, 1.0, r0 + (1 - r0) * (1 - cosine) ** 5)
    die = np.where((coin < prob)[:, None], reflect_np(d, normal), refr)
    die = die / np.maximum(np.linalg.norm(die, axis=-1, keepdims=True), 1e-30)

    newd = np.where(cls[:, None] == 1, met, lam)
    newd = np.where(cls[:, None] == 2, die, newd)
    absorbed = (cls == 1) & met_abs

    t_safe = np.where(hit, t, 0.0)
    newo = o + t_safe[:, None] * d
    rec = trace_np(scene, newo.astype(np.float32), newd.astype(np.float32),
                   depth - 1, bounce + 1, rng, table)
    scat = att * rec
    col = np.where((hit & ~absorbed)[:, None], scat, col)
    col = np.where((hit & absorbed)[:, None], 0.0, col)
    return col.astype(np.float32)


def render_np(scene, cam, size, spp, max_bounces, table, rng_for_sample, jitter_for_sample):
    """Full render (mg_ray_tracer.cpp:178-204): sample 0 at centre, mean,
    sqrt gamma."""
    w, h = size
    idx = np.arange(w * h)
    grid = np.stack([(idx % w), (idx // w)], axis=-1).astype(np.float32)
    acc = np.zeros((w * h, 3), np.float32)
    for s in range(spp):
        off = 0.5 if s == 0 else jitter_for_sample(s)
        o, d = generate_rays(cam["pos"], cam["rot"], cam["vfov"], cam["near"], size, grid + off)
        acc += trace_np(scene, o, d, max_bounces, 0, rng_for_sample(s), table)
    img = acc / spp
    return np.sqrt(np.maximum(img, 0)).reshape(h, w, 3)


def rasterize_np(scene, cam, size, compat=True):
    """Rasterizer preview (rasterizer.cpp:22-88)."""
    w, h = size
    idx = np.arange(w * h)
    grid = np.stack([(idx % w), (idx // w)], axis=-1).astype(np.float32)
    o, d = generate_rays(cam["pos"], cam["rot"], cam["vfov"], cam["near"], size, grid + 0.5)
    t, normal, mat, hit = closest_hit_np(scene, o, d, include_boxes=True)
    # max-dist guard (rasterizer.cpp:33-35): |far_pos - near_pos| per pixel
    th = np.tan(cam["vfov"] / 2)
    aspect = w / h
    px = grid + 0.5
    nx = 2.0 * px[:, 0] / w - 1.0
    ny = 1.0 - 2.0 * px[:, 1] / h
    dv = np.stack([nx * th * aspect, ny * th, -np.ones_like(nx)], axis=-1)
    scale = np.linalg.norm(dv, axis=-1)
    max_dist = (cam["far"] - cam["near"]) * scale
    hit = hit & (t < max_dist + 1.0)

    albedo = scene["mat_albedo"][mat][:, :3]
    lam = np.sum((-d) * normal, axis=-1, keepdims=True) * albedo
    shade = np.minimum(0.25 + 0.75 * lam, 1.0)

    def conv(hexv):
        if compat:
            return np.array([min(max(float((hexv >> s) & 0xFF), 0.0), 1.0) for s in (16, 8, 0)])
        return np.array([((hexv >> s) & 0xFF) / 255.0 for s in (16, 8, 0)])

    sky_start, sky_end = conv(0xD0E4FF), conv(0xEEF5FF)
    ty = (grid[:, 1] / max(h - 1, 1))[:, None]
    sky = (1 - ty) * sky_start + ty * sky_end
    img = np.where(hit[:, None], shade, sky)
    return img.reshape(h, w, 3).astype(np.float32)


def scene_to_np(scene):
    """Convert an rt_tpu Scene pytree to the plain-dict form used here,
    dropping padding."""
    import numpy as np

    def a(x):
        return np.asarray(x)

    return {
        "sph_c": a(scene.spheres.center)[: scene.spheres.count],
        "sph_r": a(scene.spheres.radius)[: scene.spheres.count],
        "sph_m": a(scene.spheres.material)[: scene.spheres.count],
        "pl_n": a(scene.planes.normal)[: scene.planes.count],
        "pl_d": a(scene.planes.d)[: scene.planes.count],
        "pl_m": a(scene.planes.material)[: scene.planes.count],
        "box_c": a(scene.boxes.center)[: scene.boxes.count],
        "box_e": a(scene.boxes.extents)[: scene.boxes.count],
        "box_m": a(scene.boxes.material)[: scene.boxes.count],
        "mat_type": a(scene.materials.type),
        "mat_albedo": a(scene.materials.albedo),
        "mat_rough": a(scene.materials.roughness),
        "mat_refl": a(scene.materials.reflectivity),
    }


def camera_to_np(scene):
    return {
        "pos": np.asarray(scene.camera.position),
        "rot": np.asarray(scene.camera.rotation),
        "vfov": scene.camera.vfov,
        "near": scene.camera.near,
        "far": scene.camera.far,
    }
