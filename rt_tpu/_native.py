"""ctypes loader for the optional C++ native runtime (native/librt_native.so).

The native library provides host-side runtime services mirroring the
reference's C++ layers (image packing, PNG encoding, framebuffer assembly —
image.cpp / back_buffer.cpp analogues).  Everything degrades gracefully to
pure NumPy when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(here, "native", "librt_native.so"),
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "librt_native.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.rtn_write_png.restype = ctypes.c_int
                lib.rtn_write_png.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.rtn_pack_rgba8888.restype = None
                lib.rtn_pack_rgba8888.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_uint32),
                    ctypes.c_longlong,
                ]
                f32p = ctypes.POINTER(ctypes.c_float)
                i32p = ctypes.POINTER(ctypes.c_int32)
                lib.rtn_render.restype = ctypes.c_double
                lib.rtn_render.argtypes = [
                    f32p, f32p, ctypes.c_float, ctypes.c_float,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_uint64,
                    f32p, f32p, i32p, ctypes.c_int,
                    f32p, f32p, i32p, ctypes.c_int,
                    i32p, f32p, f32p, f32p,
                    ctypes.c_int,
                    f32p,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _load() is not None


def write_png(path: str, rgba: np.ndarray, w: int, h: int) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    rc = lib.rtn_write_png(
        path.encode(), rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h
    )
    if rc != 0:
        raise IOError(f"rtn_write_png failed with code {rc}")


def render_mg_cpu(scene, size, *, spp: int, max_bounces: int, seed: int = 0):
    """Render with the native CPU baseline tracer, mg personality."""
    return render_cpu(scene, size, spp=spp, max_bounces=max_bounces,
                      seed=seed, personality="mg")


def render_cpu(scene, size, *, spp: int, max_bounces: int, seed: int = 0,
               personality: str = "mg"):
    """Render with the native multithreaded CPU baseline tracer.
    ``personality``: "mg" (metal+lambert, mg_ray_tracer.cpp:142-152) or
    "sm" (adds the dielectric family, sm_ray_tracer.cpp:221-236).
    Returns ((H, W, 3) float32 image, seconds)."""
    import ctypes as ct

    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available (run `make -C native`)")
    w, h = size
    f32 = np.float32
    cam_pos = np.ascontiguousarray(np.asarray(scene.camera.position), f32)
    cam_rot = np.ascontiguousarray(np.asarray(scene.camera.rotation), f32)
    sc = scene.spheres.count
    pc = scene.planes.count
    sph_c = np.ascontiguousarray(np.asarray(scene.spheres.center)[:sc], f32)
    sph_r = np.ascontiguousarray(np.asarray(scene.spheres.radius)[:sc], f32)
    sph_m = np.ascontiguousarray(np.asarray(scene.spheres.material)[:sc], np.int32)
    pl_n = np.ascontiguousarray(np.asarray(scene.planes.normal)[:pc], f32)
    pl_d = np.ascontiguousarray(np.asarray(scene.planes.d)[:pc], f32)
    pl_m = np.ascontiguousarray(np.asarray(scene.planes.material)[:pc], np.int32)
    mt = np.ascontiguousarray(np.asarray(scene.materials.type), np.int32)
    ma = np.ascontiguousarray(np.asarray(scene.materials.albedo), f32)
    mr = np.ascontiguousarray(np.asarray(scene.materials.roughness), f32)
    mf = np.ascontiguousarray(np.asarray(scene.materials.reflectivity), f32)
    out = np.empty((h, w, 3), f32)

    def p(a, t):
        return a.ctypes.data_as(ct.POINTER(t))

    secs = lib.rtn_render(
        p(cam_pos, ct.c_float), p(cam_rot, ct.c_float),
        ct.c_float(scene.camera.vfov), ct.c_float(scene.camera.near),
        w, h, spp, max_bounces, seed,
        p(sph_c, ct.c_float), p(sph_r, ct.c_float), p(sph_m, ct.c_int32), sc,
        p(pl_n, ct.c_float), p(pl_d, ct.c_float), p(pl_m, ct.c_int32), pc,
        p(mt, ct.c_int32), p(ma, ct.c_float), p(mr, ct.c_float), p(mf, ct.c_float),
        {"mg": 0, "sm": 1}[personality],
        p(out, ct.c_float),
    )
    return out, float(secs)


def pack_rgba8888(rgb: np.ndarray) -> np.ndarray:
    """Float32 (..., 4) RGBA → uint32 words via the native packer."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    rgba = np.ascontiguousarray(rgb, dtype=np.float32)
    n = rgba.size // 4
    out = np.empty(rgba.shape[:-1], dtype=np.uint32)
    lib.rtn_pack_rgba8888(
        rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
    )
    return out
