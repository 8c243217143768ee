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
