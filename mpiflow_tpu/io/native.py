"""ctypes bindings to the native host runtime (native/libmpiflow_native.so).

Builds the library on first use if the toolchain is available; all callers
fall back to the pure-python implementations when it is not.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmpiflow_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.cdll.LoadLibrary(_LIB_PATH)
        lib.flo_write.restype = ctypes.c_int
        lib.flo_encode.restype = ctypes.c_int
        lib.ppm_write.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def flo_write_native(path: str, flow: np.ndarray) -> bool:
    """Write [H,W,2] float32 flow as .flo via the native encoder.
    Returns False if the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return False
    uv = np.ascontiguousarray(flow, dtype=np.float32)
    h, w = uv.shape[:2]
    rc = lib.flo_write(path.encode(), uv.ctypes.data_as(ctypes.c_void_p),
                       ctypes.c_int(h), ctypes.c_int(w))
    return rc == 0


def forward_warp_zbuffer_native(src_u8: np.ndarray, idx: np.ndarray,
                                idy: np.ndarray, z: np.ndarray) -> Optional[np.ndarray]:
    """Host-side oracle of the raster-order z-buffer splat. [H,W,5] u8."""
    lib = _load()
    if lib is None:
        return None
    h, w = src_u8.shape[:2]
    src = np.ascontiguousarray(src_u8, np.uint8)
    ix = np.ascontiguousarray(idx, np.int64)
    iy = np.ascontiguousarray(idy, np.int64)
    zz = np.ascontiguousarray(z, np.float32)
    out = np.zeros(h * w * 5, np.uint8)
    lib.forward_warp_zbuffer(
        src.ctypes.data_as(ctypes.c_void_p), ix.ctypes.data_as(ctypes.c_void_p),
        iy.ctypes.data_as(ctypes.c_void_p), zz.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(h), ctypes.c_int(w))
    return out.reshape(h, w, 5)
