"""ctypes bindings for the native C++ host runtime (libfresnel_native.so).

Auto-builds with `make` on first import when a compiler is available;
everything degrades to pure-Python/numpy when it is not (NATIVE_AVAILABLE
False).  See fresnel_native.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libfresnel_native.so"
_lib = None
NATIVE_AVAILABLE = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib, NATIVE_AVAILABLE
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.fresnel_native_version.restype = ctypes.c_int
    if lib.fresnel_native_version() != 1:
        return None
    c_float_p = ctypes.POINTER(ctypes.c_float)
    lib.fresnel_load_gaussians.argtypes = [ctypes.c_char_p, c_float_p,
                                           ctypes.c_long]
    lib.fresnel_load_gaussians.restype = ctypes.c_long
    lib.fresnel_count_gaussians.argtypes = [ctypes.c_char_p]
    lib.fresnel_count_gaussians.restype = ctypes.c_long
    lib.fresnel_save_gaussians.argtypes = [ctypes.c_char_p, c_float_p,
                                           ctypes.c_long]
    lib.fresnel_save_gaussians.restype = ctypes.c_int
    lib.fresnel_save_ply.argtypes = [ctypes.c_char_p, c_float_p,
                                     ctypes.c_long]
    lib.fresnel_save_ply.restype = ctypes.c_int
    lib.fresnel_resize_bilinear.argtypes = [
        c_float_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        c_float_p, ctypes.c_long, ctypes.c_long]
    lib.fresnel_batch_load.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
        c_float_p]
    lib.fresnel_batch_load.restype = ctypes.c_int
    _lib = lib
    NATIVE_AVAILABLE = True
    return lib


def _fp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_gaussians(path: str) -> Optional[np.ndarray]:
    """(N, 14) float32 or None if native unavailable / file missing."""
    lib = _load()
    if lib is None:
        return None
    n = lib.fresnel_count_gaussians(str(path).encode())
    if n < 0:
        return None
    out = np.empty((n, 14), np.float32)
    got = lib.fresnel_load_gaussians(str(path).encode(), _fp(out), n * 14)
    return out[:got] if got >= 0 else None


def save_gaussians(path: str, flat: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    flat = np.ascontiguousarray(flat, np.float32)
    return lib.fresnel_save_gaussians(str(path).encode(), _fp(flat),
                                      flat.shape[0]) == 0


def save_ply(path: str, flat: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    flat = np.ascontiguousarray(flat, np.float32)
    return lib.fresnel_save_ply(str(path).encode(), _fp(flat),
                                flat.shape[0]) == 0


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """float32 (H, W, C) -> (out_h, out_w, C), threaded native resize."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.float32)
    lib.fresnel_resize_bilinear(_fp(img), h, w, c, _fp(out), out_h, out_w)
    return out


def batch_load(paths: Sequence[str], floats_per_file: int) -> Optional[np.ndarray]:
    """Threaded load of many float32 cache files into one (N, k) array."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, floats_per_file), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.fresnel_batch_load(arr, n, floats_per_file, _fp(out))
    return out if rc == 0 else None


def is_available() -> bool:
    return _load() is not None
