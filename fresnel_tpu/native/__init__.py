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
    if lib.fresnel_native_version() < 2:
        # Stale build from an older source tree — rebuild once.  Unlink
        # first: a fresh inode guarantees dlopen returns a new mapping
        # rather than the cached stale handle.
        try:
            _LIB_PATH.unlink()
        except OSError:
            return None
        if not _try_build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None  # rebuild produced an unloadable .so — degrade
        lib.fresnel_native_version.restype = ctypes.c_int
        if lib.fresnel_native_version() < 2:
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
    c_long_p = ctypes.POINTER(ctypes.c_long)
    lib.fresnel_prefetch_submit.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, c_long_p, c_long_p,
        ctypes.c_long, ctypes.c_long]
    lib.fresnel_prefetch_submit.restype = ctypes.c_void_p
    lib.fresnel_prefetch_ready.argtypes = [ctypes.c_void_p]
    lib.fresnel_prefetch_ready.restype = ctypes.c_int
    lib.fresnel_prefetch_wait.argtypes = [ctypes.c_void_p]
    lib.fresnel_prefetch_wait.restype = c_float_p
    lib.fresnel_prefetch_error.argtypes = [ctypes.c_void_p]
    lib.fresnel_prefetch_error.restype = ctypes.c_int
    lib.fresnel_prefetch_free.argtypes = [ctypes.c_void_p]
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


class PrefetchJob:
    """An in-flight asynchronous batch load (native threads).

    Submit with `prefetch_submit`; `wait()` blocks until every file region
    is read and returns the full buffer as a zero-copy numpy view (valid
    until `close()`/GC).  Mirrors the role of the reference's DataLoader
    worker processes (reference: train_gaussian_decoder.py:1738-1767) as a
    native in-process executor instead.
    """

    def __init__(self, lib, handle, total_floats: int):
        self._lib = lib
        self._handle = handle
        self._total = total_floats
        self._view: Optional[np.ndarray] = None

    def ready(self) -> bool:
        return (self._handle is not None
                and self._lib.fresnel_prefetch_ready(self._handle) == 1)

    def wait(self) -> Optional[np.ndarray]:
        """Block until loaded; (total_floats,) float32 view or None on error."""
        if self._handle is None:
            return None
        if self._view is not None:
            return self._view
        ptr = self._lib.fresnel_prefetch_wait(self._handle)
        if not ptr:
            return None
        self._view = np.ctypeslib.as_array(ptr, shape=(self._total,))
        return self._view

    def error_index(self) -> int:
        """0 if ok, else 1-based index of the first failing file."""
        if self._handle is None:
            return -1
        return self._lib.fresnel_prefetch_error(self._handle)

    def close(self):
        if self._handle is not None:
            self._lib.fresnel_prefetch_free(self._handle)
            self._handle = None
            self._view = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def prefetch_submit(paths: Sequence[str], file_floats: Sequence[int],
                    out_offsets: Sequence[int], total_floats: int,
                    n_threads: int = 0) -> Optional[PrefetchJob]:
    """Start an async threaded load of float32 cache files into one buffer.

    Each paths[i] contributes file_floats[i] floats at out_offsets[i].
    Returns None when the native library is unavailable or the region list
    is invalid (callers fall back to synchronous numpy loads).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if not (len(file_floats) == len(out_offsets) == n) or n == 0:
        return None
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    sizes = (ctypes.c_long * n)(*[int(x) for x in file_floats])
    offs = (ctypes.c_long * n)(*[int(x) for x in out_offsets])
    handle = lib.fresnel_prefetch_submit(arr, n, sizes, offs,
                                         int(total_floats), int(n_threads))
    if not handle:
        return None
    return PrefetchJob(lib, handle, int(total_floats))


def is_available() -> bool:
    return _load() is not None
