"""ctypes binding + on-demand build of the C++ patch-gather engine
(csrc/patch_gather.cpp).

Builds once with g++ into a cache directory; if no toolchain is available the
sampler transparently falls back to its numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                        "patch_gather.cpp")


def _lib_path() -> str:
    cache = os.environ.get("LIFELONG_NNUNET_CACHE",
                           os.path.join(os.path.expanduser("~"), ".cache",
                                        "lifelong_nnunet_tpu"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libpatch_gather.so")


def _build() -> str | None:
    src = os.path.abspath(_source_path())
    if not os.path.isfile(src):
        return None
    lib = _lib_path()
    if os.path.isfile(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", src, "-o", lib],
            check=True, capture_output=True, timeout=120)
        return lib
    except Exception:
        return None


def get_lib():
    """Returns the loaded library or None (no toolchain / build failure)."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.gather_patches.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),                   # case_ptrs
                ctypes.POINTER(ctypes.c_int64),                    # case_shapes
                ctypes.POINTER(ctypes.c_int64),                    # origins
                ctypes.POINTER(ctypes.c_int64),                    # patch
                ctypes.c_int64, ctypes.c_int64,                    # B, threads
                ctypes.POINTER(ctypes.c_float),                    # out_data
                ctypes.POINTER(ctypes.c_int8),                     # out_seg
            ]
            lib.gather_patches.restype = None
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def gather_patches(arrays: list, origins: np.ndarray, patch, n_threads: int = 0):
    """arrays: list of [C+1, X, Y, Z] float32 C-contiguous arrays/memmaps.
    origins: [B, 3] int64 (possibly negative). Returns (data [B, *patch, C]
    float32, seg [B, *patch] int8). Raises RuntimeError if the native lib is
    unavailable (callers pre-check get_lib())."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native patch_gather library unavailable")
    B = len(arrays)
    n_mod = arrays[0].shape[0] - 1
    patch = np.asarray(patch, dtype=np.int64)
    out_data = np.empty((B, *patch, n_mod), dtype=np.float32)
    out_seg = np.empty((B, *patch), dtype=np.int8)
    ptrs = (ctypes.c_void_p * B)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrays])
    shapes = np.ascontiguousarray(
        np.array([a.shape for a in arrays], dtype=np.int64))
    origins = np.ascontiguousarray(origins.astype(np.int64))
    if n_threads <= 0:
        n_threads = min(B, os.cpu_count() or 1)
    lib.gather_patches(
        ptrs,
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        origins.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        patch.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, n_threads,
        out_data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out_data, out_seg
