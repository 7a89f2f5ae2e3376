"""ctypes bindings for the native bulk .npz loader.

Builds libnpz_loader.so on first use (g++, cached next to the source) and
exposes load_batch_f32 / load_scalar_i64. Callers fall back to the Python
zipfile path when the toolchain or the .so is unavailable, or when archives
use compression/zip64 (the native side reports per-file failures).
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "npz_loader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libnpz_loader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_library():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC, "-lpthread"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.load_npz_batch_f32.restype = ctypes.c_int
            lib.load_npz_batch_f32.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_longlong, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
            ]
            lib.load_npz_scalar_i64.restype = ctypes.c_int
            lib.load_npz_scalar_i64.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_longlong, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
            ]
            _lib = lib
        except Exception as e:  # toolchain missing, build error, ...
            logging.info(f"native npz loader unavailable ({e}); using Python fallback")
            _build_failed = True
        return _lib


def available():
    return _load_library() is not None


def _path_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def load_batch_f32(paths, key, sample_shape, n_threads=0):
    """Stack `key` from every archive -> float32 [n, *sample_shape].
    Returns None if any file fails (caller falls back to Python)."""
    lib = _load_library()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n,) + tuple(sample_shape), np.float32)
    elems = int(np.prod(sample_shape))
    n_threads = n_threads or min(16, os.cpu_count() or 1)
    failures = lib.load_npz_batch_f32(
        _path_array(paths), n, key.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), elems, n_threads,
    )
    return out if failures == 0 else None


def load_scalar_i64(paths, key, n_threads=0):
    """Read an integer scalar `key` from every archive -> int64 [n] or None."""
    lib = _load_library()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty(n, np.int64)
    n_threads = n_threads or min(16, os.cpu_count() or 1)
    failures = lib.load_npz_scalar_i64(
        _path_array(paths), n, key.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n_threads,
    )
    return out if failures == 0 else None
