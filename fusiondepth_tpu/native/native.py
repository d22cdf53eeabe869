"""ctypes bindings for the native data-path kernels (fusionio.cpp).

The library auto-builds with the system compiler on first use (cached next
to the source); every entry point has a numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fusionio.cpp")
_LIB = os.path.join(_DIR, "libfusionio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    for cc in ("c++", "g++", "cc"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True, timeout=120)
            return True
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.project_points_min.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
        lib.expand_two_channel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.max_pool2_ceil.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def project_points_native(velo: np.ndarray, P: np.ndarray,
                          im_shape: Tuple[int, int],
                          vel_depth: bool = False) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    H, W = im_shape
    velo = np.ascontiguousarray(velo, np.float32)
    P = np.ascontiguousarray(P, np.float64)
    out = np.zeros((H, W), np.float64)
    lib.project_points_min(_ptr(velo, ctypes.c_float), velo.shape[0],
                           _ptr(P, ctypes.c_double), H, W,
                           int(vel_depth), _ptr(out, ctypes.c_double))
    return out


def expand_two_channel_native(sparse: np.ndarray, expand: int,
                              row_range: Tuple[int, int],
                              col_range: Tuple[int, int]
                              ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    H, W = sparse.shape
    sparse = np.ascontiguousarray(sparse, np.float32)
    out = np.zeros((H, W, 2), np.float32)
    lib.expand_two_channel(_ptr(sparse, ctypes.c_float), H, W, expand,
                           row_range[0], row_range[1], col_range[0],
                           col_range[1], _ptr(out, ctypes.c_float))
    return out


def max_pool2_native(x: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    H, W = x.shape
    x = np.ascontiguousarray(x, np.float64)
    out = np.empty((-(-H // 2), -(-W // 2)), np.float64)
    lib.max_pool2_ceil(_ptr(x, ctypes.c_double), H, W,
                       _ptr(out, ctypes.c_double))
    return out
