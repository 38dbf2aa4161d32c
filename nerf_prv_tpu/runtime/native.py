"""ctypes bindings for the native C++ IO runtime (``csrc/prv_runtime.cpp``).

The runtime accelerates host-side IO that would otherwise bottleneck TPU
feeding: PLY parsing, voxel downsampling, and the ready-file IPC protocol.
Falls back transparently to pure Python when the shared library has not been
built (``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "libprv_runtime.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.prv_ply_open.restype = ctypes.c_void_p
        lib.prv_ply_open.argtypes = [ctypes.c_char_p]
        lib.prv_ply_count.restype = ctypes.c_long
        lib.prv_ply_count.argtypes = [ctypes.c_void_p]
        lib.prv_ply_has_color.restype = ctypes.c_int
        lib.prv_ply_has_color.argtypes = [ctypes.c_void_p]
        lib.prv_ply_read.restype = ctypes.c_int
        lib.prv_ply_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.prv_ply_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def load_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    handle = lib.prv_ply_open(path.encode())
    if not handle:
        raise OSError(f"native ply parse failed: {path}")
    try:
        n = lib.prv_ply_count(handle)
        has_color = bool(lib.prv_ply_has_color(handle))
        pts = np.empty((n, 3), dtype=np.float64)
        cols = np.empty((n, 3), dtype=np.uint8) if has_color else np.empty((0, 3), np.uint8)
        rc = lib.prv_ply_read(
            handle,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise OSError(f"native ply read failed rc={rc}: {path}")
        return pts, (cols if has_color else None)
    finally:
        lib.prv_ply_close(handle)
