"""ctypes loader for the native binned-SAH BVH builder.

Compiles bvh_builder.cpp on first use (g++, cached as libbvh.so next to the
source); falls back cleanly when no compiler is available -- accel/bvh.py
then uses the numpy builder.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libbvh.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bvh_read.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_float)
        ] * 2 + [ctypes.POINTER(ctypes.c_int32)] * 4
        lib.bvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build(
    V: np.ndarray, F: np.ndarray, leaf_size: int
) -> Optional[Tuple[np.ndarray, ...]]:
    """Returns (bounds_min, bounds_max, skip, prim_offset, prim_count,
    prim_faces) or None when the native builder is unavailable."""
    lib = _load()
    if lib is None:
        return None
    V = np.ascontiguousarray(V, np.float32)
    F = np.ascontiguousarray(F, np.int32)
    nf = len(F)
    n_nodes = ctypes.c_int32(0)
    handle = lib.bvh_build(
        V.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(V),
        F.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nf,
        leaf_size,
        ctypes.byref(n_nodes),
    )
    m = n_nodes.value
    bounds_min = np.empty((m, 3), np.float32)
    bounds_max = np.empty((m, 3), np.float32)
    skip = np.empty(m, np.int32)
    prim_offset = np.empty(m, np.int32)
    prim_count = np.empty(m, np.int32)
    prim_faces = np.empty(nf, np.int32)
    lib.bvh_read(
        handle,
        bounds_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bounds_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        skip.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        prim_offset.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        prim_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        prim_faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    lib.bvh_free(handle)
    return bounds_min, bounds_max, skip, prim_offset, prim_count, prim_faces
