"""Native (C++) acceleration-structure builder — build-on-demand + ctypes.

Role parity with the reference's native BVH build path (HIPRT C++). The shared
library is compiled once with g++ -O2 and cached next to the source; if no
compiler is available the caller falls back to the numpy builder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "bvh_builder.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_bvh_builder.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native builder; None if unavailable."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _compile():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.hpt_build_bvh.restype = ctypes.c_int64
            lib.hpt_build_bvh_raw.restype = ctypes.c_int64
            lib.hpt_build_bvh_raw.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.hpt_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.hpt_build_bvh_raw_sbvh.restype = ctypes.c_int64
            lib.hpt_build_bvh_raw_sbvh.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def build_bvh_native(vertices: np.ndarray, triangles: np.ndarray,
                     max_leaf: int = 4):
    """Returns (M, 128) float32 meganode rows, or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(vertices, dtype=np.float32)
    tris = np.ascontiguousarray(triangles, dtype=np.int32)
    n_tris = tris.shape[0]
    cap = max(n_tris, 1)
    rows = np.zeros((cap, 128), dtype=np.float32)
    n = lib.hpt_build_bvh(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.shape[0],
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_tris,
        max_leaf,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
    )
    if n <= 0:
        return None
    return rows[:n]


def build_bvh_raw_native(vertices: np.ndarray, triangles: np.ndarray,
                         max_leaf: int, sbvh: bool = True):
    """Raw BVH2: (bounds (M,6) f32, meta (M,2) i32 [left,count], order (R,)
    i64) or None if native unavailable.

    sbvh=True (default) enables spatial splits (Stich et al. 2009 — role
    parity with HIPRT PreferHighQualityBuild); order then holds up to 2T
    duplicated clipped references."""
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(vertices, dtype=np.float32)
    tris = np.ascontiguousarray(triangles, dtype=np.int32)
    n_tris = tris.shape[0]
    cap = max(4 * n_tris, 16)
    bounds = np.zeros((cap, 6), np.float32)
    meta = np.zeros((cap, 2), np.int32)
    if sbvh:
        cap_order = max(2 * n_tris, 1)
        order = np.zeros((cap_order,), np.int64)
        n_order = ctypes.c_int64(0)
        n = lib.hpt_build_bvh_raw_sbvh(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            verts.shape[0],
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_tris,
            max_leaf,
            bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap_order,
            ctypes.byref(n_order),
        )
        if n <= 0:
            return None
        return bounds[:n], meta[:n], order[: max(int(n_order.value), 1)]
    order = np.zeros((max(n_tris, 1),), np.int64)
    n = lib.hpt_build_bvh_raw(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.shape[0],
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_tris,
        max_leaf,
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n <= 0:
        return None
    return bounds[:n], meta[:n], order
