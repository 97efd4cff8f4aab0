"""Native (C++) runtime kernels with pure-numpy fallbacks.

Reference: the reference's native layer (pyop2 sparsity.pyx, dmcommon
mesh preprocessing — SURVEY §2.9).  Compiled lazily with g++ into a
shared object next to the sources; every caller falls back to numpy if
the toolchain is unavailable, so the framework never REQUIRES a
compiler."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_HERE, "_fdtpu_native.so")
    src = os.path.join(_HERE, "coo_build.cpp")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", src, "-o", so],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.coo_sort_unique.restype = ctypes.c_int64
        lib.coo_sort_unique.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def coo_sort_unique(keys: np.ndarray):
    """(uniq_keys, positions): sorted unique COO keys + per-entry
    position (sentinel keys < 0 -> position == nnz).  C++ when the
    toolchain is present, numpy otherwise — results are identical."""
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    lib = _load()
    if lib is not None and keys.size:
        n = keys.size
        positions = np.empty(n, dtype=np.int32)
        uniq = np.empty(n, dtype=np.int64)
        nnz = lib.coo_sort_unique(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n),
            positions.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            uniq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return uniq[:nnz].copy(), positions
    vmask = keys >= 0
    uniq = np.unique(keys[vmask])
    positions = np.searchsorted(uniq, keys).astype(np.int32)
    positions[~vmask] = len(uniq)
    return uniq, positions
