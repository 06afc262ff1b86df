"""ctypes bindings for the native topology engine (native/topology.cpp).

Auto-builds the shared library on first use (g++ is in the image); falls back
to pure-numpy implementations if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmimsem_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_NATIVE_DIR, "topology.cpp"))):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.merge_rows.restype = ctypes.c_longlong
        lib.merge_rows.argtypes = [
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.inverse_table.restype = ctypes.c_longlong
        lib.inverse_table.argtypes = [
            ctypes.c_longlong, ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def merge_rows(keys: np.ndarray):
    """(gid per row, first-occurrence row per id, n_unique) for int64 (n,3) keys."""
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = keys.shape[0]
    lib = _load()
    if lib is not None:
        gid = np.empty(n, np.int32)
        first = np.empty(n, np.int64)
        nuniq = int(lib.merge_rows(n, keys, gid, first))
        return gid.astype(np.int64), first[:nuniq], nuniq
    # numpy fallback
    uniq, first, inv = np.unique(keys, axis=0, return_index=True,
                                 return_inverse=True)
    order = np.argsort(first, kind='stable')
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return rank[inv.ravel()], first[order], len(uniq)
