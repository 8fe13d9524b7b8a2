"""ctypes bridge to the native C++ BVH builder (native/bvh_builder.cpp).

Compiled on demand with g++ (cached next to the source); falls back to the
pure-Python median-split builder (bvh.py) if the toolchain is unavailable.
The native builder is binned-SAH, so it also produces better trees.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from .bvh import BVHArrays

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = os.path.join(_native_dir(), "bvh_builder.cpp")
        so = os.path.join(_native_dir(), "build", "libzdr_bvh.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                os.makedirs(os.path.dirname(so), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.zdr_build_bvh.restype = ctypes.c_int
            lib.zdr_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # v0
                ctypes.POINTER(ctypes.c_float),  # v1
                ctypes.POINTER(ctypes.c_float),  # v2
                ctypes.c_int,  # n_tris
                ctypes.c_int,  # leaf_size
                ctypes.POINTER(ctypes.c_float),  # node_lo
                ctypes.POINTER(ctypes.c_float),  # node_hi
                ctypes.POINTER(ctypes.c_int32),  # node_left
                ctypes.POINTER(ctypes.c_int32),  # node_right
                ctypes.POINTER(ctypes.c_uint8),  # node_is_leaf
                ctypes.POINTER(ctypes.c_int32),  # tri_perm
                ctypes.c_int32,  # max_nodes
                ctypes.c_int32,  # max_perm
                ctypes.POINTER(ctypes.c_int32),  # out_n_nodes
                ctypes.POINTER(ctypes.c_int32),  # out_n_perm
            ]
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int
) -> Optional[BVHArrays]:
    """Binned-SAH build via the C++ library; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = v0.shape[0]
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    max_nodes = 4 * (n // leaf_size + 2) + 8 + 2 * n
    max_perm = 2 * n * leaf_size + 4 * leaf_size
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    node_left = np.empty(max_nodes, np.int32)
    node_right = np.empty(max_nodes, np.int32)
    node_is_leaf = np.empty(max_nodes, np.uint8)
    tri_perm = np.empty(max_perm, np.int32)
    out_nodes = ctypes.c_int32(0)
    out_perm = ctypes.c_int32(0)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.zdr_build_bvh(
        p(v0, ctypes.c_float), p(v1, ctypes.c_float), p(v2, ctypes.c_float),
        n, leaf_size,
        p(node_lo, ctypes.c_float), p(node_hi, ctypes.c_float),
        p(node_left, ctypes.c_int32), p(node_right, ctypes.c_int32),
        p(node_is_leaf, ctypes.c_uint8), p(tri_perm, ctypes.c_int32),
        max_nodes, max_perm,
        ctypes.byref(out_nodes), ctypes.byref(out_perm),
    )
    if rc != 0:
        return None
    m = out_nodes.value
    k = out_perm.value
    return BVHArrays(
        node_lo=node_lo[:m].copy(),
        node_hi=node_hi[:m].copy(),
        node_left=node_left[:m].copy(),
        node_right=node_right[:m].copy(),
        node_is_leaf=node_is_leaf[:m].astype(bool),
        tri_perm=tri_perm[:k].copy(),
    )
