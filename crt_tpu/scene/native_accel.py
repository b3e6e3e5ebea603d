"""ctypes bridge to the native KD builder (native/crt_accel.cpp).

Auto-builds the shared library on first use; any failure falls back to the
NumPy builder in crt_tpu.scene.accel (the caller catches exceptions).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import sys

    native_dir = os.path.join(root, "native")
    sys.path.insert(0, native_dir)
    try:
        import build as native_build  # type: ignore

        so = native_build.build()
    finally:
        sys.path.remove(native_dir)

    lib = ctypes.CDLL(so)
    lib.crt_accel_build.restype = ctypes.c_void_p
    lib.crt_accel_build.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    for name in ("crt_accel_num_nodes", "crt_accel_num_leaves",
                 "crt_accel_max_leaf_count"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int32
        fn.argtypes = [ctypes.c_void_p]
    lib.crt_accel_export.restype = None
    # signature: (h, node_min, node_max, node_children, node_leaf_id,
    #             leaf_tris, leaf_stride, leaf_node)
    lib.crt_accel_export.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.crt_accel_free.restype = None
    lib.crt_accel_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def build_host(tmin: np.ndarray, tmax: np.ndarray, max_depth: int, max_leaf: int):
    """Same return contract as accel._build_host:
    (node_min list-like [N,3], node_max, node_children [N,2], leaf_lists)."""
    lib = _load()
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    T = len(tmin)
    if T <= 0:
        # crt_accel_build returns nullptr for empty input; mirror the NumPy
        # builder by refusing here so callers fall back / skip the tree.
        raise ValueError("cannot build an acceleration tree over 0 triangles")
    h = lib.crt_accel_build(
        tmin.ctypes.data, tmax.ctypes.data, T, max_depth, max_leaf
    )
    try:
        N = lib.crt_accel_num_nodes(h)
        L = lib.crt_accel_num_leaves(h)
        stride = max(1, lib.crt_accel_max_leaf_count(h))

        node_min = np.empty((N, 3), np.float32)
        node_max = np.empty((N, 3), np.float32)
        node_children = np.empty((N, 2), np.int32)
        node_leaf_id = np.empty(N, np.int32)
        leaf_tris = np.full((L, stride), -1, np.int32)
        leaf_node = np.empty(L, np.int32)
        lib.crt_accel_export(
            h, node_min.ctypes.data, node_max.ctypes.data,
            node_children.ctypes.data, node_leaf_id.ctypes.data,
            leaf_tris.ctypes.data, stride, leaf_node.ctypes.data,
        )
    finally:
        lib.crt_accel_free(h)

    leaf_lists = {}
    for li in range(L):
        tris = leaf_tris[li]
        leaf_lists[int(leaf_node[li])] = tris[tris >= 0].astype(np.int32)

    return (
        list(node_min), list(node_max),
        [list(c) for c in node_children], leaf_lists,
    )
