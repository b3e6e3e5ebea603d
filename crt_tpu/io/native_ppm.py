"""ctypes bridge to the native ASCII P3 formatter (native/crt_ppm.cpp).

Auto-builds the shared library on first use; callers catch exceptions and
fall back to the Python formatter (byte-identical output either way,
gated by tests/test_ppm.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_FN = None


def _load():
    global _FN
    if _FN is not None:
        return _FN
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import sys

    native_dir = os.path.join(root, "native")
    sys.path.insert(0, native_dir)
    try:
        import build as native_build  # type: ignore

        so = native_build.build()
    finally:
        sys.path.remove(native_dir)

    lib = ctypes.CDLL(so)
    fn = lib.crt_ppm_format
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_longlong,
    ]
    _FN = fn
    return fn


def format_ppm_native(arr: np.ndarray, max_color_component: int) -> str:
    """[H,W,3] int image (already quantized) -> ASCII P3 string."""
    fn = _load()
    arr = np.ascontiguousarray(arr, np.int32)
    h, w, _ = arr.shape
    cap = 64 + h * w * 3 * 5 + h
    buf = ctypes.create_string_buffer(cap)
    n = fn(arr.ctypes.data, h, w, max_color_component, buf, cap)
    if n < 0:
        raise RuntimeError("crt_ppm_format buffer too small")
    return buf.raw[:n].decode("ascii")
