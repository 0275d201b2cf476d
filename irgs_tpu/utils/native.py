"""ctypes bindings for the native host-runtime helpers (native/irgs_native.cpp).

Builds the shared object on first use with g++ (no pybind11 in this image;
the C ABI + ctypes keeps the binding dependency-free). All entry points have
pure-numpy fallbacks so the framework never hard-requires the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "..", "native", "irgs_native.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(_SRC)), "irgs_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", _SO, _SRC, "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.mean_knn_dist2.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.ply_deinterleave_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.ply_interleave_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def mean_knn_dist2_native(points: np.ndarray, k: int = 3,
                          window: int = 48) -> np.ndarray | None:
    """Morton-window approximate k-NN mean squared distance
    (≙ simple-knn distCUDA2). Returns None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.zeros(len(pts), np.float32)
    lib.mean_knn_dist2(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts), k,
        window, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def ply_deinterleave(payload: bytes, n: int, n_fields: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(payload, np.uint8, count=n * n_fields * 4)
    out = np.zeros((n_fields, n), np.float32)
    lib.ply_deinterleave_f32(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, n_fields,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def ply_interleave(cols: np.ndarray) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    cols = np.ascontiguousarray(cols, np.float32)
    n_fields, n = cols.shape
    out = np.zeros(n * n_fields * 4, np.uint8)
    lib.ply_interleave_f32(
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, n_fields,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()
