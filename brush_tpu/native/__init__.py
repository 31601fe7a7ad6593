"""Native (C++) host components, loaded via ctypes.

The reference's host runtime is Rust (colmap-reader, kiddo KD-tree, ply-rs);
these are the equivalents for the pieces where Python is not viable at
production scale: k-NN scale initialization (O(n^2) in pure numpy) and
single-pass COLMAP binary parsing.

The shared library is built on first use with g++ (cached next to the
sources); every caller has a pure-Python fallback, so a missing toolchain
degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libbrush_native.so")
_SOURCES = ["knn.cpp", "colmap.cpp"]

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    # -march=native is safe ONLY because the .so is never shipped: it is
    # gitignored and always built on the machine that runs it (a copied
    # binary could SIGILL on a CPU without the build host's ISA).
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", "-o", _LIB_PATH,
    ] + [os.path.join(_DIR, s) for s in _SOURCES]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # Retry without OpenMP (not all toolchains ship libgomp).
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(os.path.join(_DIR, s)) > os.path.getmtime(_LIB_PATH)
            for s in _SOURCES
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.knn_mean_distance.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.colmap_points3d_count.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.colmap_points3d_count.restype = ctypes.c_int64
        lib.colmap_points3d_parse.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.colmap_points3d_parse.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def knn_distances(positions: np.ndarray, k: int = 3) -> np.ndarray:
    """sqrt(sum of k smallest squared distances) / k, self included
    (reference: gaussian_splats.rs:108-120)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(positions, dtype=np.float32)
    n = pts.shape[0]
    out = np.empty(n, dtype=np.float32)
    lib.knn_mean_distance(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def read_points3d_bin(data: bytes):
    """(positions (n,3) f32, colors (n,3) f32) from COLMAP points3D.bin."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.frombuffer(data, dtype=np.uint8)
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.colmap_points3d_count(ptr, len(data))
    if n < 0:
        raise ValueError("malformed points3D.bin")
    pos = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    parsed = lib.colmap_points3d_parse(
        ptr, len(data),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if parsed != n:
        raise ValueError("truncated points3D.bin")
    return pos, rgb
