"""ctypes bindings to the native host-runtime library (native/).

Builds on demand with `make` if the shared library is missing (the
reference's build.sh compiles its Thirdparty libs the same way).  Every
entry point has a pure-Python fallback so the framework works without a
toolchain; the native paths are the fast ones (ORBvoc parse ~20-40x).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liborbslam2_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.parse_orbvoc.restype = ctypes.c_int64
    lib.parse_orbvoc.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.parse_float_table.restype = ctypes.c_int64
    lib.parse_float_table.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.decode_pgm.restype = ctypes.c_int32
    lib.decode_pgm.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_orbvoc_fast(path: str):
    """Native ORBvoc.txt parse -> (header k/L/s/w, parents, is_leaf,
    desc (n, 32) u8, weights) or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    # Upper bound on node count: ~one node per 80 bytes of text.
    max_nodes = max(len(data) // 60, 1024)
    header = np.zeros(4, np.int32)
    parents = np.zeros(max_nodes, np.int32)
    is_leaf = np.zeros(max_nodes, np.uint8)
    desc = np.zeros((max_nodes, 32), np.uint8)
    weight = np.zeros(max_nodes, np.float32)
    n = lib.parse_orbvoc(
        data, len(data),
        header.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        is_leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        weight.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_nodes,
    )
    if n < 0:
        return None
    return (
        header, parents[:n].copy(), is_leaf[:n].astype(bool).copy(),
        desc[:n].copy(), weight[:n].copy(),
    )


def parse_float_table_fast(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    out = np.zeros(max(len(data) // 2, 64), np.float64)
    n = lib.parse_float_table(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(out),
    )
    return out[:n].copy()


def decode_pgm_fast(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.decode_pgm(data, len(data), ctypes.byref(w), ctypes.byref(h), None):
        return None
    out = np.zeros((h.value, w.value), np.uint8)
    rc = lib.decode_pgm(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        out.ctypes.data_as(ctypes.c_char_p),
    )
    if rc:
        return None
    return out.astype(np.float32)
