"""Native (C++) host-side kernels, loaded via ctypes.

Built on first use with the system compiler (g++); every consumer has a
pure-numpy fallback, so the framework works without a toolchain — the
native path is a host-side speedup for evaluation (the reference used a
Cython extension + a 10-process pool for the same job,
reference utils/box_intersection.pyx + utils/eval_det.py:253).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "_rotated_iou.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[str]:
    src = os.path.join(_DIR, "rotated_iou.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.isfile(_LIB_PATH) else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        lib.box3d_iou_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.box3d_iou_batch.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def box3d_iou_batch_native(corners1: np.ndarray, corners2: np.ndarray) -> Optional[np.ndarray]:
    """Pairwise rotated 3D IoU via the C++ core; None if unavailable.

    corners1 (M, 8, 3), corners2 (N, 8, 3) -> (M, N) float64.
    """
    lib = _load()
    if lib is None:
        return None
    c1 = np.ascontiguousarray(corners1, np.float32)
    c2 = np.ascontiguousarray(corners2, np.float32)
    m, n = c1.shape[0], c2.shape[0]
    out = np.empty((m, n), np.float64)
    lib.box3d_iou_batch(
        c1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
        c2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
