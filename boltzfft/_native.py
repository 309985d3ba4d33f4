"""ctypes bindings for the native runtime library (``native/boltzfft_native.cpp``).

Importing this module raises ``ImportError`` when the shared library hasn't
been built (``make -C native``); callers fall back to NumPy implementations.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent / "_lib" / "libboltzfft_native.so"

if not _LIB_PATH.exists():
    raise ImportError(f"native library not built: {_LIB_PATH} (run `make -C native`)")

_lib = ctypes.CDLL(str(_LIB_PATH))

_lib.bz_leggauss.restype = ctypes.c_int
_lib.bz_leggauss.argtypes = [
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double),
]
_lib.bz_running_stats.restype = ctypes.c_int
_lib.bz_running_stats.argtypes = [
    ctypes.POINTER(ctypes.c_double),
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_double),
]


def leggauss(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes/weights on [-1, 1] (long-double Newton iteration)."""
    nodes = np.empty(n, dtype=np.float64)
    weights = np.empty(n, dtype=np.float64)
    rc = _lib.bz_leggauss(
        n,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise ValueError(f"bz_leggauss failed for n={n}")
    return nodes, weights


def running_stats(samples) -> tuple[float, float, float, float]:
    """(mean, min, max, sample-stdev) in one native pass."""
    arr = np.ascontiguousarray(samples, dtype=np.float64)
    out = np.empty(4, dtype=np.float64)
    rc = _lib.bz_running_stats(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise ValueError("bz_running_stats failed")
    return tuple(out)
