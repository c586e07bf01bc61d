"""ctypes bindings to the native C++ runtime (``native/libmgio.so``).

The reference implements its I/O and serial-baseline layers in C++/CUDA
(``src/common/MatrixIO.cpp``, ``src/GPU_CUDAC++/MatrixIO.cu``).  The TPU
framework keeps the same split: JAX/XLA/Pallas own the device compute path,
while the host runtime (Matrix Market parsing of multi-GB files, COO→CSR
assembly, the exact serial aggregation baseline) is native C++ loaded through
``ctypes``.  Everything here degrades gracefully to the pure-Python
implementations when the shared library has not been built.
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

from ..sparse.formats import COO

_LIB = None
_TRIED = False


def _find_lib() -> str | None:
    root = Path(__file__).resolve().parents[2]
    for cand in (root / "native" / "libmgio.so",
                 Path(__file__).parent / "libmgio.so"):
        if cand.exists():
            return str(cand)
    return None


def get_lib():
    """Load and memoize the native library; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mgio_read_mtx.restype = ctypes.c_void_p
        lib.mgio_read_mtx.argtypes = [ctypes.c_char_p]
        lib.mgio_result_dims.restype = None
        lib.mgio_result_dims.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int64)]
        lib.mgio_result_fill.restype = None
        lib.mgio_result_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double)]
        lib.mgio_result_free.restype = None
        lib.mgio_result_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def read_mtx_native(path: str) -> COO | None:
    """Parse a Matrix Market file with the C++ parser; None on fallback."""
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    handle = lib.mgio_read_mtx(path.encode())
    if not handle:
        return None
    try:
        dims = (ctypes.c_int64 * 4)()
        lib.mgio_result_dims(handle, dims)
        nrows, ncols, nnz, ok = dims[0], dims[1], dims[2], dims[3]
        if not ok:
            return None
        row = np.empty(nnz, dtype=np.int64)
        col = np.empty(nnz, dtype=np.int64)
        val = np.empty(nnz, dtype=np.float64)
        lib.mgio_result_fill(
            handle,
            row.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            col.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return COO(row=row, col=col, val=val, shape=(int(nrows), int(ncols)))
    finally:
        lib.mgio_result_free(handle)
