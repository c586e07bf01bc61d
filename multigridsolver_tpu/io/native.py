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
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.mgio_write_mtx.restype = ctypes.c_int
        lib.mgio_write_mtx.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       i64p, i64p, f64p]
        lib.mgio_coo_to_csr.restype = ctypes.c_int64
        lib.mgio_coo_to_csr.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                        i64p, i64p, f64p, i64p, i64p, f64p]
        lib.mgio_cmk_order.restype = None
        lib.mgio_cmk_order.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
        lib.mgio_cmk_order_genuine.restype = None
        lib.mgio_cmk_order_genuine.argtypes = [ctypes.c_int64, i64p, i64p,
                                               i64p]
        lib.mgio_greedy_pass.restype = ctypes.c_int64
        lib.mgio_greedy_pass.argtypes = [
            ctypes.c_int64, i64p, i64p, f64p, f64p, f64p,
            ctypes.POINTER(ctypes.c_uint8), i64p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr(a, ty):
    return a.ctypes.data_as(ctypes.POINTER(ty))


def write_mtx_native(path: str, coo: COO) -> bool:
    """Write a Matrix Market file with the C++ writer; False on fallback."""
    lib = get_lib()
    if lib is None:
        return False
    row, col = _i64(coo.row), _i64(coo.col)
    val = np.ascontiguousarray(coo.val, dtype=np.float64)
    rc = lib.mgio_write_mtx(path.encode(), coo.shape[0], coo.shape[1],
                            coo.nnz, _ptr(row, ctypes.c_int64),
                            _ptr(col, ctypes.c_int64),
                            _ptr(val, ctypes.c_double))
    return rc == 0


def coo_to_csr_native(coo: COO):
    """COO→CSR (sort + duplicate merge) in C++; None on fallback."""
    from ..sparse.formats import CSR
    lib = get_lib()
    if lib is None:
        return None
    n = coo.shape[0]
    row, col = _i64(coo.row), _i64(coo.col)
    val = np.ascontiguousarray(coo.val, dtype=np.float64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    indices = np.empty(max(coo.nnz, 1), dtype=np.int64)
    data = np.empty(max(coo.nnz, 1), dtype=np.float64)
    out = lib.mgio_coo_to_csr(n, coo.nnz, _ptr(row, ctypes.c_int64),
                              _ptr(col, ctypes.c_int64),
                              _ptr(val, ctypes.c_double),
                              _ptr(indptr, ctypes.c_int64),
                              _ptr(indices, ctypes.c_int64),
                              _ptr(data, ctypes.c_double))
    return CSR(indptr=indptr, indices=indices[:out], data=data[:out],
               shape=coo.shape)


def cmk_order_native(csr, genuine: bool = False) -> np.ndarray | None:
    """BFS ("CMK") visitation order in C++; None on fallback.
    ``genuine=True`` runs the full Fortran rule (min-degree start,
    degree-sorted fronts) instead of the simplified C++ BFS."""
    lib = get_lib()
    if lib is None:
        return None
    n = csr.nrows
    indptr, indices = _i64(csr.indptr), _i64(csr.indices)
    order = np.empty(n, dtype=np.int64)
    fn = lib.mgio_cmk_order_genuine if genuine else lib.mgio_cmk_order
    fn(n, _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
       _ptr(order, ctypes.c_int64))
    return order


def greedy_pass_native(csr, diag: np.ndarray, si: np.ndarray,
                       excluded: np.ndarray, order: np.ndarray,
                       ktg: float) -> np.ndarray | None:
    """Exact sequential greedy matching (AGMG.cpp:101-194 semantics) in
    C++ — the large-problem parity baseline; None on fallback."""
    lib = get_lib()
    if lib is None:
        return None
    n = csr.nrows
    indptr, indices = _i64(csr.indptr), _i64(csr.indices)
    data = np.ascontiguousarray(csr.data, dtype=np.float64)
    diag = np.ascontiguousarray(diag, dtype=np.float64)
    si = np.ascontiguousarray(si, dtype=np.float64)
    excl = np.ascontiguousarray(excluded, dtype=np.uint8)
    order = _i64(order)
    labels = np.empty(n, dtype=np.int32)
    lib.mgio_greedy_pass(n, _ptr(indptr, ctypes.c_int64),
                         _ptr(indices, ctypes.c_int64),
                         _ptr(data, ctypes.c_double),
                         _ptr(diag, ctypes.c_double),
                         _ptr(si, ctypes.c_double),
                         _ptr(excl, ctypes.c_uint8),
                         _ptr(order, ctypes.c_int64), float(ktg),
                         labels.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_int32)))
    return labels


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
