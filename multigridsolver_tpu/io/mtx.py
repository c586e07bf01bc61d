"""Matrix Market I/O.

Matches the reference's file-interchange semantics
(``src/common/MatrixIO.cpp:12-57``, ``src/GPU_CUDAC++/MatrixIO.cu:115-168``):
1-based coordinate entries, ``%``-prefixed comment lines (the reference's own
Poisson generator emits a single-``%`` header — ``src/common/poisson.cpp:10``),
duplicates summed, rows canonically sorted.  Also handles the ``symmetric``
qualifier for general MM compatibility (the reference suite is all
``general``).

A fast native C++ parser is used when available (see
:mod:`multigridsolver_tpu.io.native`); this module is the pure-Python
fallback and the writer.
"""
from __future__ import annotations

import io
import os

import numpy as np

from ..sparse.formats import COO, CSR


def read_mtx_coo(path: str | os.PathLike, use_native: bool = True) -> COO:
    """Read a Matrix Market coordinate file into host COO (0-based)."""
    if use_native:
        from . import native
        out = native.read_mtx_native(str(path))
        if out is not None:
            return out
    with open(path, "r") as f:
        header = f.readline()
        symmetric = "symmetric" in header
        # skip remaining comment lines
        line = f.readline()
        while line.startswith("%") or line.strip() == "":
            line = f.readline()
        parts = line.split()
        nrows, ncols, nnz = int(parts[0]), int(parts[1]), int(parts[2])
        data = np.loadtxt(io.StringIO(f.read()), dtype=np.float64,
                          ndmin=2, comments="%")
    if data.size == 0:
        data = np.zeros((0, 3))
    if data.shape[0] != nnz:
        raise ValueError(
            f"{path}: header promises {nnz} entries, found {data.shape[0]}")
    row = data[:, 0].astype(np.int64) - 1
    col = data[:, 1].astype(np.int64) - 1
    val = data[:, 2] if data.shape[1] > 2 else np.ones(nnz)
    if symmetric:
        off = row != col
        row = np.concatenate([row, col[off]])
        col = np.concatenate([col, data[off, 0].astype(np.int64) - 1])
        val = np.concatenate([val, val[off]])
    return COO(row=row, col=col, val=val, shape=(nrows, ncols))


def read_mtx(path: str | os.PathLike, use_native: bool = True) -> CSR:
    """Read a Matrix Market file into canonical host CSR."""
    return read_mtx_coo(path, use_native=use_native).to_csr()


def write_mtx(path: str | os.PathLike, mat: CSR | COO) -> None:
    """Write CSR/COO as ``general`` 1-based coordinate Matrix Market.

    Mirrors ``src/common/MatrixIO.cpp:39-57`` (one entry per line,
    ``row col value``); values are written with enough digits to round-trip
    float64.
    """
    coo = mat.to_coo() if isinstance(mat, CSR) else mat
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{coo.shape[0]} {coo.shape[1]} {coo.nnz}\n")
        buf = np.empty((coo.nnz,), dtype=object)
        rows = coo.row + 1
        cols = coo.col + 1
        vals = coo.val
        lines = [f"{rows[i]} {cols[i]} {vals[i]:.17g}" for i in range(coo.nnz)]
        del buf
        f.write("\n".join(lines))
        if coo.nnz:
            f.write("\n")
