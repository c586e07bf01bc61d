"""Piecewise-constant prolongation operators as label vectors.

The reference materialises P as an explicit CSR/Eigen sparse matrix of unit
entries (``src/CPU_C++/AGMG.cpp:181-186``,
``src/GPU_CUDAC++/Aggregation.cu:252-271``) and then pays general SpGEMMs for
Pᵀ·A·P and P composition (``main.cu:251-261``).  Every row of P has at most
one entry and every entry is 1, so P *is* a per-node aggregate label:

    labels[i] = aggregate index of fine node i, or -1 if the node is kept
                out of the coarse space (the G0 / diagonally-dominant nodes,
                AGMG.cpp:118-123).

On TPU this turns the whole transfer layer into gathers/scatters:

    P  @ xc  = where(labels >= 0, xc[labels], 0)            (gather)
    Pᵀ @ v   = zeros(nc).at[labels].add(v)                  (scatter-add)
    PᵀAP     = zeros((nc,nc)).at[labels[i],labels[j]].add(a_ij)

Host-side conversion to/from explicit CSR P is provided for the Matrix
Market interchange with the reference (``<name>promatrix_*.mtx`` files).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sparse.formats import COO, CSR


def prolong(labels: jnp.ndarray, xc: jnp.ndarray) -> jnp.ndarray:
    """P @ xc — fine vector from coarse.  labels: (n,), xc: (nc_pad,)."""
    safe = jnp.maximum(labels, 0)
    return jnp.where(labels >= 0, jnp.take(xc, safe, axis=0), 0.0)


def restrict(labels: jnp.ndarray, v: jnp.ndarray, nc_pad: int) -> jnp.ndarray:
    """Pᵀ @ v — coarse vector from fine (sum over aggregate members)."""
    out = jnp.zeros((nc_pad,), dtype=v.dtype)
    contrib = jnp.where(labels >= 0, v, 0.0)
    # excluded nodes (-1) are redirected to slot 0 with zero contribution
    return out.at[jnp.maximum(labels, 0)].add(contrib)


def labels_from_p_csr(p: CSR) -> tuple[np.ndarray, int]:
    """Convert an explicit prolongation matrix (as the reference writes it)
    into a label vector.  Validates the piecewise-constant contract: ≤ 1
    entry per row, all stored values 1."""
    n, nc = p.shape
    counts = p.rownnz()
    if counts.max(initial=0) > 1:
        raise ValueError("P has a row with more than one entry; not a "
                         "piecewise-constant aggregation matrix")
    if p.nnz and not np.allclose(p.data, 1.0):
        raise ValueError("P has non-unit entries")
    labels = np.full(n, -1, dtype=np.int32)
    rows = np.repeat(np.arange(n), counts)
    labels[rows] = p.indices.astype(np.int32)
    return labels, nc


def p_csr_from_labels(labels: np.ndarray, nc: int) -> CSR:
    """Materialise the explicit CSR P for interchange/writing
    (mirrors what ``main.cpp:224`` / ``main.cu:291`` write out)."""
    labels = np.asarray(labels)
    n = labels.shape[0]
    rows = np.flatnonzero(labels >= 0).astype(np.int64)
    cols = labels[rows].astype(np.int64)
    vals = np.ones(rows.shape[0], dtype=np.float64)
    return COO(row=rows, col=cols, val=vals, shape=(n, nc)).to_csr()


import jax


@jax.jit
def compose_labels(coarse_of_fine: jnp.ndarray,
                   coarser_of_coarse: jnp.ndarray) -> jnp.ndarray:
    """Label composition replacing P_cumm = P_cumm · P_pass SpGEMM
    (``main.cu:255-261``): fine node → pass-s aggregate.  Jitted: eager,
    this was 4 separate dispatches (and 4 per-shape compiles) per pass."""
    safe = jnp.maximum(coarse_of_fine, 0)
    nxt = jnp.take(coarser_of_coarse, safe, axis=0)
    return jnp.where(coarse_of_fine >= 0, nxt, -1)
