"""Core sparse operations on the padded-ELL device format.

Every op here is a pure jittable function over :class:`ELL` pytrees, written
so XLA sees only static shapes and dense ``(n, K)`` arrays — the TPU-native
counterpart of the reference's per-row CUDA kernels
(``src/GPU_CUDAC++/Aggregation.cu:17-90``, ``MatrixOperations.cu``).

Column access: the reference materialises an explicit CSC copy via cuSPARSE
(``MatrixOperations.cu:473-544``) so each thread can walk a column.  Here,
column-wise quantities (column sums, A + Aᵀ structure) are computed by
*scatter-add over the ELL slots* (``.at[].add``) — one fused XLA scatter
instead of a format conversion.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .formats import ELL


def spmv(a: ELL, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x.  ``x``: (ncols_padded,) — padded slots must be 0-safe.

    Invalid ELL slots have val = 0, so no masking is needed; ``cols`` padding
    is 0 which is always in range.
    """
    gathered = jnp.take(x, a.cols, axis=0)          # (n_pad, K)
    return jnp.sum(a.vals * gathered, axis=1)


def spmv_t(a: ELL, y: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """x = Aᵀ @ y via scatter-add (no transpose materialisation)."""
    contrib = a.vals * y[: a.npad, None]            # (n_pad, K)
    out = jnp.zeros((out_size,), dtype=contrib.dtype)
    return out.at[a.cols].add(contrib)


def extract_diag(a: ELL) -> jnp.ndarray:
    """(npad,) diagonal; 0 where a row stores no diagonal entry."""
    ri = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
    isdiag = (a.cols == ri) & a.slot_mask()
    return jnp.sum(jnp.where(isdiag, a.vals, 0.0), axis=1)


def row_sum(a: ELL, absolute: bool = False, skip_diag: bool = False
            ) -> jnp.ndarray:
    """Σⱼ aᵢⱼ per row (optionally |aᵢⱼ|, optionally excluding the diagonal)."""
    v = jnp.abs(a.vals) if absolute else a.vals
    if skip_diag:
        ri = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
        v = jnp.where(a.cols == ri, 0.0, v)
    # padding slots already hold 0
    return jnp.sum(v, axis=1)


def col_sum(a: ELL, absolute: bool = False, skip_diag: bool = False
            ) -> jnp.ndarray:
    """Σᵢ aᵢⱼ per column, via scatter-add (replaces the reference's CSC copy)."""
    v = jnp.abs(a.vals) if absolute else a.vals
    mask = a.slot_mask()
    ri = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
    if skip_diag:
        mask = mask & (a.cols != ri)
    v = jnp.where(mask, v, 0.0)
    out = jnp.zeros((a.npad,), dtype=v.dtype)
    return out.at[a.cols].add(v)


def symmetrized_offdiag_sums(a: ELL) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (Σⱼ≠ᵢ |(aᵢⱼ + aⱼᵢ)/2|,  Σⱼ≠ᵢ (aᵢⱼ + aⱼᵢ)/2).

    The reference computes these with a two-pointer CSR/CSC merge per thread
    (``src/GPU_CUDAC++/Aggregation.cu:17-90``; ``src/CPU_C++/AGMG.cpp:48-90``).
    Exact merge semantics matter only where row i and column i overlap:

      |.| sum:  Σ |aᵢⱼ + aⱼᵢ|/2 over the union pattern (shared entries add
                *before* the abs; disjoint entries contribute |a|/2).
      plain sum: Σ (aᵢⱼ + aⱼᵢ)/2 = (row_sum + col_sum)/2 — no overlap issue.

    TPU formulation: the |.| sum needs, for each stored (i, j), the value of
    the transposed entry aⱼᵢ.  We compute a "paired value" array by scatter /
    gather through a dense key-match: for each slot (i→j) find aⱼᵢ if stored.
    To stay O(nnz), we scatter vals into a (npad, K) *transposed-slot* table
    aligned with A's own slots via a two-pass trick:

      1. tpos[i, s] = position of entry (cols[i,s] → i) in A's storage, found
         by matching; implemented with a scatter of slot-linear ids into a
         dense (npad, npad)?  — too big.  Instead we use the standard
         sort-free approach: scatter each stored value keyed by (min,max)
         unordered pair is ambiguous for nonsymmetric values.

    The robust O(nnz · K) TPU approach used here: for slot (i, s) with
    j = cols[i, s], search row j's (K-wide) column vector for i — a vectorised
    K-way compare (K is small: ≤ 5-27 for the target suites).  This is the
    direct analogue of the reference's ``getElementMatrixCSR`` binary search
    (``src/GPU_CUDAC++/MatrixAccess.cu:28-47``) but fully data-parallel.
    """
    vals_t = transposed_slot_values(a)  # (npad, K): aⱼᵢ for each stored (i,j)
    mask = a.slot_mask()
    ri = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
    offdiag = mask & (a.cols != ri)
    sym = (a.vals + vals_t) / 2.0
    # union pattern: every stored (i,j) contributes |sym|; an entry (j,i)
    # stored but (i,j) NOT stored contributes |aji|/2 to row i — handled by
    # the scatter below.
    abs_from_rows = jnp.sum(jnp.where(offdiag, jnp.abs(sym), 0.0), axis=1)
    # contributions from column entries with no matching row entry:
    has_pair = pair_exists(a)           # (npad,K) True if (j,i) also stored
    lone = offdiag & ~has_pair          # (i,j) stored, (j,i) not
    # such (i,j) gives row j an extra |aij|/2  (because (j,i) slot missing)
    extra = jnp.zeros((a.npad,), dtype=a.vals.dtype)
    extra = extra.at[a.cols].add(
        jnp.where(lone, jnp.abs(a.vals) / 2.0, 0.0))
    abs_sum = abs_from_rows + extra
    rs = row_sum(a, skip_diag=True)
    cs = col_sum(a, skip_diag=True)
    plain_sum = (rs + cs) / 2.0
    return abs_sum, plain_sum


def transposed_slot_values(a: ELL) -> jnp.ndarray:
    """(npad, K) array t where t[i, s] = A[j, i] for j = cols[i, s] (0 if the
    transposed entry is not stored)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
    j = a.cols                                  # (n, K)
    # row j's columns / values: (n, K, K)
    cols_j = jnp.take(a.cols, j, axis=0)        # (n, K, K)
    vals_j = jnp.take(a.vals, j, axis=0)
    nnz_j = jnp.take(a.rownnz, j, axis=0)       # (n, K)
    sl = jax.lax.broadcasted_iota(jnp.int32, cols_j.shape, 2)
    hit = (cols_j == ri[:, :, None]) & (sl < nnz_j[:, :, None])
    return jnp.sum(jnp.where(hit, vals_j, 0.0), axis=2)


def pair_exists(a: ELL) -> jnp.ndarray:
    """(npad, K) bool: True where the transposed entry (j, i) is stored."""
    ri = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
    j = a.cols
    cols_j = jnp.take(a.cols, j, axis=0)
    nnz_j = jnp.take(a.rownnz, j, axis=0)
    sl = jax.lax.broadcasted_iota(jnp.int32, cols_j.shape, 2)
    hit = (cols_j == ri[:, :, None]) & (sl < nnz_j[:, :, None])
    return jnp.any(hit, axis=2) & a.slot_mask()


def get_element(a: ELL, i: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Random element access A[i, j] (vectorised over i, j arrays).

    TPU analogue of ``getElementMatrixCSR`` (``MatrixAccess.cu:28-47``):
    instead of a per-thread binary search, compare against the K-wide row.
    """
    cols_i = jnp.take(a.cols, i, axis=0)      # (..., K)
    vals_i = jnp.take(a.vals, i, axis=0)
    nnz_i = jnp.take(a.rownnz, i, axis=0)
    sl = jax.lax.broadcasted_iota(jnp.int32, cols_i.shape, cols_i.ndim - 1)
    hit = (cols_i == j[..., None]) & (sl < nnz_i[..., None])
    return jnp.sum(jnp.where(hit, vals_i, 0.0), axis=-1)


def to_dense(a: ELL) -> jnp.ndarray:
    """(nrows, ncols) dense materialisation (small matrices only)."""
    out = jnp.zeros((a.npad, a.ncols), dtype=a.vals.dtype)
    ri = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
    v = jnp.where(a.slot_mask(), a.vals, 0.0)
    out = out.at[ri, a.cols].add(v)
    return out[: a.nrows]
