"""Galerkin coarse-operator construction  Ac = Pᵀ A P.

The reference forms this with two general sparse GEMMs
(Eigen: ``src/CPU_C++/AGMG.cpp:307-308``; cuSPARSE:
``src/GPU_CUDAC++/main.cu:251-253``) — the dominant setup cost per pass.
With piecewise-constant P expressed as a label vector, the triple product
collapses to a *relabel + reduce-by-key* over A's nonzeros:

    Ac[labels[i], labels[j]] += A[i, j]     (skip labels < 0)

Two device paths:

* :func:`galerkin_dense` — scatter straight into a dense (nc, nc) block.
  Used for the coarsest level, which is LU-factorised densely anyway.
* :func:`galerkin_ell` — sort-by-key + segment-sum producing a padded ELL
  coarse matrix with static bounded shapes (coarse nnz ≤ fine nnz), fully
  on-device; only the resulting true `nc`/`nnz_c`/row-width are read back by
  the host driver, mirroring the reference's scalar readbacks
  (``main.cu:189-214``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.formats import ELL


def galerkin_dense(a: ELL, labels: jnp.ndarray, nc_pad: int) -> jnp.ndarray:
    """Dense Ac (nc_pad, nc_pad) by scatter-add over A's stored slots."""
    li = labels[None, :] + jnp.zeros_like(a.cols)   # (K, n_pad)
    lj = jnp.take(labels, a.cols, axis=0)
    valid = a.slot_mask() & (li >= 0) & (lj >= 0)
    v = jnp.where(valid, a.vals, 0.0)
    li = jnp.maximum(li, 0)
    lj = jnp.maximum(lj, 0)
    out = jnp.zeros((nc_pad, nc_pad), dtype=a.vals.dtype)
    return out.at[li, lj].add(v)


def coarse_coo(a: ELL, labels: jnp.ndarray):
    """Relabelled COO triplets of Ac, unreduced, with validity mask.

    Returns (li, lj, v, valid) each of shape (K * n_pad,).
    """
    li = labels[None, :] + jnp.zeros_like(a.cols)
    lj = jnp.take(labels, a.cols, axis=0)
    valid = a.slot_mask() & (li >= 0) & (lj >= 0)
    v = jnp.where(valid, a.vals, 0.0)
    return li.ravel(), lj.ravel(), v.ravel(), valid.ravel()


def galerkin_ell_arrays(a: ELL, labels: jnp.ndarray, nc: int, kc: int):
    """Device computation of the coarse ELL arrays.

    ``nc``: static padded coarse size (≥ true nc).  ``kc``: static coarse
    row width bound.  Entries that do not fit in ``kc`` are dropped — the
    caller must choose ``kc`` ≥ max coarse row degree (checked by returning
    the true max degree for host verification).

    Returns (cols, vals, rownnz, info) where info = [nnz_c, max_degree].
    """
    li, lj, v, valid = coarse_coo(a, labels)
    m = li.shape[0]
    # lexicographic stable sort by (row, col); invalid entries get row = nc
    # and sort to the end.  Two int32 keys instead of one int64 composite —
    # int64 is emulated (slow) on TPU.
    li = jnp.where(valid, li, nc).astype(jnp.int32)
    lj = jnp.where(valid, lj, nc).astype(jnp.int32)
    li, lj, v = jax.lax.sort((li, lj, v), num_keys=2, is_stable=True)
    valid_s = li < nc
    # runs of equal (row, col) = unique coarse entries
    same = (li[1:] == li[:-1]) & (lj[1:] == lj[:-1])
    newrun = jnp.concatenate([valid_s[:1], ~same & valid_s[1:]])
    run_id = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    nnz_c = jnp.sum(newrun.astype(jnp.int32))
    # segment-sum values into runs (invalid entries carry v == 0 and are
    # dumped into segment m-1, which is only a real run if *all* m entries
    # are valid and unique — in which case there are no invalid entries)
    seg = jnp.where(valid_s, run_id, m - 1)
    sums = jax.ops.segment_sum(v, seg, num_segments=m)
    # the first entry of each run deposits the run's (row, col)
    dump = jnp.where(newrun, run_id, m - 1)
    rows_c = jnp.full((m,), nc, jnp.int32).at[dump].min(
        jnp.where(newrun, li, nc))
    cols_c = jnp.full((m,), nc, jnp.int32).at[dump].min(
        jnp.where(newrun, lj, nc))
    run_valid = rows_c < nc
    rows_c = jnp.where(run_valid, rows_c, 0)
    cols_c = jnp.where(run_valid, cols_c, 0)
    # coarse row degrees and the slot of each run within its row (runs are
    # key-sorted, hence contiguous and column-sorted within a row)
    rownnz = jax.ops.segment_sum(run_valid.astype(jnp.int32), rows_c,
                                 num_segments=nc)
    row_start = jnp.cumsum(rownnz) - rownnz
    run_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    slot = run_idx - jnp.take(row_start, rows_c)
    in_range = run_valid & (slot < kc)
    safe_r = jnp.where(in_range, rows_c, 0)
    safe_s = jnp.where(in_range, slot, 0)
    cols = jnp.zeros((kc, nc), dtype=jnp.int32)
    vals = jnp.zeros((kc, nc), dtype=a.vals.dtype)
    cols = cols.at[safe_s, safe_r].add(jnp.where(in_range, cols_c, 0))
    vals = vals.at[safe_s, safe_r].add(jnp.where(in_range, sums, 0.0))
    max_degree = jnp.max(rownnz)
    # host re-runs with a larger kc when max_degree > kc (overflow dropped)
    rownnz_clamped = jnp.minimum(rownnz, kc)
    info = jnp.stack([nnz_c.astype(jnp.int32), max_degree.astype(jnp.int32)])
    return cols, vals, rownnz_clamped, info


def galerkin_ell(a: ELL, labels: jnp.ndarray, nc_true: int,
                 kc: int | None = None, row_pad: int = 8) -> ELL:
    """Host driver: build the coarse ELL, growing ``kc`` if the bound was
    exceeded.  ``nc_true`` is the host-known number of aggregates."""
    nc_pad = max(((nc_true + row_pad - 1) // row_pad) * row_pad, row_pad)
    if kc is None:
        kc = min(2 * a.k, nc_true) if nc_true > 1 else 1
    while True:
        cols, vals, rownnz, info = jax.jit(
            galerkin_ell_arrays, static_argnums=(2, 3))(a, labels, nc_pad, kc)
        max_deg = int(info[1])
        if max_deg <= kc:
            break
        kc = max_deg
    return ELL(cols=cols, vals=vals, rownnz=rownnz.astype(jnp.int32),
               nrows=nc_true, ncols=nc_true)
