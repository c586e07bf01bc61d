"""Smoothed-aggregation prolongation — an optional quality lever.

The reference implements strictly *unsmoothed* (piecewise-constant)
aggregation: P has one unit entry per row (``AGMG.cpp:181-186``), which
is why its two-level method needs a strong ILUT smoother.  Classic
smoothed aggregation (Vaněk/Mandel/Brezina) damps the tentative P with
one weighted-Jacobi step,

    P_s = (I − ω D⁻¹ A) · P₀ ,     ω ≈ 2/3 (damped Jacobi)

which widens P's rows (≤ 1 + K per row) but markedly improves the
coarse-space approximation for smooth error.  Requires the general
SpGEMM (sparse/spgemm.py) for both P_s itself and the Galerkin triple
product with non-unit P — the two capabilities the reference delegates
to Eigen/cuSPARSE (``MatrixOperations.cu:643-746``).

AGMG's node exclusions carry over: rows of excluded (G0) nodes stay
empty in P_s so those nodes receive no coarse correction, matching the
unsmoothed scheme's semantics.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import ELL, with_device_plan
from ..sparse.spgemm import spgemm_ell, transpose_ell
from ..sparse import ops


def tentative_p(labels: jnp.ndarray, nrows: int, nc: int) -> ELL:
    """P₀ as a K = 1 ELL over the fine rows (unit entries, empty rows for
    excluded nodes)."""
    npad = labels.shape[0]
    valid = labels >= 0
    p0 = ELL(cols=jnp.where(valid, labels, 0).astype(jnp.int32)[None, :],
             vals=valid.astype(jnp.float32)[None, :],
             rownnz=valid.astype(jnp.int32),
             nrows=nrows, ncols=nc)
    return with_device_plan(p0)


def smoothed_prolongation(a: ELL, labels: jnp.ndarray, nc: int,
                          omega: float = 2.0 / 3.0) -> ELL:
    """P_s = (I − ω D⁻¹ A) P₀ as an ELL (n × nc)."""
    d = ops.extract_diag(a)
    d_safe = jnp.where(d == 0.0, 1.0, d)
    # M = I − ω D⁻¹ A shares A's pattern (A stores its diagonal)
    scale = (-omega / d_safe)[None, :]
    isdiag = (a.cols == a.row_iota()) & a.slot_mask()
    mvals = a.vals * scale + jnp.where(isdiag, 1.0, 0.0)
    m = dataclasses.replace(a, vals=mvals.astype(a.vals.dtype))
    p0 = tentative_p(labels, a.nrows, nc)
    if p0.vals.dtype != a.vals.dtype:
        p0 = p0.astype(a.vals.dtype)
    ps = spgemm_ell(m, p0)
    # excluded rows: no coarse correction (AGMG G0 semantics)
    valid = (labels >= 0)[None, :]
    ps = dataclasses.replace(
        ps, vals=jnp.where(valid, ps.vals, 0.0),
        cols=jnp.where(valid, ps.cols, 0),
        rownnz=jnp.where(valid[0], ps.rownnz, 0))
    return ps


def galerkin_general(a: ELL, p: ELL) -> tuple[ELL, ELL]:
    """(Ac, Pᵀ) with Ac = Pᵀ A P via two SpGEMMs (the reference's
    ``AGMG.cpp:307-308`` Eigen product, TPU-native)."""
    pt = transpose_ell(p)
    ap = spgemm_ell(a, p)
    ac = spgemm_ell(pt, ap)
    return ac, pt
