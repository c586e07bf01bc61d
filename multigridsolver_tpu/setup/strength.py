"""Strength-of-connection quantities for pairwise aggregation.

Implements, as dense (n, K) vectorised ops over the ELL slots, the per-node
quantities the reference computes with per-row CUDA threads / Eigen
iterators:

* ``si_vector`` — sᵢ = −(Σⱼ≠ᵢ aᵢⱼ + Σⱼ≠ᵢ aⱼᵢ)/2, the "Si" vector of the
  Napov–Notay papers (``src/GPU_CUDAC++/Aggregation.cu:68-90``,
  ``src/CPU_C++/AGMG.cpp:84-90``).
* ``g0_mask`` — the strongly-diagonally-dominant exclusion set G0:
  aᵢᵢ ≥ κ/(κ−2) · Σⱼ≠ᵢ|(aᵢⱼ+aⱼᵢ)/2|  (``AGMG.cpp:118-123``,
  ``Aggregation.cu:57-61``; the Fortran generalises the factor to
  checkddJ = max(|checkdd|, κ/(κ−2)), ``dagtwolev_mex.f90:161-162``).
* ``trspos_mask`` — Fortran rule (``dagtwolev_mex.f90:759``): a node whose
  largest positive off-diagonal exceeds trspos·aᵢᵢ is transferred
  unaggregated.
* ``mu_slots`` — the pair quality μ(i,j) for every stored neighbour slot
  (``AGMG.cpp:92-99``, ``Aggregation.cu:96-105``):

      μ(i,j) = [2 / (1/aᵢᵢ + 1/aⱼⱼ)] /
               [ −(aᵢⱼ+aⱼᵢ)/2  +  1 / (1/(aᵢᵢ−sᵢ) + 1/(aⱼⱼ−sⱼ)) ]

  μ is symmetric in (i, j): every subexpression is a commutative
  combination of the same four coefficients, so both endpoints of an edge
  compute bitwise-identical μ — the property the TPU matching relies on.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import ELL
from ..sparse import ops


class StrengthData(NamedTuple):
    diag: jnp.ndarray       # (npad,) aᵢᵢ
    si: jnp.ndarray         # (npad,) sᵢ
    excluded: jnp.ndarray   # (npad,) bool — G0 ∪ trspos ∪ padding
    mu: jnp.ndarray         # (K, npad) μ per stored slot (junk on invalid)
    allowed: jnp.ndarray    # (K, npad) bool — pair candidate mask
    vals_t: jnp.ndarray     # (K, npad) aⱼᵢ per slot
    zerors: jnp.ndarray = np.False_  # scalar: the zerors rule fired


def si_vector(a: ELL) -> jnp.ndarray:
    rs = ops.row_sum(a, skip_diag=True)
    cs = ops.col_sum(a, skip_diag=True)
    return -(rs + cs) / 2.0


def nondiag_mask(a: ELL) -> jnp.ndarray:
    return a.slot_mask() & (a.cols != a.row_iota())


def g0_mask(a: ELL, diag: jnp.ndarray, ktg: float,
            checkdd: float = -0.5, vals_t=None, has_pair=None
            ) -> jnp.ndarray:
    """True for nodes excluded by diagonal dominance.  ``vals_t``/
    ``has_pair``: precomputed transposed values (see
    symmetrized_offdiag_sums — avoid recomputing the costliest pass)."""
    abs_sum, _ = ops.symmetrized_offdiag_sums(a, vals_t, has_pair)
    factor = max(abs(checkdd), ktg / (ktg - 2.0))
    return diag >= factor * abs_sum


def trspos_mask(a: ELL, diag: jnp.ndarray, trspos: float) -> jnp.ndarray:
    """True for nodes with a positive off-diagonal > trspos · aᵢᵢ."""
    off = a.slot_mask() & (a.cols != a.row_iota())
    pos_max = jnp.max(jnp.where(off, a.vals, -jnp.inf), axis=0)
    return pos_max > trspos * diag


def mu_slots(a: ELL, diag: jnp.ndarray, si: jnp.ndarray,
             vals_t: jnp.ndarray, ajj=None, s_j=None) -> jnp.ndarray:
    """μ(i, j) for every stored slot (i → j).  Row-side quantities are
    plain broadcasts (the row index is the minor axis); only the j side
    needs a gather (``ajj``/``s_j`` accept precomputed gathers)."""
    aii = diag[None, :]
    ajj = ops.take_neighbor(a, diag) if ajj is None else ajj
    s_i = si[None, :]
    s_j = ops.take_neighbor(a, si) if s_j is None else s_j
    aij = a.vals
    aji = vals_t
    num = 2.0 / (1.0 / aii + 1.0 / ajj)
    den = (-(aij + aji) / 2.0
           + 1.0 / (1.0 / (aii - s_i) + 1.0 / (ajj - s_j)))
    return num / den


def mu_slots_notay(a: ELL, diag: jnp.ndarray, si: jnp.ndarray,
                   vals_t: jnp.ndarray, zerors) -> tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """The full AGMG 3.0 pair quality with indefinite-case safeguards —
    the δ/η/σ formulation of ``dag2l_findpairs_GI1``
    (``dagtwolev_mex.f90:2603-2655``), vectorised over all slots.

    Returns (valp, ok): ``valp`` is the quality value tested against κ,
    ``ok`` False where the pair is rejected because the local 2x2 block
    A_G fails nonnegative-definiteness.  ``zerors`` (traced bool) selects
    the row-sum-zero treatment of the diagonal (f90:2603-2613).
    """
    eps_mach = jnp.asarray(np.finfo(np.float32).eps
                           if a.vals.dtype == jnp.float32
                           else np.finfo(np.float64).eps, a.vals.dtype)
    aii = diag[None, :]
    ajj = ops.take_neighbor(a, diag)
    s_i = si[None, :]
    s_j = ops.take_neighbor(a, si)
    vals = -(a.vals + vals_t) / 2.0
    rsi = jnp.where(zerors, 0.0, -s_i + aii)
    rsj = jnp.where(zerors, 0.0, -s_j + ajj)
    eta1 = jnp.where(zerors, 2.0 * s_i, 2.0 * aii)
    eta2 = jnp.where(zerors, 2.0 * s_j, 2.0 * ajj)
    sig1 = s_i - vals
    sig2 = s_j - vals
    del1 = jnp.where(sig1 > 0.0, rsi, rsi + 2.0 * sig1)
    del2 = jnp.where(sig2 > 0.0, rsj, rsj + 2.0 * sig2)
    eta_h = (eta1 * eta2) / (eta1 + eta2)      # harmonic η/2 term
    epsr = eps_mach * vals
    del12 = del1 + del2
    small1 = jnp.abs(del1) < epsr
    small2 = jnp.abs(del2) < epsr
    # vals > 0 branch
    valp_small = (eta1 * eta2) / (vals * (eta1 + eta2))
    valp_gen = vals + (del1 * del2) / jnp.where(del12 == 0.0, 1.0, del12)
    pos_ok = jnp.where(
        small1 & small2, True,
        jnp.where(small1, del2 >= -epsr,
                  jnp.where(small2, del1 >= -epsr,
                            (del12 >= -epsr) & (valp_gen >= 0.0))))
    valp_pos = jnp.where(small1 | small2, valp_small,
                         eta_h / jnp.where(valp_gen == 0.0, 1.0, valp_gen))
    # vals <= 0 branch
    neg_ok = (del1 > 0.0) & (del2 > 0.0) & (valp_gen >= 0.0)
    valp_neg = eta_h / jnp.where(valp_gen == 0.0, 1.0, valp_gen)
    ok = jnp.where(vals > 0.0, pos_ok, neg_ok)
    valp = jnp.where(vals > 0.0, valp_pos, valp_neg)
    return valp, ok


def _rel_eps(dtype) -> float:
    """Relative comparison tolerance — the role of the Fortran's repsmach
    guards (e.g. ``dagtwolev_mex.f90:745`` ``(vald+ods) .LT. -repsmach``).

    For conservative problems aᵢᵢ − sᵢ is *analytically zero* on interior
    rows; without a tolerance its floating-point sign is rounding noise
    and flips with compiler fusion choices (observed: XLA jit vs eager
    disagreeing on 80 % of feasibility tests on csky3d(80) in f32,
    collapsing the aggregation).
    """
    return float(100 * np.finfo(np.dtype(dtype)).eps)


def feasible_slots(a: ELL, diag: jnp.ndarray, si: jnp.ndarray,
                   ajj=None, s_j=None) -> jnp.ndarray:
    """aᵢᵢ − sᵢ + aⱼⱼ − sⱼ ≥ 0 per slot (``AGMG.cpp:159``,
    ``Aggregation.cu:157-159``), with a repsmach-style relative guard."""
    if ajj is None:
        ajj = ops.take_neighbor(a, diag)
    if s_j is None:
        s_j = ops.take_neighbor(a, si)
    lhs = diag[None, :] - si[None, :] + ajj - s_j
    tol = _rel_eps(diag.dtype) * (jnp.abs(diag)[None, :] + jnp.abs(ajj))
    return lhs >= -tol


def compute_strength(a: ELL, ktg: float, first_pass: bool,
                     checkdd: float = -0.5, trspos: float = 0.0,
                     fracnegrcsum: float = 0.0,
                     symmetric: bool = False,
                     mu_mode: str = "simple",
                     mu_symmetrize: bool = False) -> StrengthData:
    """All per-pass strength data in one jittable computation.

    ``first_pass=False`` disables the G0/trspos exclusions, matching the
    reference (``Aggregation.cu:60-63`` zeroes ising0 on later passes; the
    CPU further pass has no exclusion logic at all, ``AGMG.cpp:196-280``).

    ``symmetric=True`` (the MATLAB API's `sym`, agtwolev.m) skips the
    transposed-value lookups entirely: aⱼᵢ = aᵢⱼ, column sums = row sums —
    saving the O(K²·n) transpose-matching gathers, the costliest part of
    the pass.
    """
    diag = ops.extract_diag(a)
    # ONE transpose-matching pass per strength evaluation: values and the
    # pair-exists mask come out of the same loop, and every consumer below
    # (g0, union sums, edge mask) receives them — this program measured
    # 175 ms at sky80 level 1, so accidental recomputation (which CSE
    # across fori_loops does not reliably remove) dominates warm setup
    if symmetric:
        vals_t = a.vals
        has_pair = a.slot_mask()
    elif a.vals_t is not None:
        # union-symmetric pattern carrying the aᵀ field (ELL.vals_t):
        # every stored (i,j) has its (j,i) stored too, so the pair always
        # exists and the transposed value is a free field read
        vals_t = a.vals_t
        has_pair = a.slot_mask()
    else:
        vals_t, has_pair = ops.transposed_slot_values(a, with_pairs=True)
    if symmetric:
        si = -ops.row_sum(a, skip_diag=True)
    elif a.vals_t is not None:
        # union fields: the column sum of row i is Σ vals_t over i's own
        # slots (every (j,i) stored ⇒ slot (i,j) exists) — no scatter
        offd = nondiag_mask(a)
        si = -jnp.sum(jnp.where(offd, (a.vals + vals_t) / 2.0, 0.0),
                      axis=0)
    else:
        si = si_vector(a)
    # "real row" = inside the logical extent AND stores at least one entry
    # (always true for real rows — the diagonal is stored; padding rows
    # store none).  The nnz term matters for bound-shaped operators whose
    # static nrows exceeds the true row count (the fused/tail setup paths):
    # the zerors denominator must count true rows only.
    rowmask = a.row_mask() & (a.rownnz > 0)
    zerors = jnp.asarray(False)
    if first_pass:
        if symmetric:
            abs_sum = ops.row_sum(a, absolute=True, skip_diag=True)
            factor = max(abs(checkdd), ktg / (ktg - 2.0))
            excl = diag >= factor * abs_sum
        else:
            excl = g0_mask(a, diag, ktg, checkdd, vals_t, has_pair)
        if fracnegrcsum > 0.0:
            # zerors rule (dagtwolev_mex.f90:763-770): if more than
            # fracnegrcsum·n nodes have negative mean row+col sum
            # (including the diagonal: aᵢᵢ + ods < 0 ⇔ diag − sᵢ < 0), the
            # DD exclusions are cancelled wholesale (ind2(1:n) = -1; the
            # trspos transfers via iperm are NOT cancelled).
            tol = _rel_eps(diag.dtype) * jnp.abs(diag)
            neg = jnp.sum(((diag - si) < -tol) & rowmask)
            zerors = neg > fracnegrcsum * jnp.maximum(jnp.sum(rowmask), 1)
            excl = jnp.where(zerors, jnp.zeros_like(excl), excl)
        if trspos > 0.0:
            excl = excl | trspos_mask(a, diag, trspos)
    else:
        excl = jnp.zeros((a.npad,), dtype=bool)
    excl = excl | ~rowmask | (a.rownnz == 0)
    nondiag = a.slot_mask() & (a.cols != a.row_iota())
    # stored-but-zero entries are not graph edges when the symmetrised
    # coupling vanishes; the reference checks A(i,j) != 0 (AGMG.cpp:155)
    edge = nondiag & ((a.vals != 0.0) | (vals_t != 0.0))
    not_excl = ~excl[None, :] & ~ops.take_neighbor(a, excl)
    if mu_mode == "notay":
        mu, ok = mu_slots_notay(a, diag, si, vals_t, zerors)
        allowed = edge & ok & (mu >= 0.0) & (mu <= ktg) & not_excl
    else:
        ajj = ops.take_neighbor(a, diag)
        s_j = ops.take_neighbor(a, si)
        mu = mu_slots(a, diag, si, vals_t, ajj=ajj, s_j=s_j)
        allowed = (edge
                   & (mu > 0.0) & (mu <= ktg)
                   & not_excl
                   & feasible_slots(a, diag, si, ajj=ajj, s_j=s_j))
    if mu_symmetrize:
        # Belt-and-braces for the handshake matching, which needs
        # μ(i→j) == μ(j→i) bitwise for mutual acceptance: although every
        # op in μ is a commutative combination of the same operands (so
        # slot pairs agree bitwise in practice), compiler reassociation
        # could in principle break this.  Symmetrising through the
        # transposed pattern is exact by construction but costs an extra
        # O(K²·n) pass; disabled by default since the tolerance guards
        # above fixed the observed f32 matching collapse.
        mu_t, has_pair = ops.transpose_slot_field(a, mu)
        mu = jnp.where(has_pair, 0.5 * mu + 0.5 * mu_t, mu)
        allowed = allowed & has_pair
    return StrengthData(diag=diag, si=si, excluded=excl, mu=mu,
                        allowed=allowed, vals_t=vals_t, zerors=zerors)
