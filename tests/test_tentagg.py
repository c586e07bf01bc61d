"""checktentagg (setup/tentagg.py) vs a direct transcription of the
Fortran ground truth (dagtwolev_mex.f90:1052-1401) in numpy."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from multigridsolver_tpu.sparse.formats import CSR
from multigridsolver_tpu.setup import tentagg
from multigridsolver_tpu.setup.strength import compute_strength
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)


def ref_checktentagg(A, si, set_, ktg, zerors):
    """Direct numpy transcription of dag2l_checktentagg_GF."""
    set_ = sorted(set_)
    d = len(set_)
    W = np.zeros((d, d))
    for p, i in enumerate(set_):
        for q, j in enumerate(set_):
            if p != q:
                W[p, q] = (A[i, j] + A[j, i]) / 2.0
    sig = np.array([si[i] for i in set_], dtype=float)
    if zerors:
        for p in range(d):
            W[p, p] = sig[p]
        AGe = np.zeros(d)
    else:
        for p, i in enumerate(set_):
            W[p, p] = A[i, i]
        AGe = np.diag(W).copy() - sig
    sig = sig + (W.sum(axis=1) - np.diag(W))
    AGe = np.where(sig < 0.0, AGe + 2.0 * sig, AGe)
    v = np.diag(W).copy()
    for p in range(d):
        W[p, p] = (1.0 - 2.0 / ktg) * W[p, p] - abs(sig[p])
    beta = v.sum()
    coef = (2.0 / ktg) / beta
    W = W + coef * np.outer(v, v)
    alp = np.abs(AGe).max()
    d1 = d - 1 if alp < 1e-10 * abs(coef) else d
    if d1 == 0:
        return True
    try:
        L = np.linalg.cholesky(W[:d1, :d1])
        return bool(np.all(np.diag(L) > 0.0))
    except np.linalg.LinAlgError:
        return False


def build_case(n=64, seed=0, indefinite=False):
    rs = np.random.RandomState(seed)
    A = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).toarray()
    if indefinite:
        # sprinkle positive off-diagonals to create rejectable merges
        for _ in range(n // 4):
            i = rs.randint(0, n - 1)
            A[i, i + 1] = A[i + 1, i] = +1.5
    return A


def run_both(A, ktg=8.0, seed=1):
    n = A.shape[0]
    rs = np.random.RandomState(seed)
    csr = CSR.from_scipy(sp.csr_matrix(A))
    ell = csr.to_ell(row_pad=8, dtype=jnp.float64)
    # pass-1 labels: consecutive pairs (aggregate size 2)
    labels = (np.arange(n) // 2).astype(np.int32)
    nc = n // 2
    lab_dev = jnp.full((ell.npad,), -1, jnp.int32).at[:n].set(
        jnp.asarray(labels))
    # tentative pass-2 pairing on the coarse nodes: (0,1)(2,3)...
    ncp = ((nc + 7) // 8) * 8
    paired = np.full(ncp, -1, np.int32)
    paired[:nc] = np.arange(nc) ^ 1
    if nc % 2:
        paired[nc - 1] = nc - 1
    # si of the original matrix (symmetric: si = -rowsum_offdiag)
    si = -(A.sum(axis=1) - np.diag(A))
    si_dev = jnp.zeros((ell.npad,), jnp.float64).at[:n].set(jnp.asarray(si))
    # coarse operator (only its shape/plan matter for the gathers here)
    Ac = np.zeros((nc, nc))
    for i in range(n):
        for j in range(n):
            if A[i, j] != 0:
                Ac[labels[i], labels[j]] += A[i, j]
    ac = CSR.from_scipy(sp.csr_matrix(Ac)).to_ell(row_pad=8,
                                                  dtype=jnp.float64)
    acc = np.asarray(tentagg.checktentagg(
        ell, si_dev, lab_dev, ac, jnp.asarray(paired), float(ktg),
        jnp.asarray(False), km=2))
    # reference, per tentative pair
    ref = np.ones(ncp, bool)
    for c in range(0, nc - 1, 2):
        members = [i for i in range(n) if labels[i] in (c, c + 1)]
        ok = ref_checktentagg(A, si, members, ktg, False)
        ref[c] = ref[c + 1] = ok
    return acc[:nc], ref[:nc]


class TestCheckTentagg:
    def test_laplacian_all_accepted(self):
        A = build_case(64)
        acc, ref = run_both(A)
        assert ref.all()          # plain Laplacian merges are fine
        np.testing.assert_array_equal(acc, ref)

    def test_indefinite_rejections_match_fortran(self):
        A = build_case(64, indefinite=True)
        acc, ref = run_both(A, ktg=4.0)
        assert not ref.all()      # the case must actually reject some
        np.testing.assert_array_equal(acc, ref)

    def test_flag_changes_pairing_and_solver_converges(self):
        """End-to-end: check_tentagg=True on a constructed indefinite
        problem must (a) run, (b) produce a valid hierarchy, (c) change
        or preserve pairing without breaking the solve."""
        from multigridsolver_tpu.setup.aggregation import build_amg_setup
        from multigridsolver_tpu.solve.hierarchy import build_hierarchy
        from multigridsolver_tpu.solve.api import solve_hierarchy
        A = build_case(256, seed=3, indefinite=True)
        # make it solid enough to solve: add diagonal dominance margin
        A = A + 0.5 * np.eye(A.shape[0])
        ell = CSR.from_scipy(sp.csr_matrix(A)).to_ell(row_pad=8,
                                                      dtype=jnp.float64)
        cfg = HierarchyConfig(
            max_coarse_size=32,
            aggregation=AggregationConfig(ktg=8.0, npass=3, tou=100.0,
                                          check_tentagg=True))
        s = build_amg_setup(ell, cfg)
        assert len(s.matrices) >= 2
        hier = build_hierarchy(s.matrices[0], s.level_labels,
                               s.matrices[1:], smoother_kind="l1jacobi",
                               cycle="vcycle", use_hybrid=False)
        b = np.random.RandomState(0).rand(A.shape[0])
        res = solve_hierarchy(hier, b, method="bicgstab", tol=1e-8,
                              maxiter=300)
        assert float(res.relres) < 1e-6


def test_member_ranks():
    labels = jnp.asarray(np.array([0, 0, 1, -1, 1, 2, 2, 2], np.int32))
    r = np.asarray(tentagg.member_ranks(labels, km=4))
    assert r[0] == 0 and r[1] == 1
    assert r[2] == 0 and r[4] == 1
    assert r[5] == 0 and r[6] == 1 and r[7] == 2
