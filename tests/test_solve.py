"""Solve layer: smoothers, Krylov methods, hierarchy cycles, and the
minimum end-to-end slice — two-level preconditioned BiCGStab on the
reference's shipped poisson10000 prolongation (BASELINE.json config 1)."""
import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

import conftest
from conftest import reference_matrix_path
from multigridsolver_tpu.io import read_mtx
from multigridsolver_tpu.sparse.formats import CSR
from multigridsolver_tpu.sparse import ops
from multigridsolver_tpu.solve import (bicgstab, cg, fcg, make_smoother,
                                       solve_hierarchy, two_level_from_p)
from multigridsolver_tpu.solve.api import pad_vector


def spd_problem(n=10):
    a = conftest.poisson2d_csr(n)
    rs = np.random.RandomState(42)
    b = rs.rand(a.shape[0])
    return a, b


class TestSmoothers:
    @pytest.mark.parametrize("kind", ["jacobi", "l1jacobi", "chebyshev",
                                      "gs2"])
    def test_reduces_error(self, kind):
        a, b = spd_problem(8)
        ell = a.to_ell(dtype=jnp.float64)
        sm = make_smoother(ell, kind=kind)
        bp = pad_vector(b, ell.npad, jnp.float64)
        x = jnp.zeros_like(bp)
        r0 = float(jnp.linalg.norm(bp - ops.spmv(ell, x)))
        for _ in range(8):
            x = sm.apply(ell, bp, x)
        r = float(jnp.linalg.norm(bp - ops.spmv(ell, x)))
        # l1-Jacobi's safeguarded diagonal (a_ii + Σ|offdiag|) is by design
        # conservative — guaranteed convergent but slower per sweep
        bound = 0.6 if kind == "l1jacobi" else 0.5
        assert r < bound * r0, f"{kind}: {r} vs {r0}"

    def test_gs2_matches_exact_gs_with_many_inner(self):
        """With enough inner Jacobi sweeps the two-stage GS equals exact
        symmetric Gauss-Seidel."""
        a, b = spd_problem(5)
        ell = a.to_ell(dtype=jnp.float64)
        n = a.shape[0]
        sm = make_smoother(ell, kind="gs2", sweeps=1, inner_sweeps=60)
        bp = pad_vector(b, ell.npad, jnp.float64)
        x = np.asarray(sm.apply(ell, bp, jnp.zeros_like(bp)))[:n]
        ad = a.to_dense()
        dl = np.tril(ad)          # D + L
        du = np.triu(ad)          # D + U
        xf = np.linalg.solve(dl, b)
        xe = xf + np.linalg.solve(du, b - ad @ xf)
        np.testing.assert_allclose(x, xe, rtol=1e-8, atol=1e-10)


class TestKrylov:
    def test_cg_unpreconditioned(self):
        a, b = spd_problem(8)
        ell = a.to_ell(dtype=jnp.float64)
        bp = pad_vector(b, ell.npad, jnp.float64)
        res = cg(lambda v: ops.spmv(ell, v), bp, tol=1e-10, maxiter=2000)
        assert int(res.status) == 0
        x = np.asarray(res.x)[: a.shape[0]]
        ref = np.linalg.solve(a.to_dense(), b)
        np.testing.assert_allclose(x, ref, rtol=1e-7, atol=1e-8)

    def test_bicgstab_nonsymmetric(self):
        rs = np.random.RandomState(3)
        n = 60
        m = sp.random(n, n, density=0.1, random_state=rs, format="csr")
        a = CSR.from_scipy((m + 8.0 * sp.identity(n)).tocsr())
        b = rs.rand(n)
        ell = a.to_ell(dtype=jnp.float64)
        bp = pad_vector(b, ell.npad, jnp.float64)
        res = bicgstab(lambda v: ops.spmv(ell, v), bp, tol=1e-10,
                       maxiter=500)
        assert int(res.status) == 0
        x = np.asarray(res.x)[:n]
        np.testing.assert_allclose(a.to_scipy() @ x, b, rtol=0, atol=1e-8)

    def test_bicgstab_zero_rhs(self):
        a, _ = spd_problem(4)
        ell = a.to_ell(dtype=jnp.float64)
        bp = jnp.zeros((ell.npad,), jnp.float64)
        res = bicgstab(lambda v: ops.spmv(ell, v), bp, tol=1e-8)
        assert int(res.status) == 0
        assert int(res.iterations) == 0

    def test_fcg(self):
        a, b = spd_problem(8)
        ell = a.to_ell(dtype=jnp.float64)
        bp = pad_vector(b, ell.npad, jnp.float64)
        res = fcg(lambda v: ops.spmv(ell, v), bp, tol=1e-9, maxiter=2000)
        assert int(res.status) == 0
        ref = np.linalg.solve(a.to_dense(), b)
        np.testing.assert_allclose(np.asarray(res.x)[: a.shape[0]], ref,
                                   rtol=1e-6, atol=1e-7)


class TestTwoLevel:
    def test_poisson_two_level_accelerates(self):
        """Two-level preconditioner must cut iterations vs plain CG."""
        a, b = spd_problem(16)
        n = a.shape[0]
        labels = (np.arange(n) // 4).astype(np.int32)   # 4-node aggregates
        from multigridsolver_tpu.setup.prolongation import p_csr_from_labels
        p = p_csr_from_labels(labels, n // 4)
        hier = two_level_from_p(a, p, smoother_kind="gs2",
                                dtype=jnp.float64)
        res = solve_hierarchy(hier, b, method="cg", tol=1e-8)
        assert int(res.status) == 0
        plain = cg(lambda v: ops.spmv(hier.levels[0].a, v),
                   pad_vector(b, hier.levels[0].a.npad, jnp.float64),
                   tol=1e-8, maxiter=2000)
        assert int(res.iterations) < int(plain.iterations) / 2

    def test_solution_correct(self):
        a, b = spd_problem(12)
        n = a.shape[0]
        labels = (np.arange(n) // 2).astype(np.int32)
        from multigridsolver_tpu.setup.prolongation import p_csr_from_labels
        p = p_csr_from_labels(labels, n // 2)
        hier = two_level_from_p(a, p, smoother_kind="chebyshev",
                                dtype=jnp.float64)
        res = solve_hierarchy(hier, b, method="cg", tol=1e-10)
        ref = np.linalg.solve(a.to_dense(), b)
        np.testing.assert_allclose(np.asarray(res.x), ref, rtol=1e-6,
                                   atol=1e-8)


class TestEndToEndShippedP:
    """BASELINE.json config 1: poisson10000grid + shipped promatrix."""

    @pytest.fixture(scope="class")
    def problem(self):
        a = read_mtx(reference_matrix_path("poisson10000grid.mtx"))
        # NOTE: poisson10000grid.mtx is actually the *gridPlot* output
        # (100x100 coloring), so build the real poisson 100x100-grid matrix
        # (10000 dofs) the way src/common/poisson.cpp does, and pair it with
        # the shipped 10000x610 promatrix.
        a = conftest.poisson2d_csr(100)
        p = read_mtx(reference_matrix_path("poisson10000promatrix.mtx"))
        assert p.shape == (10000, 610)
        return a, p

    def test_solves_with_reference_p(self, problem):
        a, p = problem
        rs = np.random.RandomState(0)
        b = rs.rand(a.shape[0])
        hier = two_level_from_p(a, p, smoother_kind="gs2",
                                dtype=jnp.float64)
        res = solve_hierarchy(hier, b, method="bicgstab", tol=1e-6)
        assert int(res.status) == 0
        # reference logs ~5-12 BiCGStab iterations on poisson100 problems
        # (results.txt:59-81); our smoother differs from ILUT so allow
        # headroom but require genuinely multigrid-fast convergence
        assert int(res.iterations) <= 20
        x = np.asarray(res.x)
        r = b - a.to_scipy() @ x
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


class TestAdviceFixes:
    def test_l1jacobi_diag_ell_matches_hybrid(self):
        """l1-Jacobi diagonal must be a_ii + sum|offdiag| on BOTH the ELL
        and hybrid paths (round-1 bug: ELL path double-subtracted a_ii)."""
        from multigridsolver_tpu.solve.smoothers import jacobi_diag
        from multigridsolver_tpu.sparse import hybrid
        n = 6
        a = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
        ell = CSR.from_scipy(a).to_ell(dtype=jnp.float64)
        d_ell = np.asarray(jacobi_diag(ell, l1=True))[:n]
        np.testing.assert_allclose(d_ell, [3, 4, 4, 4, 4, 3])
        hyb = hybrid.hybrid_from_ell(ell)
        d_hyb = np.asarray(jacobi_diag(hyb, l1=True))[:n]
        np.testing.assert_allclose(d_hyb, d_ell)

    def test_additive_combination(self):
        """main.cpp:74 additive combo: M(v) = coarse_correct(v) + S(v);
        must converge (more iters than multiplicative is expected)."""
        a, b = spd_problem(10)
        p = read_mtx(reference_matrix_path("poisson10000promatrix.mtx"))
        # build a small P for the 100-node problem by 2x1 pairing instead
        labels = (np.arange(100) // 2).astype(np.int32)
        from multigridsolver_tpu.setup.prolongation import p_csr_from_labels
        p = p_csr_from_labels(labels, 50)
        hier_m = two_level_from_p(a, p, smoother_kind="gs2",
                                  dtype=jnp.float64)
        hier_a = two_level_from_p(a, p, smoother_kind="gs2",
                                  dtype=jnp.float64, combination="additive")
        rm = solve_hierarchy(hier_m, b, tol=1e-8, maxiter=500)
        ra = solve_hierarchy(hier_a, b, tol=1e-8, maxiter=500)
        assert int(rm.status) == 0 and int(ra.status) == 0
        # both solve the system
        np.testing.assert_allclose(a.to_scipy() @ np.asarray(ra.x), b,
                                   atol=1e-6)
        # and the combination mode actually changes the operator
        assert int(ra.iterations) != int(rm.iterations) or not np.allclose(
            np.asarray(ra.x), np.asarray(rm.x))


class TestILU0:
    @staticmethod
    def _ikj_ilu0(ad):
        """Sequential IKJ ILU(0) reference (Saad, Alg. 10.4): in-place on
        the dense copy, updates restricted to the sparsity pattern."""
        n = ad.shape[0]
        pat = ad != 0.0
        f = ad.copy()
        for i in range(1, n):
            for k in range(i):
                if not pat[i, k]:
                    continue
                f[i, k] /= f[k, k]
                for j in range(k + 1, n):
                    if pat[i, j]:
                        f[i, j] -= f[i, k] * f[k, j]
        return f

    def test_factor_matches_sequential_ilu0(self):
        """The Chow–Patel fixed point IS the exact ILU(0): after enough
        sweeps the factors agree entrywise with the IKJ recurrence."""
        from multigridsolver_tpu.solve.smoothers import ilu0_factor
        a, _ = spd_problem(7)
        ell = a.to_ell(dtype=jnp.float64)
        n = a.shape[0]
        lv, uv, ud = ilu0_factor(ell, sweeps=40)
        f = self._ikj_ilu0(a.to_dense())
        got = np.zeros((n, n))
        cols = np.asarray(ell.cols)[:, :n]
        ri = np.arange(n)
        for s in range(ell.k):
            valid = s < np.asarray(ell.rownnz)[:n]
            j = cols[s]
            low = valid & (j < ri)
            up = valid & (j > ri)
            got[ri[low], j[low]] = np.asarray(lv)[s, :n][low]
            got[ri[up], j[up]] = np.asarray(uv)[s, :n][up]
        got[ri, ri] = np.asarray(ud)[:n]
        np.testing.assert_allclose(got, np.where(a.to_dense() != 0, f, 0.0),
                                   rtol=1e-10, atol=1e-12)

    def test_ilu0_smoother_reduces_error(self):
        a, b = spd_problem(8)
        ell = a.to_ell(dtype=jnp.float64)
        sm = make_smoother(ell, kind="ilu0", sweeps=1, inner_sweeps=6)
        bp = pad_vector(b, ell.npad, jnp.float64)
        x = jnp.zeros_like(bp)
        r0 = float(jnp.linalg.norm(bp - ops.spmv(ell, x)))
        for _ in range(8):
            x = sm.apply(ell, bp, x)
        r = float(jnp.linalg.norm(bp - ops.spmv(ell, x)))
        # ~0.54 contraction per application on 2D Poisson — comfortably
        # stronger than the 0.5-per-8-applications bound the diagonal
        # smoothers meet above
        assert r < 0.05 * r0

    def test_ilu0_two_level_iteration_quality(self):
        """End-to-end: ilu0 standing in for the reference's ILUT half of
        the two-level preconditioner (main.cpp:53-54) must converge and
        beat the plain-Jacobi smoother's iteration count."""
        from multigridsolver_tpu.setup.aggregation import build_amg_setup
        from multigridsolver_tpu.solve.hierarchy import build_hierarchy
        from multigridsolver_tpu.utils.config import HierarchyConfig
        a, b = spd_problem(24)
        ell = a.to_ell(dtype=jnp.float64)
        cfg = HierarchyConfig(max_coarse_size=64)
        s = build_amg_setup(ell, cfg)
        iters = {}
        for kind in ("ilu0", "jacobi"):
            h = build_hierarchy(s.matrices[0], s.level_labels,
                                s.matrices[1:], smoother_kind=kind,
                                cycle="vcycle", use_hybrid=False,
                                inner_sweeps=4)
            res = solve_hierarchy(h, b, tol=1e-8)
            assert res.status == 0
            iters[kind] = int(res.iterations)
        assert iters["ilu0"] <= iters["jacobi"]
