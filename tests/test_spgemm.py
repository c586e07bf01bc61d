"""General SpGEMM (sparse/spgemm.py) vs scipy ground truth."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import conftest
from multigridsolver_tpu.sparse.formats import CSR
from multigridsolver_tpu.sparse.spgemm import spgemm_ell, transpose_ell


def rand_sparse(n, m, density, seed, fmt="csr"):
    rs = np.random.RandomState(seed)
    return sp.random(n, m, density=density, random_state=rs, format=fmt,
                     data_rvs=rs.randn)


class TestSpGEMM:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_square(self, seed):
        # modest sizes: XLA:CPU has been seen to segfault compiling very
        # wide merge programs under suite-long memory pressure
        a_sp = rand_sparse(120, 120, 0.025, seed)
        b_sp = rand_sparse(120, 120, 0.025, seed + 10)
        a = CSR.from_scipy(a_sp).to_ell(row_pad=8, dtype=jnp.float64)
        b = CSR.from_scipy(b_sp).to_ell(row_pad=8, dtype=jnp.float64)
        c = spgemm_ell(a, b)
        ref = (a_sp @ b_sp).toarray()
        got = c.to_csr().to_dense()[: ref.shape[0], : ref.shape[1]]
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)

    def test_rectangular(self):
        a_sp = rand_sparse(120, 80, 0.05, 3)
        b_sp = rand_sparse(80, 50, 0.05, 4)
        a = CSR.from_scipy(a_sp).to_ell(row_pad=8, dtype=jnp.float64)
        b = CSR.from_scipy(b_sp).to_ell(row_pad=8, dtype=jnp.float64)
        c = spgemm_ell(a, b)
        assert (c.nrows, c.ncols) == (120, 50)
        ref = (a_sp @ b_sp).toarray()
        got = c.to_csr().to_dense()
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)

    def test_stencil_squared(self):
        a_csr = conftest.poisson2d_csr(20)
        a = a_csr.to_ell(row_pad=8, dtype=jnp.float64)
        c = spgemm_ell(a, a)
        ref = (a_csr.to_scipy() @ a_csr.to_scipy()).toarray()
        np.testing.assert_allclose(c.to_csr().to_dense(), ref,
                                   rtol=1e-12, atol=1e-12)

    def test_width_growth_on_overflow(self):
        """A deliberately low initial bound must grow, not truncate."""
        a_sp = rand_sparse(30, 30, 0.12, 7)
        a = CSR.from_scipy(a_sp).to_ell(row_pad=8, dtype=jnp.float64)
        c = spgemm_ell(a, a, kc=2)
        ref = (a_sp @ a_sp).toarray()
        np.testing.assert_allclose(c.to_csr().to_dense(), ref,
                                   rtol=1e-12, atol=1e-12)

    def test_shape_mismatch_raises(self):
        a = CSR.from_scipy(rand_sparse(10, 9, 0.3, 0)).to_ell(row_pad=8)
        b = CSR.from_scipy(rand_sparse(8, 10, 0.3, 1)).to_ell(row_pad=8)
        with pytest.raises(ValueError):
            spgemm_ell(a, b)

    def test_transpose(self):
        a_sp = rand_sparse(50, 70, 0.08, 9)
        a = CSR.from_scipy(a_sp).to_ell(row_pad=8, dtype=jnp.float64)
        t = transpose_ell(a)
        np.testing.assert_allclose(t.to_csr().to_dense(),
                                   a_sp.T.toarray(), rtol=1e-15)


class TestSmoothedAggregation:
    def test_smoothed_p_rows(self):
        """P_s = (I − ωD⁻¹A)P₀: each row must equal the dense product; and
        excluded rows must stay empty."""
        import jax.numpy as jnp
        from multigridsolver_tpu.setup.smoothed import (
            smoothed_prolongation, tentative_p)
        a_csr = conftest.poisson2d_csr(12)
        n = a_csr.nrows
        ell = a_csr.to_ell(row_pad=8, dtype=jnp.float64)
        labels = np.full(ell.npad, -1, np.int32)
        labels[:n] = np.arange(n) // 4
        labels[5] = -1                       # one excluded node
        nc = n // 4
        ps = smoothed_prolongation(ell, jnp.asarray(labels), nc,
                                   omega=2 / 3)
        A = a_csr.to_dense()
        D = np.diag(np.diag(A))
        P0 = np.zeros((n, nc))
        for i in range(n):
            if labels[i] >= 0:
                P0[i, labels[i]] = 1.0
        ref = (np.eye(n) - (2 / 3) * np.linalg.inv(D) @ A) @ P0
        ref[5, :] = 0.0                      # exclusion semantics
        got = ps.to_csr().to_dense()[:n, :nc]
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)

    def test_galerkin_general_matches_dense(self):
        import jax.numpy as jnp
        from multigridsolver_tpu.setup.smoothed import (
            smoothed_prolongation, galerkin_general)
        a_csr = conftest.poisson2d_csr(10)
        n = a_csr.nrows
        ell = a_csr.to_ell(row_pad=8, dtype=jnp.float64)
        labels = np.full(ell.npad, -1, np.int32)
        labels[:n] = np.arange(n) // 4
        nc = n // 4
        ps = smoothed_prolongation(ell, jnp.asarray(labels), nc)
        ac, pt = galerkin_general(ell, ps)
        P = ps.to_csr().to_dense()[:n, :nc]
        ref = P.T @ a_csr.to_dense() @ P
        np.testing.assert_allclose(ac.to_csr().to_dense()[:nc, :nc], ref,
                                   rtol=1e-11, atol=1e-11)

    def test_smoothed_hierarchy_converges_better(self):
        """V-cycle with smoothed P must converge in no more iterations
        than piecewise-constant P on the model problem."""
        import jax.numpy as jnp
        from multigridsolver_tpu.setup.aggregation import build_amg_setup
        from multigridsolver_tpu.solve.hierarchy import build_hierarchy
        from multigridsolver_tpu.solve.api import solve_hierarchy
        from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                      HierarchyConfig)
        a_csr = conftest.poisson2d_csr(24)
        ell = a_csr.to_ell(dtype=jnp.float64)
        b = np.random.RandomState(0).rand(a_csr.nrows)
        iters = {}
        for tag, sp_omega in (("pc", None), ("sa", 2 / 3)):
            cfg = HierarchyConfig(
                max_coarse_size=32,
                aggregation=AggregationConfig(npass=2),
                smooth_p=sp_omega)
            s = build_amg_setup(ell, cfg)
            hier = build_hierarchy(
                s.matrices[0], s.level_labels, s.matrices[1:],
                smoother_kind="chebyshev", cycle="vcycle",
                pre_smooth=1, post_smooth=1,
                p_ops=s.p_ops, pt_ops=s.pt_ops)
            res = solve_hierarchy(hier, b, method="bicgstab", tol=1e-10,
                                  maxiter=100)
            assert float(res.relres) < 1e-9, tag
            iters[tag] = int(res.iterations)
        assert iters["sa"] <= iters["pc"], iters
