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
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_square(self, seed):
        a_sp = rand_sparse(200, 200, 0.03, seed)
        b_sp = rand_sparse(200, 200, 0.03, seed + 10)
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
        a_sp = rand_sparse(60, 60, 0.15, 7)
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
