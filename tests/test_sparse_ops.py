"""Property tests of the jnp ELL ops against scipy/dense references."""
import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from multigridsolver_tpu.sparse.formats import CSR
from multigridsolver_tpu.sparse import ops


def make(n=50, density=0.12, seed=3, nonsym=True):
    rs = np.random.RandomState(seed)
    a = sp.random(n, n, density=density, random_state=rs, format="csr")
    a = a + 3.0 * sp.identity(n)
    if not nonsym:
        a = (a + a.T) / 2
    a = a.tocsr()
    a.sort_indices()
    csr = CSR.from_scipy(a)
    return csr, csr.to_ell(dtype=jnp.float64), a


class TestSpMV:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_scipy(self, seed):
        csr, ell, a = make(seed=seed)
        x = np.random.RandomState(seed).randn(a.shape[1])
        xpad = np.zeros(ell.npad)
        xpad[: a.shape[1]] = x
        y = np.asarray(ops.spmv(ell, jnp.asarray(xpad)))
        np.testing.assert_allclose(y[: a.shape[0]], a @ x, rtol=1e-12)
        # padded rows produce zeros
        np.testing.assert_allclose(y[a.shape[0]:], 0.0)

    def test_spmv_t(self):
        csr, ell, a = make(seed=5)
        y = np.random.RandomState(5).randn(ell.npad)
        y[a.shape[0]:] = 0
        x = np.asarray(ops.spmv_t(ell, jnp.asarray(y), ell.npad))
        np.testing.assert_allclose(x[: a.shape[1]], a.T @ y[: a.shape[0]],
                                   rtol=1e-12, atol=1e-12)


class TestSums:
    def test_diag(self):
        csr, ell, a = make()
        d = np.asarray(ops.extract_diag(ell))
        np.testing.assert_allclose(d[: a.shape[0]], a.diagonal(), rtol=1e-13)

    def test_row_col_sums(self):
        csr, ell, a = make(seed=7)
        ad = a.toarray()
        n = a.shape[0]
        rs = np.asarray(ops.row_sum(ell))[:n]
        np.testing.assert_allclose(rs, ad.sum(1), rtol=1e-12)
        rs_nd = np.asarray(ops.row_sum(ell, skip_diag=True))[:n]
        np.testing.assert_allclose(rs_nd, ad.sum(1) - np.diag(ad), rtol=1e-12)
        cs = np.asarray(ops.col_sum(ell))[:n]
        np.testing.assert_allclose(cs, ad.sum(0), rtol=1e-12)
        ra = np.asarray(ops.row_sum(ell, absolute=True))[:n]
        np.testing.assert_allclose(ra, np.abs(ad).sum(1), rtol=1e-12)

    def test_symmetrized_offdiag_sums(self):
        """abs sum must equal Σⱼ≠ᵢ |(aij+aji)/2| over the union pattern —
        the quantity in AGMG.cpp:48-82 / Aggregation.cu:17-58."""
        csr, ell, a = make(seed=11, nonsym=True)
        ad = a.toarray()
        n = a.shape[0]
        sym = (ad + ad.T) / 2
        np.fill_diagonal(sym, 0.0)
        expect_abs = np.abs(sym).sum(1)
        expect_plain = sym.sum(1)
        got_abs, got_plain = ops.symmetrized_offdiag_sums(ell)
        np.testing.assert_allclose(np.asarray(got_abs)[:n], expect_abs,
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(got_plain)[:n], expect_plain,
                                   rtol=1e-11, atol=1e-13)


class TestElementAccess:
    def test_get_element_grid(self, small_test_matrix):
        """Same positions the reference exercises in
        test_matrix_operations.cu:119-176 — every (i,j) incl. zeros/empty
        rows."""
        ell = small_test_matrix.to_ell(dtype=jnp.float64)
        dense = small_test_matrix.to_dense()
        n, m = small_test_matrix.shape
        ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
        got = np.asarray(ops.get_element(ell, jnp.asarray(ii.ravel()),
                                         jnp.asarray(jj.ravel())))
        np.testing.assert_allclose(got, dense.ravel())

    def test_transposed_slot_values(self):
        csr, ell, a = make(seed=13)
        ad = a.toarray()
        got = np.asarray(ops.transposed_slot_values(ell))
        cols = np.asarray(ell.cols)
        nnzr = np.asarray(ell.rownnz)
        for i in range(a.shape[0]):
            for s in range(ell.k):
                if s < nnzr[i]:
                    assert got[s, i] == pytest.approx(ad[cols[s, i], i])

    def test_to_dense(self):
        csr, ell, a = make(seed=17)
        np.testing.assert_allclose(np.asarray(ops.to_dense(ell)), a.toarray(),
                                   rtol=1e-13)


class TestRollPlan:
    """Uniform-slot roll fast path (formats._roll_plan + ops.take_neighbor)."""

    def _stencil(self, ng):
        import scipy.sparse as sp
        from multigridsolver_tpu.sparse.formats import CSR
        lap = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(ng, ng),
                       format="csr")
        eye = sp.identity(ng, format="csr")
        return CSR.from_scipy((sp.kron(lap, eye) + sp.kron(eye, lap)
                               ).tocsr())

    def test_detection_on_stencil(self):
        from multigridsolver_tpu.sparse.formats import _roll_plan
        a = self._stencil(120)
        ell = a.to_ell(dtype=jnp.float32)
        cols = np.zeros((ell.k, ell.npad), np.int32)
        cols[:, :] = np.asarray(ell.cols)
        plan = _roll_plan(cols, np.asarray(ell.rownnz))
        assert plan is not None
        offs, ov = plan
        assert offs == (-120, -1, 0, 1, 120)
        # boundary-row mismatches all land on other slots' modes:
        # the delta SET covers everything, no residual patch
        assert ov is None

    def test_detection_rejects_random(self):
        from multigridsolver_tpu.sparse.formats import _roll_plan
        rs = np.random.RandomState(0)
        K, npad = 4, 2048
        cols = rs.randint(0, npad, size=(K, npad)).astype(np.int32)
        rownnz = np.full((npad,), K, np.int32)
        assert _roll_plan(cols, rownnz) is None

    def test_take_neighbor_parity(self):
        import dataclasses
        from multigridsolver_tpu.ops import gather_pallas as gp
        from multigridsolver_tpu.sparse import ops
        old = gp.INTERPRET
        gp.INTERPRET = True
        try:
            a = self._stencil(120)
            ell = a.to_ell(dtype=jnp.float32)
            assert ell.roll_offsets is not None
            x = jnp.asarray(np.random.RandomState(1)
                            .rand(ell.npad).astype(np.float32))
            out = ops.take_neighbor(ell, x)
            ref = jnp.take(x, ell.cols, axis=0)
            valid = (np.arange(ell.k)[:, None]
                     < np.asarray(ell.rownnz)[None, :])
            np.testing.assert_allclose(np.asarray(out)[valid],
                                       np.asarray(ref)[valid])
            # bool field takes the int32 route and returns bool
            xb = x > 0.5
            ob = ops.take_neighbor(ell, xb)
            refb = jnp.take(xb, ell.cols, axis=0)
            assert (np.asarray(ob)[valid] == np.asarray(refb)[valid]).all()
        finally:
            gp.INTERPRET = old

    def test_multidelta_parity_on_shifted_packing(self):
        """csky3d-style patterns pack the same stencil offsets at
        SHIFTED slot positions on boundary rows (3 % of entries off
        their own slot's mode, zero off the delta set): the multi-delta
        select must reproduce the plain gather on every valid slot."""
        from multigridsolver_tpu.cli.generators import csky3d
        from multigridsolver_tpu.ops import gather_pallas as gp
        from multigridsolver_tpu.sparse import ops
        from multigridsolver_tpu.sparse.formats import _roll_plan
        old = gp.INTERPRET
        gp.INTERPRET = True
        try:
            ell = csky3d(16).to_ell(dtype=jnp.float32,
                                    with_transpose=True)
            assert ell.roll_offsets is not None
            assert ell.roll_ov is None       # delta set covers all
            assert len(set(ell.roll_offsets)) == 7
            rn = np.asarray(ell.rownnz)
            # shifted-packing rows must exist (slot 0 ≠ its mode)
            delta0 = np.asarray(ell.cols)[0] - np.arange(ell.npad)
            assert ((delta0 != ell.roll_offsets[0])
                    & (rn > 0)).any()
            rs = np.random.RandomState(1)
            x = jnp.asarray(rs.rand(ell.npad).astype(np.float32))
            out = ops.take_neighbor(ell, x)
            ref = jnp.take(x, ell.cols, axis=0)
            valid = (np.arange(ell.k)[:, None] < rn[None, :])
            np.testing.assert_allclose(np.asarray(out)[valid],
                                       np.asarray(ref)[valid])
            xi = jnp.asarray(rs.randint(0, 99, ell.npad)
                             .astype(np.int32))
            oi = ops.take_neighbor(ell, xi)
            ri = jnp.take(xi, ell.cols, axis=0)
            assert (np.asarray(oi)[valid] == np.asarray(ri)[valid]).all()
        finally:
            gp.INTERPRET = old

    def test_residual_scatter_patch(self):
        """Entries whose delta matches NO slot mode fall to the scatter
        patch; more than scatter_cap of them rejects the plan."""
        from multigridsolver_tpu.sparse.formats import _roll_plan
        a = self._stencil(120)
        ell = a.to_ell(dtype=jnp.float32)
        cols = np.asarray(ell.cols).copy()
        rn = np.asarray(ell.rownnz)
        rs = np.random.RandomState(2)
        rows = rs.choice(np.nonzero(rn >= 3)[0], size=300,
                         replace=False)
        cols[1, rows] = np.clip(rows + 7, 0, ell.ncols - 1)   # delta 7
        plan = _roll_plan(cols, rn)
        assert plan is not None and plan[1] is not None
        ov_s, ov_r, ov_c = plan[1]
        assert set(np.asarray(ov_r)[:300]) == set(rows)
        # beyond the cap: rejected
        assert _roll_plan(cols, rn, scatter_cap=100) is None
