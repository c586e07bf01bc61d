"""Galerkin coarse-operator construction vs scipy P^T A P."""
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from multigridsolver_tpu.sparse.formats import CSR
from multigridsolver_tpu.setup.galerkin import galerkin_dense, galerkin_ell
from multigridsolver_tpu.setup.prolongation import (labels_from_p_csr,
                                                    p_csr_from_labels,
                                                    prolong, restrict,
                                                    compose_labels)


def random_problem(n=40, seed=1, excluded=3):
    rs = np.random.RandomState(seed)
    a = sp.random(n, n, density=0.15, random_state=rs, format="csr")
    a = a + a.T + 4.0 * sp.identity(n)
    a = a.tocsr(); a.sort_indices()
    labels = rs.randint(0, n // 3, size=n).astype(np.int32)
    labels[rs.choice(n, excluded, replace=False)] = -1
    # compact label ids
    used = np.unique(labels[labels >= 0])
    remap = -np.ones(labels.max() + 1, dtype=np.int32)
    remap[used] = np.arange(len(used))
    labels = np.where(labels >= 0, remap[np.maximum(labels, 0)], -1)
    nc = len(used)
    return CSR.from_scipy(a), labels.astype(np.int32), nc


def scipy_rap(a: CSR, labels, nc):
    p = p_csr_from_labels(labels, nc).to_scipy()
    return (p.T @ a.to_scipy() @ p).toarray()


class TestGalerkin:
    def test_dense_matches_scipy(self):
        a, labels, nc = random_problem()
        ell = a.to_ell(dtype=jnp.float64)
        lab = np.full(ell.npad, -1, np.int32)
        lab[: len(labels)] = labels
        nc_pad = nc + 5
        ac = np.asarray(galerkin_dense(ell, jnp.asarray(lab), nc_pad))
        expect = scipy_rap(a, labels, nc)
        np.testing.assert_allclose(ac[:nc, :nc], expect, rtol=1e-12,
                                   atol=1e-12)
        np.testing.assert_allclose(ac[nc:, :], 0.0)

    def test_ell_matches_scipy(self):
        for seed in (1, 2, 5):
            a, labels, nc = random_problem(seed=seed)
            ell = a.to_ell(dtype=jnp.float64)
            lab = np.full(ell.npad, -1, np.int32)
            lab[: len(labels)] = labels
            ac = galerkin_ell(ell, jnp.asarray(lab), nc)
            expect = scipy_rap(a, labels, nc)
            got = ac.to_csr().to_dense()
            np.testing.assert_allclose(got, expect, rtol=1e-11, atol=1e-12)

    def test_ell_poisson_aggregates(self):
        """Structured case: 2D Poisson with 2x1 pairwise aggregates."""
        import conftest
        a = conftest.poisson2d_csr(8)
        n = a.shape[0]
        labels = (np.arange(n) // 2).astype(np.int32)
        nc = n // 2
        ell = a.to_ell(dtype=jnp.float64)
        lab = np.full(ell.npad, -1, np.int32)
        lab[:n] = labels
        ac = galerkin_ell(ell, jnp.asarray(lab), nc)
        expect = scipy_rap(a, labels, nc)
        np.testing.assert_allclose(ac.to_csr().to_dense(), expect,
                                   rtol=1e-12, atol=1e-12)


class TestProlongation:
    def test_roundtrip_p_labels(self):
        _, labels, nc = random_problem()
        p = p_csr_from_labels(labels, nc)
        lab2, nc2 = labels_from_p_csr(p)
        assert nc2 == nc
        np.testing.assert_array_equal(lab2, labels)

    def test_prolong_restrict_adjoint(self):
        _, labels, nc = random_problem(seed=9)
        n = len(labels)
        lab = jnp.asarray(labels)
        rs = np.random.RandomState(0)
        xc = jnp.asarray(rs.randn(nc + 3))
        v = jnp.asarray(rs.randn(n))
        # <P xc, v> == <xc, P^T v>
        lhs = float(jnp.vdot(prolong(lab, xc), v))
        rhs = float(jnp.vdot(xc, restrict(lab, v, nc + 3)))
        assert abs(lhs - rhs) < 1e-12

    def test_compose_labels(self):
        l1 = jnp.asarray(np.array([0, 0, 1, 2, -1, 2], np.int32))
        l2 = jnp.asarray(np.array([1, 0, 0], np.int32))
        out = np.asarray(compose_labels(l1, l2))
        np.testing.assert_array_equal(out, [1, 1, 0, 0, -1, 0])

    def test_shipped_promatrix_is_piecewise_constant(self):
        from multigridsolver_tpu.io import read_mtx
        from conftest import reference_matrix_path
        p = read_mtx(reference_matrix_path("poisson10000promatrix.mtx"))
        labels, nc = labels_from_p_csr(p)
        assert nc == 610
        assert labels.shape[0] == 10000
        # the shipped file was generated with npass=4: aggregates ≤ 2^4
        sizes = np.bincount(labels[labels >= 0])
        assert sizes.max() <= 16


class TestGalerkinPair:
    def test_padding_rows_empty(self):
        """Coarse slots in [nc_true, nc_pad) must produce EMPTY rows — a
        round-1 bug scattered fine row 0 into every padding aggregate."""
        from multigridsolver_tpu.setup.galerkin import (galerkin_pair_arrays,
                                                        galerkin_pair_ell)
        import jax
        # 12-node path graph, pair (0,1)(2,3)... -> 6 aggregates
        n = 12
        a = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()
        csr = CSR.from_scipy(a)
        ell = csr.to_ell(dtype=jnp.float64)   # npad = 16
        labels = np.repeat(np.arange(6), 2).astype(np.int32)
        lab = np.full(ell.npad, -1, np.int32); lab[:n] = labels
        paired = np.full(ell.npad, -1, np.int32)
        paired[:n] = np.arange(n) ^ 1         # partner = neighbor in pair
        nc_pad = 8                            # 2 padding aggregates
        cols, vals, rownnz, info, _ = jax.jit(
            galerkin_pair_arrays, static_argnums=(3,))(
            ell, jnp.asarray(paired), jnp.asarray(lab), nc_pad)
        rownnz = np.asarray(rownnz)
        assert rownnz[6:].sum() == 0, rownnz
        assert np.asarray(vals)[:, 6:].sum() == 0.0
        assert int(info[0]) == 16             # true coarse nnz (tridiag 6)
        # full driver path agrees with scipy RAP
        ac, nnz_c = galerkin_pair_ell(ell, jnp.asarray(paired),
                                      jnp.asarray(lab), 6)
        expect = scipy_rap(csr, labels, 6)
        np.testing.assert_allclose(ac.to_csr().to_dense(), expect,
                                   rtol=1e-12, atol=1e-12)


def test_transpose_ell_device_matches_scipy():
    """Device-resident transpose (claim rounds): exact CSR-canonical
    transpose for square, tall and wide operands, zeros preserved."""
    from multigridsolver_tpu.sparse.spgemm import transpose_ell
    from multigridsolver_tpu.sparse.formats import CSR
    rs = np.random.RandomState(11)
    for shape in ((40, 40), (64, 17), (17, 64)):
        m = sp.random(*shape, density=0.15, random_state=rs,
                      format="csr")
        m.data[::7] = 0.0            # explicit stored zeros stay pattern
        a = CSR.from_scipy(m).to_ell(dtype=jnp.float64)
        t = transpose_ell(a)
        assert (t.nrows, t.ncols) == (shape[1], shape[0])
        got = t.to_csr().to_scipy()
        want = sp.csr_matrix(m.T)
        # same pattern (incl. explicit zeros) and values
        np.testing.assert_array_equal(got.indptr, want.indptr)
        np.testing.assert_array_equal(got.indices, want.indices)
        np.testing.assert_allclose(got.data, want.data)
