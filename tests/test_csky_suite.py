"""The reference's CSky convection-diffusion suite: generators, end-to-end
nonsymmetric solves, and A/B aggregate-quality checks against the shipped
promatrix files — the reference's own acceptance methodology
(src/GPU_CUDAC++/results.txt)."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import reference_matrix_path
from multigridsolver_tpu.io import read_mtx
from multigridsolver_tpu.cli.generators import poisson2d, csky2d, csky3d
from multigridsolver_tpu.setup.aggregation import (pairwise_aggregate,
                                                   build_amg_setup)
from multigridsolver_tpu.setup.prolongation import p_csr_from_labels
from multigridsolver_tpu.solve import two_level_from_p, solve_hierarchy
from multigridsolver_tpu.solve.hierarchy import build_hierarchy
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)


class TestGenerators:
    @pytest.mark.parametrize("name,gen,n,exact", [
        ("CSky2d3", csky2d, 3, True),
        ("CSky2d10", csky2d, 10, True),
        ("CSky2d20", csky2d, 20, True),
        ("CSky3d3", csky3d, 3, True),
        ("CSky3d10", csky3d, 10, True),
        ("CSky2d100", csky2d, 100, True),
    ])
    def test_matches_shipped(self, name, gen, n, exact):
        """Entry-for-entry parity (to the files' print precision) for
        ALL six shipped files.  CSky2d100 and CSky3d10 carry legacy
        quirks of the lost reference generator — the first-tower-edge
        coefficient and the mid-axis-shifted slow faces — which the
        generators reproduce behind auto-enabled flags (see
        cli/generators.py docstrings)."""
        ref = read_mtx(reference_matrix_path(f"{name}.mtx"))
        got = gen(n)
        assert got.shape == ref.shape
        assert got.nnz == ref.nnz
        np.testing.assert_array_equal(got.indptr, ref.indptr)
        np.testing.assert_array_equal(got.indices, ref.indices)
        rel = np.abs(ref.to_dense() - got.to_dense()).max() / \
            np.abs(ref.data).max()
        assert rel < (1e-4 if exact else 0.3), rel

    def test_poisson_family(self):
        a = poisson2d(10)
        d = a.to_dense()
        assert d[55, 55] == 4.0
        assert (d.sum(1)[np.abs(d.sum(1)) < 1e-12].size
                == 64)  # interior rows sum to zero


def solve_with_our_p(a, npass=2, tol=1e-6, smoother="gs2"):
    ell = a.to_ell(dtype=jnp.float64)
    cfg = AggregationConfig(ktg=10.0, npass=npass, tou=8.0)
    res = pairwise_aggregate(ell, cfg)
    p = p_csr_from_labels(np.asarray(res.labels)[: a.nrows], res.nc)
    hier = two_level_from_p(a, p, smoother_kind=smoother, dtype=jnp.float64)
    b = np.random.RandomState(0).rand(a.nrows)
    return solve_hierarchy(hier, b, method="bicgstab", tol=tol), res


class TestNonsymmetricSolve:
    @pytest.mark.parametrize("name", ["CSky2d10", "CSky2d20", "CSky3d10"])
    def test_two_level_with_own_aggregation(self, name):
        a = read_mtx(reference_matrix_path(f"{name}.mtx"))
        res, agg = solve_with_our_p(a)
        assert int(res.status) == 0
        assert int(res.iterations) <= 12   # reference family: ~4-12 iters
        # verify the residual really meets tolerance against scipy
        b = np.random.RandomState(0).rand(a.nrows)
        r = b - a.to_scipy() @ np.asarray(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6

    def test_csky3d30_multilevel(self):
        """CSky3d30 (n=27000) — the largest shipped input; K-cycle
        multilevel, matching the reference's 4-iteration two-level result
        scale (results.txt:101-109)."""
        a = read_mtx(reference_matrix_path("CSky3d30.mtx"))
        ell = a.to_ell(dtype=jnp.float64)
        cfg = HierarchyConfig(max_coarse_size=300,
                              aggregation=AggregationConfig(npass=2))
        setup = build_amg_setup(ell, cfg)
        hier = build_hierarchy(setup.matrices[0], setup.level_labels,
                               setup.matrices[1:], smoother_kind="gs2",
                               cycle="kcycle", pre_smooth=1, post_smooth=1)
        b = np.random.RandomState(0).rand(a.nrows)
        res = solve_hierarchy(hier, b, method="bicgstab", tol=1e-6)
        assert int(res.status) == 0
        assert int(res.iterations) <= 10
        r = b - a.to_scipy() @ np.asarray(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


class TestABParity:
    """Same Krylov solve, P from {us, reference shipped files} — iteration
    counts must be comparable (the reference accepted its GPU port on
    exactly this criterion)."""

    def test_matvf3dsky30_promatrix(self):
        """matvf3dSky30promatrix.mtx is the reference CPU setup's output on
        the (unshipped) matvf3dSky30 input; our generator's csky3d(30)
        reproduces that matrix family.  Solve with both Ps."""
        a = read_mtx(reference_matrix_path("CSky3d30.mtx"))
        p_ref = read_mtx(reference_matrix_path("matvf3dSky30promatrix.mtx"))
        assert p_ref.shape[0] == a.nrows
        b = np.random.RandomState(0).rand(a.nrows)
        hier_ref = two_level_from_p(a, p_ref, smoother_kind="gs2",
                                    dtype=jnp.float64)
        res_ref = solve_hierarchy(hier_ref, b, method="bicgstab", tol=1e-6)
        # published settings (results.txt:22-24): ktg=10 npass=2 tou=8; the
        # shipped P has nc=8673, ours lands within a few % of that
        res_ours, agg = solve_with_our_p(a, npass=2)
        assert int(res_ours.status) == 0
        assert abs(agg.nc - p_ref.shape[1]) < 0.2 * p_ref.shape[1]
        # iteration parity under the same solver (reference accepted its
        # GPU port on this criterion)
        assert int(res_ours.iterations) <= int(res_ref.iterations) + 2

    def test_poisson10000_parity(self):
        import conftest
        a = conftest.poisson2d_csr(100)
        p_ref = read_mtx(reference_matrix_path("poisson10000promatrix.mtx"))
        b = np.random.RandomState(0).rand(a.nrows)
        hier_ref = two_level_from_p(a, p_ref, smoother_kind="gs2",
                                    dtype=jnp.float64)
        it_ref = int(solve_hierarchy(hier_ref, b, method="bicgstab",
                                     tol=1e-6).iterations)
        res_ours, agg = solve_with_our_p(a, npass=4)
        it_ours = int(res_ours.iterations)
        # reference logs show 5-12 iterations for this problem family
        assert it_ours <= it_ref + 3
