"""High-level config-driven solve() API + GMRES."""
import numpy as np
import jax.numpy as jnp

import conftest
from multigridsolver_tpu.solve.api import solve
from multigridsolver_tpu.solve import krylov
from multigridsolver_tpu.sparse import ops
from multigridsolver_tpu.solve.api import pad_vector
from multigridsolver_tpu.utils.config import (SolveConfig, SmootherConfig,
                                              HierarchyConfig,
                                              AggregationConfig)


def test_solve_one_call():
    a = conftest.poisson2d_csr(40)
    b = np.random.RandomState(0).rand(a.nrows)
    x, info = solve(a, b, SolveConfig(
        method="bicgstab", tol=1e-8, dtype="float64",
        smoother=SmootherConfig(kind="chebyshev", degree=2),
        hierarchy=HierarchyConfig(max_coarse_size=100,
                                  aggregation=AggregationConfig(npass=2))))
    assert info["status"] == 0
    r = b - a.to_scipy() @ x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_solve_with_refinement():
    a = conftest.poisson2d_csr(32)
    b = np.random.RandomState(1).rand(a.nrows)
    x, info = solve(a, b, SolveConfig(
        method="bicgstab", tol=1e-4, dtype="float32",
        refine_outer=8, refine_tol=1e-9,
        hierarchy=HierarchyConfig(max_coarse_size=64)))
    assert info["relres"] < 1e-9


def test_gmres():
    import scipy.sparse as sp
    from multigridsolver_tpu.sparse.formats import CSR
    rs = np.random.RandomState(3)
    n = 80
    m = sp.random(n, n, density=0.1, random_state=rs, format="csr")
    a = CSR.from_scipy((m + 8.0 * sp.identity(n)).tocsr())
    b = rs.rand(n)
    ell = a.to_ell(dtype=jnp.float64)
    bp = pad_vector(b, ell.npad, jnp.float64)
    res = krylov.gmres(lambda v: ops.spmv(ell, v), bp, tol=1e-9,
                       maxiter=300, restart=25)
    assert int(res.status) == 0
    x = np.asarray(res.x)[:n]
    np.testing.assert_allclose(a.to_scipy() @ x, b, rtol=0, atol=1e-7)
