"""Checkpoint/resume and mixed-precision refinement."""
import numpy as np
import jax.numpy as jnp

import conftest
from multigridsolver_tpu.setup.aggregation import build_amg_setup
from multigridsolver_tpu.setup.prolongation import p_csr_from_labels
from multigridsolver_tpu.solve.hierarchy import build_hierarchy
from multigridsolver_tpu.solve.api import solve_hierarchy, solve_refined
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)
from multigridsolver_tpu.utils.serialization import (save_hierarchy,
                                                     load_hierarchy)


def make_hier(n=24, dtype=jnp.float64, smoother="chebyshev"):
    a = conftest.poisson2d_csr(n)
    ell = a.to_ell(dtype=dtype)
    setup = build_amg_setup(ell, HierarchyConfig(
        max_coarse_size=50, aggregation=AggregationConfig(npass=2)))
    hier = build_hierarchy(setup.matrices[0], setup.level_labels,
                           setup.matrices[1:], smoother_kind=smoother,
                           cycle="kcycle", pre_smooth=1, post_smooth=1)
    return a, hier


class TestCheckpoint:
    def test_roundtrip_solution_identical(self, tmp_path):
        a, hier = make_hier()
        path = str(tmp_path / "hier.npz")
        save_hierarchy(path, hier)
        hier2 = load_hierarchy(path)
        assert hier2.nlevels == hier.nlevels
        b = np.random.RandomState(0).rand(a.nrows)
        r1 = solve_hierarchy(hier, b, method="cg", tol=1e-10)
        r2 = solve_hierarchy(hier2, b, method="cg", tol=1e-10)
        assert int(r1.iterations) == int(r2.iterations)
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


class TestRefinement:
    def test_f32_hierarchy_reaches_1em8(self):
        """BASELINE north star: tight tolerance via f32 device solves +
        f64 host residual refinement."""
        a, hier = make_hier(n=32, dtype=jnp.float32)
        b = np.random.RandomState(1).rand(a.nrows)
        x, relres, inner, outer = solve_refined(hier, a, b, tol=1e-8,
                                                inner_tol=1e-4)
        assert relres < 1e-8
        assert outer <= 6
        # solution is genuinely accurate in f64
        ref = np.linalg.solve(a.to_dense(), b)
        np.testing.assert_allclose(x, ref, rtol=1e-5, atol=1e-7)


def test_smoothed_hierarchy_roundtrip(tmp_path):
    """Smoothed-aggregation (weighted-transfer) hierarchies checkpoint
    and reload with identical solve behaviour."""
    import conftest
    import jax.numpy as jnp
    from multigridsolver_tpu.setup.aggregation import build_amg_setup
    from multigridsolver_tpu.solve.hierarchy import build_hierarchy
    from multigridsolver_tpu.solve.api import solve_hierarchy
    from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                  HierarchyConfig)
    from multigridsolver_tpu.utils.serialization import (save_hierarchy,
                                                         load_hierarchy)
    a = conftest.poisson2d_csr(20)
    s = build_amg_setup(a.to_ell(dtype=jnp.float64), HierarchyConfig(
        max_coarse_size=32, aggregation=AggregationConfig(npass=2),
        smooth_p=2 / 3))
    hier = build_hierarchy(s.matrices[0], s.level_labels, s.matrices[1:],
                           smoother_kind="chebyshev", cycle="vcycle",
                           pre_smooth=1, post_smooth=1,
                           p_ops=s.p_ops, pt_ops=s.pt_ops)
    b = np.random.RandomState(0).rand(a.nrows)
    ref = solve_hierarchy(hier, b, method="bicgstab", tol=1e-10,
                          maxiter=100)
    path = str(tmp_path / "smoothed.npz")
    save_hierarchy(path, hier)
    hier2 = load_hierarchy(path)
    assert hier2.levels[0].tplan is not None
    assert hier2.levels[0].tplan.weighted
    res = solve_hierarchy(hier2, b, method="bicgstab", tol=1e-10,
                          maxiter=100)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


def test_ilu0_and_combination_roundtrip(tmp_path):
    """ilu0 factor arrays and the additive/multiplicative combination flag
    must survive a save/load cycle (the combination previously silently
    reset to multiplicative)."""
    import jax.numpy as jnp
    import conftest
    from multigridsolver_tpu.setup.aggregation import build_amg_setup
    from multigridsolver_tpu.solve.hierarchy import build_hierarchy
    from multigridsolver_tpu.solve import solve_hierarchy
    from multigridsolver_tpu.utils.config import HierarchyConfig
    from multigridsolver_tpu.utils.serialization import (save_hierarchy,
                                                         load_hierarchy)
    a = conftest.poisson2d_csr(16)
    ell = a.to_ell(dtype=jnp.float32)
    s = build_amg_setup(ell, HierarchyConfig(max_coarse_size=32))
    h = build_hierarchy(s.matrices[0], s.level_labels, s.matrices[1:],
                        smoother_kind="ilu0", cycle="vcycle",
                        combination="additive", use_hybrid=False)
    path = str(tmp_path / "h.npz")
    save_hierarchy(path, h)
    h2 = load_hierarchy(path)
    assert h2.combination == "additive"
    assert h2.levels[0].smoother.kind == "ilu0"
    np.testing.assert_allclose(np.asarray(h2.levels[0].smoother.udiag),
                               np.asarray(h.levels[0].smoother.udiag))
    np.testing.assert_allclose(np.asarray(h2.levels[0].smoother.lmat.vals),
                               np.asarray(h.levels[0].smoother.lmat.vals))
    rs = np.random.RandomState(3)
    b = rs.rand(a.shape[0])
    r1 = solve_hierarchy(h, b, tol=1e-5)
    r2 = solve_hierarchy(h2, b, tol=1e-5)
    assert r1.iterations == r2.iterations
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-6)
