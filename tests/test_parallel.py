"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest
from multigridsolver_tpu.sparse import ops
from multigridsolver_tpu.parallel import (make_row_mesh, shard_ell,
                                          shard_hierarchy, shard_vector)
from multigridsolver_tpu.setup.prolongation import p_csr_from_labels
from multigridsolver_tpu.solve import two_level_from_p, solve_hierarchy
from multigridsolver_tpu.solve.api import pad_vector


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_row_mesh(8)


class TestShardedSpMV:
    def test_matches_single_device(self, mesh):
        a = conftest.poisson2d_csr(20)
        ell = a.to_ell(dtype=jnp.float64)
        ell_sh = shard_ell(ell, mesh)
        rs = np.random.RandomState(0)
        x = rs.randn(ell_sh.npad)
        x[a.shape[1]:] = 0.0
        y_ref = np.asarray(ops.spmv(ell, jnp.asarray(x[: ell.npad])))
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(jax.jit(ops.spmv)(ell_sh, xs))
        np.testing.assert_allclose(y[: a.shape[0]], y_ref[: a.shape[0]],
                                   rtol=1e-13)

    def test_sharding_layout(self, mesh):
        a = conftest.poisson2d_csr(20)
        ell_sh = shard_ell(a.to_ell(dtype=jnp.float64), mesh)
        assert ell_sh.npad % (8 * 8) == 0
        shard_rows = {s.data.shape[1] for s in ell_sh.vals.addressable_shards}
        assert shard_rows == {ell_sh.npad // 8}


class TestShardedSolve:
    def test_two_level_sharded_matches(self, mesh):
        a = conftest.poisson2d_csr(24)
        n = a.shape[0]
        labels = (np.arange(n) // 4).astype(np.int32)
        p = p_csr_from_labels(labels, n // 4)
        hier = two_level_from_p(a, p, smoother_kind="chebyshev",
                                dtype=jnp.float64)
        rs = np.random.RandomState(1)
        b = rs.rand(n)
        res_ref = solve_hierarchy(hier, b, method="cg", tol=1e-10)
        hier_sh = shard_hierarchy(hier, mesh)
        res_sh = solve_hierarchy(hier_sh, b, method="cg", tol=1e-10)
        assert int(res_sh.status) == 0
        # same preconditioner ⇒ same iteration count and same solution
        assert int(res_sh.iterations) == int(res_ref.iterations)
        np.testing.assert_allclose(np.asarray(res_sh.x),
                                   np.asarray(res_ref.x), rtol=1e-9,
                                   atol=1e-11)

    def test_precondition_identical(self, mesh):
        a = conftest.poisson2d_csr(16)
        n = a.shape[0]
        labels = (np.arange(n) // 2).astype(np.int32)
        p = p_csr_from_labels(labels, n // 2)
        hier = two_level_from_p(a, p, smoother_kind="gs2",
                                dtype=jnp.float64)
        hier_sh = shard_hierarchy(hier, mesh)
        rs = np.random.RandomState(2)
        v_ref = pad_vector(rs.rand(n), hier.levels[0].a.npad, jnp.float64)
        v_sh = pad_vector(np.asarray(v_ref)[:n], hier_sh.levels[0].a.npad,
                          jnp.float64)
        out_ref = np.asarray(jax.jit(hier.precondition)(v_ref))
        out_sh = np.asarray(jax.jit(hier_sh.precondition)(v_sh))
        np.testing.assert_allclose(out_sh[:n], out_ref[:n], rtol=1e-11,
                                   atol=1e-13)


class TestHaloSpMV:
    def test_matches_reference(self, mesh):
        import jax
        from multigridsolver_tpu.sparse import hybrid as hyb
        from multigridsolver_tpu.parallel import shard_operator
        from multigridsolver_tpu.parallel.halo import make_halo_spmv

        a = conftest.poisson2d_csr(40)       # banded: pure DIA
        ell = a.to_ell(dtype=jnp.float64)
        h = hyb.hybrid_from_ell_device(ell)
        h_sh = shard_operator(h, mesh)
        spmv = jax.jit(make_halo_spmv(h_sh, mesh))
        rs = np.random.RandomState(0)
        x = np.zeros(h_sh.npad)
        x[: a.shape[1]] = rs.randn(a.shape[1])
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(spmv(xs))
        ref = a.to_scipy() @ x[: a.shape[1]]
        np.testing.assert_allclose(y[: a.shape[0]], ref, rtol=1e-12,
                                   atol=1e-12)

    def test_with_ell_remainder(self, mesh):
        import jax
        import scipy.sparse as sp
        from multigridsolver_tpu.sparse.formats import CSR
        from multigridsolver_tpu.sparse import hybrid as hyb
        from multigridsolver_tpu.parallel import shard_operator
        from multigridsolver_tpu.parallel.halo import make_halo_spmv

        rs = np.random.RandomState(5)
        base = conftest.poisson2d_csr(30).to_scipy()
        noise = sp.random(900, 900, density=0.002,
                          random_state=rs, format="csr")
        a = CSR.from_scipy((base + noise).tocsr())
        h = hyb.hybrid_from_ell_device(a.to_ell(dtype=jnp.float64))
        assert h.ell is not None
        h_sh = shard_operator(h, mesh)
        spmv = jax.jit(make_halo_spmv(h_sh, mesh))
        x = np.zeros(h_sh.npad)
        x[: a.shape[1]] = rs.randn(a.shape[1])
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(spmv(xs))
        ref = a.to_scipy() @ x[: a.shape[1]]
        np.testing.assert_allclose(y[: a.shape[0]], ref, rtol=1e-11,
                                   atol=1e-11)


class TestHaloOpIntegration:
    def test_sharded_hierarchy_uses_halo_op(self, mesh):
        """shard_hierarchy must route banded sharded levels through the
        ppermute halo path (VERDICT r1: halo.py was an orphan)."""
        from multigridsolver_tpu.parallel import shard_hierarchy
        from multigridsolver_tpu.parallel.halo import HaloOp
        from multigridsolver_tpu.solve.hierarchy import build_hierarchy
        from multigridsolver_tpu.setup.aggregation import build_amg_setup
        from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                      HierarchyConfig)

        a = conftest.poisson2d_csr(24)
        ell = a.to_ell(dtype=jnp.float64)
        s = build_amg_setup(ell, HierarchyConfig(
            max_coarse_size=32, aggregation=AggregationConfig(npass=2)))
        hier = build_hierarchy(s.matrices[0], s.level_labels,
                               s.matrices[1:], smoother_kind="chebyshev")
        hier_sh = shard_hierarchy(hier, mesh)
        assert isinstance(hier_sh.levels[0].a, HaloOp)

    def test_halo_spmv_hlo_has_no_all_gather(self, mesh):
        """For a pure-stencil (no ELL remainder) operator the compiled
        sharded SpMV must move only ppermute halos — no all-gather of x."""
        import jax
        from multigridsolver_tpu.sparse import hybrid as hyb
        from multigridsolver_tpu.sparse import ops
        from multigridsolver_tpu.parallel import (shard_operator,
                                                  shard_vector)
        from multigridsolver_tpu.parallel.halo import HaloOp

        a = conftest.poisson2d_csr(40)
        h = hyb.hybrid_from_ell_device(a.to_ell(dtype=jnp.float64))
        assert h.ell is None
        h_sh = HaloOp(a=shard_operator(h, mesh), mesh=mesh)
        x = shard_vector(jnp.zeros((h_sh.npad,), jnp.float64), mesh)
        hlo = jax.jit(ops.spmv).lower(h_sh, x).compile().as_text()
        assert "collective-permute" in hlo
        assert "all-gather" not in hlo

    def test_halo_op_solve_parity(self, mesh):
        """Full sharded multilevel solve through HaloOp levels matches the
        single-device solve iteration-for-iteration."""
        from multigridsolver_tpu.parallel import (shard_hierarchy,
                                                  shard_vector)
        from multigridsolver_tpu.parallel.halo import HaloOp
        from multigridsolver_tpu.solve.hierarchy import build_hierarchy
        from multigridsolver_tpu.solve.api import (solve_hierarchy,
                                                   pad_vector)
        from multigridsolver_tpu.setup.aggregation import build_amg_setup
        from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                      HierarchyConfig)

        a = conftest.poisson2d_csr(24)
        ell = a.to_ell(dtype=jnp.float64)
        s = build_amg_setup(ell, HierarchyConfig(
            max_coarse_size=32, aggregation=AggregationConfig(npass=2)))
        hier = build_hierarchy(s.matrices[0], s.level_labels,
                               s.matrices[1:], smoother_kind="chebyshev")
        rs = np.random.RandomState(0)
        b = rs.rand(a.shape[0])
        ref = solve_hierarchy(hier, b, method="bicgstab", tol=1e-8,
                              maxiter=100)
        hier_sh = shard_hierarchy(hier, mesh)
        assert isinstance(hier_sh.levels[0].a, HaloOp)
        npad = hier_sh.levels[0].a.npad
        b_sh = shard_vector(pad_vector(b, npad, jnp.float64), mesh)
        res = solve_hierarchy(hier_sh, b_sh, method="bicgstab", tol=1e-8,
                              maxiter=100)
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(
            np.asarray(res.x)[: a.shape[0]],
            np.asarray(ref.x)[: a.shape[0]], rtol=1e-8, atol=1e-10)


def _local_noise(n, rs, nnz=120, spread=150):
    """Sparse noise whose columns stay near the diagonal — the realistic
    remainder shape (aggregation preserves ordering locality), and one
    the index-list plan accepts (uniform-random columns are refused:
    their lists would move more than the all-gather they replace)."""
    import scipy.sparse as sp
    r = rs.randint(0, n, size=nnz)
    c = np.clip(r + rs.randint(-spread, spread + 1, size=nnz), 0, n - 1)
    return sp.coo_matrix((rs.randn(nnz), (r, c)), shape=(n, n)).tocsr()


class TestIndexListExchange:
    def test_remainder_rides_all_to_all_not_all_gather(self, mesh):
        """With an exchange plan, the compiled SpMV of a DIA+ELL operator
        must move the remainder's off-shard x entries via all-to-all
        index lists — never an all-gather (VERDICT r2 #4)."""
        import scipy.sparse as sp
        from multigridsolver_tpu.sparse.formats import CSR
        from multigridsolver_tpu.sparse import hybrid as hyb
        from multigridsolver_tpu.sparse import ops
        from multigridsolver_tpu.parallel import shard_operator
        from multigridsolver_tpu.parallel.halo import make_halo_op

        rs = np.random.RandomState(7)
        base = conftest.poisson2d_csr(30).to_scipy()
        a = CSR.from_scipy((base + _local_noise(900, rs)).tocsr())
        h = hyb.hybrid_from_ell_device(a.to_ell(dtype=jnp.float64))
        assert h.ell is not None
        op = make_halo_op(shard_operator(h, mesh), mesh)
        assert op.ex_cols is not None, "exchange plan must build"
        x = jnp.zeros((op.npad,), jnp.float64)
        xs = shard_vector(x, mesh)
        hlo = jax.jit(ops.spmv).lower(op, xs).compile().as_text()
        assert "all-gather" not in hlo
        assert "all-to-all" in hlo
        assert "collective-permute" in hlo

    def test_remainder_exchange_matches_reference(self, mesh):
        import scipy.sparse as sp
        from multigridsolver_tpu.sparse.formats import CSR
        from multigridsolver_tpu.sparse import hybrid as hyb
        from multigridsolver_tpu.sparse import ops
        from multigridsolver_tpu.parallel import shard_operator
        from multigridsolver_tpu.parallel.halo import make_halo_op

        rs = np.random.RandomState(5)
        base = conftest.poisson2d_csr(30).to_scipy()
        a = CSR.from_scipy((base + _local_noise(900, rs)).tocsr())
        h = hyb.hybrid_from_ell_device(a.to_ell(dtype=jnp.float64))
        op = make_halo_op(shard_operator(h, mesh), mesh)
        assert op.ex_cols is not None
        x = np.zeros(op.npad)
        x[: a.shape[1]] = rs.randn(a.shape[1])
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(jax.jit(ops.spmv)(op, xs))
        ref = a.to_scipy() @ x[: a.shape[1]]
        np.testing.assert_allclose(y[: a.shape[0]], ref, rtol=1e-11,
                                   atol=1e-11)

    def test_exchange_ell_irregular_operator(self, mesh):
        """Coarse-level-like irregular ELL (stencil + scattered local
        fill, as Galerkin products produce): the index-list exchange must
        reproduce the single-device SpMV and compile without any
        all-gather."""
        import scipy.sparse as sp
        from multigridsolver_tpu.sparse.formats import CSR
        from multigridsolver_tpu.sparse import ops
        from multigridsolver_tpu.parallel import shard_ell
        from multigridsolver_tpu.parallel.exchange import exchange_ell

        rs = np.random.RandomState(11)
        m = conftest.poisson2d_csr(64).to_scipy()   # n=4096, band 64
        m = (m + _local_noise(4096, rs, nnz=800, spread=100)).tocsr()
        a = CSR.from_scipy(m)
        ell = a.to_ell(dtype=jnp.float64)
        ell_sh = shard_ell(ell, mesh)
        op = exchange_ell(ell_sh, mesh)
        assert op is not None, "plan must build for a local pattern"
        x = np.zeros(op.npad)
        x[: a.shape[1]] = rs.randn(a.shape[1])
        y_ref = np.asarray(ops.spmv(ell, jnp.asarray(x[: ell.npad])))
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(jax.jit(ops.spmv)(op, xs))
        np.testing.assert_allclose(y[: a.shape[0]], y_ref[: a.shape[0]],
                                   rtol=1e-12, atol=1e-12)
        hlo = jax.jit(ops.spmv).lower(op, xs).compile().as_text()
        assert "all-gather" not in hlo
        assert "all-to-all" in hlo

    def test_exchange_plan_refused_when_dense(self, mesh):
        """A pattern whose lists would move more than an all-gather must
        be refused (the exchange must never lose to what it replaces)."""
        from multigridsolver_tpu.parallel.exchange import (
            build_exchange_plan)
        rs = np.random.RandomState(3)
        n, k = 128, 16
        cols = rs.randint(0, n, size=(k, n)).astype(np.int32)
        rownnz = np.full((n,), k, np.int32)
        assert build_exchange_plan(cols, rownnz, 8) is None

    def test_block_diagonal_needs_no_collective(self, mesh):
        """A remainder with no cross-shard references compiles to a
        collective-free SpMV (L = 0)."""
        from multigridsolver_tpu.sparse.formats import ELL
        from multigridsolver_tpu.sparse import ops
        from multigridsolver_tpu.parallel import shard_ell
        from multigridsolver_tpu.parallel.exchange import exchange_ell

        n, k, ndev = 64 * 8, 3, 8
        nl = n // ndev
        rs = np.random.RandomState(2)
        # each row references only columns within its own shard
        base = (np.arange(n) // nl) * nl
        cols = (base[None, :] + rs.randint(0, nl, size=(k, n))
                ).astype(np.int32)
        vals = rs.randn(k, n)
        ell = ELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals),
                  rownnz=jnp.full((n,), k, jnp.int32), nrows=n, ncols=n)
        op = exchange_ell(shard_ell(ell, mesh), mesh)
        assert op is not None and op.L == 0
        x = rs.randn(n)
        y_ref = np.asarray(ops.spmv(ell, jnp.asarray(x)))
        xs = shard_vector(jnp.asarray(x), mesh)
        y = np.asarray(jax.jit(ops.spmv)(op, xs))
        np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)
        hlo = jax.jit(ops.spmv).lower(op, xs).compile().as_text()
        assert "all-gather" not in hlo
        assert "all-to-all" not in hlo


class TestDistributedSetup:
    def test_sharded_setup_labels_bit_identical(self, mesh):
        """The full aggregation setup over row-sharded arrays (GSPMD
        collectives) must produce bit-identical labels and level sizes to
        the single-chip run (VERDICT r1 #6)."""
        from multigridsolver_tpu.parallel import build_amg_setup_sharded
        from multigridsolver_tpu.setup.aggregation import build_amg_setup
        from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                      HierarchyConfig)

        a = conftest.poisson2d_csr(32)
        ell = a.to_ell(dtype=jnp.float64)
        cfg = HierarchyConfig(max_coarse_size=32,
                              aggregation=AggregationConfig(npass=2))
        ref = build_amg_setup(ell, cfg)
        sh = build_amg_setup_sharded(ell, cfg, mesh)
        assert [m.nrows for m in sh.matrices] == \
            [m.nrows for m in ref.matrices]
        for l_ref, l_sh in zip(ref.level_labels, sh.level_labels):
            np.testing.assert_array_equal(np.asarray(l_sh),
                                          np.asarray(l_ref))
        # coarse operators numerically identical too
        for m_ref, m_sh in zip(ref.matrices[1:], sh.matrices[1:]):
            np.testing.assert_allclose(
                np.asarray(m_sh.vals), np.asarray(m_ref.vals), rtol=0,
                atol=0)

    def test_sharded_setup_outputs_are_sharded(self, mesh):
        """Coarse operators must come out row-sharded, not replicated —
        the point of the distributed setup."""
        from multigridsolver_tpu.parallel import build_amg_setup_sharded
        from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                      HierarchyConfig)
        a = conftest.poisson2d_csr(32)
        ell = a.to_ell(dtype=jnp.float64)
        sh = build_amg_setup_sharded(
            ell, HierarchyConfig(max_coarse_size=32,
                                 aggregation=AggregationConfig(npass=2)),
            mesh)
        finest = sh.matrices[0]
        assert len(finest.vals.sharding.device_set) == 8


class TestShardedPlannedGather:
    """Window-planned gathers under sharding: halo-exchange shard_map
    Pallas kernel instead of a GSPMD all-gather (VERDICT r2 #5).  Runs
    the kernel through the Pallas interpreter on the CPU mesh."""

    @pytest.fixture()
    def interp(self, monkeypatch):
        from multigridsolver_tpu.ops import gather_pallas as gp
        monkeypatch.setattr(gp, "INTERPRET", True)
        for f in (gp.windowed_gather_spmv, gp.windowed_take,
                  gp.windowed_take_rows):
            f.clear_cache()
        yield gp
        for f in (gp.windowed_gather_spmv, gp.windowed_take,
                  gp.windowed_take_rows):
            f.clear_cache()

    def _planned(self, mesh, n=64):
        from multigridsolver_tpu.parallel.dist_setup import shard_ell_planned
        a = conftest.poisson2d_csr(n)
        ell = a.to_ell(dtype=jnp.float32)
        assert ell.base_blk is not None, "plan expected on poisson"
        sh = shard_ell_planned(ell, mesh)
        assert sh is not None, "planned sharding must cover poisson"
        return ell, sh

    def test_take_neighbor_matches_single_chip(self, mesh, interp):
        ell, sh = self._planned(mesh)
        x = jnp.asarray(
            np.random.RandomState(3).rand(sh.npad).astype(np.float32))
        out_sh = np.asarray(jax.jit(ops.take_neighbor)(sh, x))
        ref = np.take(np.asarray(x), np.asarray(sh.cols), axis=0)
        m = np.asarray(sh.slot_mask())
        np.testing.assert_array_equal(out_sh[m], ref[m])

    def test_take_neighbor_bool_and_custom_idx(self, mesh, interp):
        ell, sh = self._planned(mesh)
        av = jnp.asarray(np.random.RandomState(5).rand(sh.npad) > 0.5)
        out = np.asarray(jax.jit(ops.take_neighbor)(sh, av))
        ref = np.take(np.asarray(av), np.asarray(sh.cols), axis=0)
        m = np.asarray(sh.slot_mask())
        np.testing.assert_array_equal(out[m], ref[m])
        # 1-row custom idx (the proposal-of-proposal gather): own rows are
        # window-covered by construction
        idx = jnp.arange(sh.npad, dtype=jnp.int32)
        x = jnp.asarray(
            np.random.RandomState(7).rand(sh.npad).astype(np.float32))
        out1 = np.asarray(jax.jit(
            lambda a, v, i: ops.take_neighbor(a, v, idx=i))(sh, x, idx))
        np.testing.assert_array_equal(out1, np.asarray(x))

    def test_gather_hlo_collective_permute_not_all_gather(self, mesh,
                                                          interp):
        ell, sh = self._planned(mesh)
        x = jnp.zeros((sh.npad,), jnp.float32)
        compiled = jax.jit(ops.take_neighbor).lower(sh, x).compile()
        txt = compiled.as_text()
        assert "collective-permute" in txt
        assert "all-gather" not in txt

    def test_planned_setup_labels_bit_identical(self, mesh, interp):
        """f32 setup over the halo-kernel path: labels on the logical rows
        must be bit-identical to the single-chip f32 run."""
        from multigridsolver_tpu.parallel import build_amg_setup_sharded
        from multigridsolver_tpu.setup.aggregation import build_amg_setup
        from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                      HierarchyConfig)
        a = conftest.poisson2d_csr(64)
        ell = a.to_ell(dtype=jnp.float32)
        cfg = HierarchyConfig(max_coarse_size=64,
                              aggregation=AggregationConfig(
                                  npass=2, symmetric=True))
        ref = build_amg_setup(ell, cfg)
        sh = build_amg_setup_sharded(ell, cfg, mesh)
        assert sh.matrices[0].shard is not None, \
            "planned sharding should engage on f32 poisson"
        assert [m.nrows for m in sh.matrices] == \
            [m.nrows for m in ref.matrices]
        n = a.nrows
        for l_ref, l_sh in zip(ref.level_labels, sh.level_labels):
            np.testing.assert_array_equal(
                np.asarray(l_sh)[:n], np.asarray(l_ref)[:n])
            n = int(np.asarray(l_ref).max()) + 1


class TestShardedPlanWidening:
    """shard_ell_planned widens non-conforming window sizes (wr 24→32);
    the widening changes the base granularity, so the stored bases must
    be rescaled or every sharded gather reads the wrong window (ADVICE
    r4 high)."""

    @pytest.fixture()
    def interp(self, monkeypatch):
        from multigridsolver_tpu.ops import gather_pallas as gp
        monkeypatch.setattr(gp, "INTERPRET", True)
        for f in (gp.windowed_gather_spmv, gp.windowed_take,
                  gp.windowed_take_rows):
            f.clear_cache()
        yield gp
        for f in (gp.windowed_gather_spmv, gp.windowed_take,
                  gp.windowed_take_rows):
            f.clear_cache()

    def _wr24_ell(self):
        import scipy.sparse as sp
        from multigridsolver_tpu.sparse.formats import CSR
        n = 20000
        b = 1600
        a = sp.diags([np.full(n - b, -1.0), np.full(n, 4.0),
                      np.full(n - b, -1.0)], [-b, 0, b], format="csr")
        ell = CSR.from_scipy(a).to_ell(dtype=jnp.float32)
        assert ell.wr == 24, f"plan expected at wr=24, got {ell.wr}"
        return ell

    def test_widened_bases_cover_all_columns(self, mesh, interp):
        from multigridsolver_tpu.ops import gather_pallas as gp
        from multigridsolver_tpu.parallel.dist_setup import shard_ell_planned
        ell = self._wr24_ell()
        sh = shard_ell_planned(ell, mesh)
        assert sh is not None and sh.wr == 32
        base = np.asarray(sh.base_blk)
        cols = np.asarray(sh.cols)
        rn = np.asarray(sh.rownnz)
        wbl = gp._wb(sh.wr) * 128
        K, npad = cols.shape
        valid = np.arange(K)[:, None] < rn[None, :]
        lo = base[np.arange(npad) // 1024].astype(np.int64) * wbl
        inwin = (cols >= lo) & (cols < lo + 2 * sh.wr * 128)
        assert (inwin | ~valid).all(), \
            "widened plan bases leave stored columns outside the window"

    def test_widened_take_matches_reference(self, mesh, interp):
        from multigridsolver_tpu.parallel.dist_setup import \
            shard_ell_planned
        ell = self._wr24_ell()
        sh = shard_ell_planned(ell, mesh)
        assert sh is not None
        x = jnp.asarray(np.random.RandomState(11)
                        .rand(sh.npad).astype(np.float32))
        out = np.asarray(jax.jit(ops.take_neighbor)(sh, x))
        ref = np.take(np.asarray(x), np.asarray(sh.cols), axis=0)
        m = np.asarray(sh.slot_mask())
        np.testing.assert_array_equal(out[m], ref[m])
