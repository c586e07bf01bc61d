"""Windowed-gather Pallas kernel (ops/gather_pallas.py).

On the CPU test backend the kernel runs through the Pallas interpreter —
semantics only; the performance claims (~0.09 ns/element vs 7 ns for the
XLA gather on v5e/v6e) are established by on-TPU marginal-cost timing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigridsolver_tpu.ops import gather_pallas as gp
from multigridsolver_tpu.sparse import hybrid as hyb
from multigridsolver_tpu.sparse import ops as ell_ops


def banded_ell_arrays(n, K, band, seed=0, npad=None):
    rs = np.random.RandomState(seed)
    npad = npad or ((n + gp.T - 1) // gp.T) * gp.T
    rows = np.arange(npad)
    cols = np.clip(rows[None, :] + rs.randint(-band, band + 1, (K, npad)),
                   0, n - 1).astype(np.int32)
    vals = rs.rand(K, npad).astype(np.float32)
    rownnz = rs.randint(1, K + 1, npad).astype(np.int32)
    rownnz[n:] = 0
    valid = np.arange(K)[:, None] < rownnz[None, :]
    cols[~valid] = 0
    vals[~valid] = 0.0
    return cols, vals, rownnz


class TestPlanner:
    def test_banded_pattern_gets_small_window(self):
        cols, vals, rownnz = banded_ell_arrays(3000, 4, band=100)
        plan = gp.plan_windows(cols, rownnz, 3000)
        assert plan is not None
        base_blk, wr, nsrc_pad = plan
        # spread per 1024-row tile ≤ 1024 + 200; with base alignment slack
        # the window half must cover the whole spread → wr = 16 (2048)
        assert wr <= 16
        assert base_blk.shape == (cols.shape[1] // gp.T,)
        assert nsrc_pad % 128 == 0 and nsrc_pad >= 3000

    def test_wide_pattern_defeats_planner(self):
        # one entry per tile points at the far end: spread ~ n
        cols, vals, rownnz = banded_ell_arrays(100000, 3, band=50)
        cols[0, ::gp.T] = 99999
        assert gp.plan_windows(cols, rownnz, 100000) is None

    def test_window_covers_all_valid_cols(self):
        cols, vals, rownnz = banded_ell_arrays(5000, 5, band=700, seed=3)
        plan = gp.plan_windows(cols, rownnz, 5000)
        assert plan is not None
        base_blk, wr, nsrc_pad = plan
        valid = np.arange(5)[:, None] < rownnz[None, :]
        tile = np.arange(cols.shape[1]) // gp.T
        lo = base_blk[tile] * gp._wb(wr) * 128
        assert np.all((cols >= lo)[valid] & (cols < lo + 2 * wr * 128)[valid])

    def test_device_minmax_matches_host(self):
        cols, vals, rownnz = banded_ell_arrays(5000, 5, band=300, seed=7)
        ntiles = cols.shape[1] // gp.T
        cmin, cmax = gp.plan_windows_device(
            jnp.asarray(cols), jnp.asarray(rownnz), ntiles)
        host = gp.plan_windows(cols, rownnz, 5000)
        dev = gp.plan_from_minmax(np.asarray(cmin), np.asarray(cmax), 5000)
        assert host is not None and dev is not None
        np.testing.assert_array_equal(host[0], dev[0])
        assert host[1:] == dev[1:]


class TestKernelInterpret:
    @pytest.fixture(autouse=True)
    def interpret_mode(self, monkeypatch):
        monkeypatch.setattr(gp, "INTERPRET", True)
        # the wrapper is jitted with INTERPRET baked in at trace time —
        # clear its cache so the flag takes effect in both directions
        gp.windowed_gather_spmv.clear_cache()
        yield
        gp.windowed_gather_spmv.clear_cache()

    def test_matches_reference_gather(self):
        n, K = 4000, 6
        cols, vals, rownnz = banded_ell_arrays(n, K, band=400, seed=1)
        plan = gp.plan_windows(cols, rownnz, n)
        base_blk, wr, nsrc_pad = plan
        x = np.random.RandomState(2).rand(n).astype(np.float32)
        y = np.asarray(gp.windowed_gather_spmv(
            jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(x),
            jnp.asarray(base_blk), wr, nsrc_pad))
        ref = (vals * x[cols]).sum(axis=0)
        np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)

    def test_hybrid_plan_route(self, monkeypatch):
        """A hybrid with a window plan must produce the same SpMV as the
        plain ELL path (0 ULP on the remainder gather)."""
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        from multigridsolver_tpu.cli.generators import poisson2d
        a = poisson2d(40)
        ell = a.to_ell(dtype=jnp.float32)
        h = hyb.hybrid_from_ell_device(ell, max_diags=2)
        assert h.ell is not None and h.wr is not None
        x = jnp.asarray(
            np.random.RandomState(0).rand(ell.npad).astype(np.float32))
        y_ref = ell_ops.spmv(ell, x)
        y = hyb.spmv(h, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)
