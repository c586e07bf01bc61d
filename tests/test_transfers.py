"""Windowed-gather transfer plans (setup/transfers.py): restriction as a
members-ELL gather and prolongation as a K=1 gather must reproduce the
label-vector scatter/gather semantics exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigridsolver_tpu.ops import gather_pallas as gp
from multigridsolver_tpu.setup import transfers as tf
from multigridsolver_tpu.setup.prolongation import prolong, restrict


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(gp, "INTERPRET", True)
    gp.windowed_gather_spmv.clear_cache()
    yield
    gp.windowed_gather_spmv.clear_cache()


def pairwise_labels(n, seed=0, exclude_frac=0.1):
    """Labels mimicking AGMG leader-order numbering: consecutive-ish pairs,
    some singletons, some excluded (-1)."""
    rs = np.random.RandomState(seed)
    labels = np.full(n, -1, np.int32)
    c = 0
    i = 0
    while i < n:
        if rs.rand() < exclude_frac:
            i += 1
            continue
        if i + 1 < n and rs.rand() < 0.7:
            labels[i] = labels[i + 1] = c
            i += 2
        else:
            labels[i] = c
            i += 1
        c += 1
    return labels, c


class TestTransferPlan:
    def test_restrict_matches_scatter(self):
        n = 3000
        labels_np, nc = pairwise_labels(n)
        nc_pad = ((nc + 7) // 8) * 8
        lab = jnp.asarray(labels_np)
        tp = tf.build_transfer_plan(lab, nc_pad)
        assert tp.m_base is not None
        v = jnp.asarray(np.random.RandomState(1).rand(n).astype(np.float32))
        ref = restrict(lab, v, nc_pad)
        out = tf.restrict_fast(tp, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_prolong_matches_gather(self):
        n = 3000
        labels_np, nc = pairwise_labels(n, seed=3)
        nc_pad = ((nc + 7) // 8) * 8
        lab = jnp.asarray(labels_np)
        tp = tf.build_transfer_plan(lab, nc_pad)
        assert tp.p_base is not None
        xc = jnp.asarray(
            np.random.RandomState(2).rand(nc_pad).astype(np.float32))
        ref = prolong(lab, xc)
        out = tf.prolong_fast(tp, xc, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:n]),
                                   rtol=1e-6, atol=1e-6)

    def test_composed_labels_large_ratio(self):
        """npass=4-style composition: aggregate size up to 16, members of a
        coarse tile span ~16k fine rows — exercises the large windows."""
        n = 8192
        rs = np.random.RandomState(5)
        # aggregates of size 1..16 in fine order (leader numbering)
        labels = np.full(n, -1, np.int32)
        c, i = 0, 0
        while i < n:
            sz = rs.randint(1, 17)
            labels[i:i + sz] = c
            i += sz
            c += 1
        nc_pad = ((c + 7) // 8) * 8
        lab = jnp.asarray(labels)
        tp = tf.build_transfer_plan(lab, nc_pad)
        v = jnp.asarray(rs.rand(n).astype(np.float32))
        ref = restrict(lab, v, nc_pad)
        if tp.m_base is not None:
            out = tf.restrict_fast(tp, v)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6)

    def test_members_ell_structure(self):
        labels_np, nc = pairwise_labels(500, seed=9)
        nc_t = gp._round_up(nc, gp.T)
        lab = jnp.asarray(labels_np)
        cols, vals, rownnz, km = tf._members_ell(lab, 2, nc_t)
        counts = np.bincount(labels_np[labels_np >= 0], minlength=nc_t)
        np.testing.assert_array_equal(np.asarray(rownnz), counts)
        # every fine node appears exactly once among valid member slots
        cols_np, vals_np = np.asarray(cols), np.asarray(vals)
        members = cols_np[vals_np > 0]
        assert sorted(members.tolist()) == sorted(
            np.flatnonzero(labels_np >= 0).tolist())
