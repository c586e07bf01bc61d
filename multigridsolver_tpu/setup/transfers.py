"""Windowed-gather transfer plans: prolongation and restriction at kernel
speed.

The label-vector transfer layer (prolongation.py) is algebraically free on
paper — P @ xc is one gather, Pᵀ @ v one scatter-add — but XLA lowers both
to ~7 ns/element scalar loops on TPU, which made the finest level's
restrict+prolong ~15 % of every cycle.  Both map onto the windowed-gather
kernel (ops/gather_pallas.py):

* prolongation is a K = 1 gather whose indices are the labels themselves;
  labels follow the row index (aggregates are numbered in leader order,
  setup/matching.py), so windows are tiny;
* restriction is re-expressed as a gather *from the coarse side*: a
  members-ELL whose row c lists the fine indices of aggregate c
  (Pᵀ v)[c] = Σ_m v[members[m, c]].  This replaces the reference's
  explicit Pᵀ CSR SpMV (``src/GPU_CUDAC++/main.cu:251-261``) with no
  scatter at all.  Member windows span ~ratio · 1024 fine rows per coarse
  tile, so the planner may need the large window sizes (wr = 32).

Plans are built once at hierarchy-build time from the device labels; when
a window plan does not exist (pathological orderings) the caller falls
back to the XLA gather/scatter path.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import gather_pallas as gp


@partial(jax.tree_util.register_dataclass,
         data_fields=["p_cols", "p_vals", "p_base", "m_cols", "m_vals",
                      "m_base", "m_ov_rows", "m_ov_cols", "m_ov_vals"],
         meta_fields=["p_wr", "p_nsrc", "m_wr", "m_nsrc", "npad_f",
                      "nc_pad", "weighted"])
@dataclass
class TransferPlan:
    """Kernel-ready transfer operators for one level.

    ``p_*``: prolongation gather over fine rows (K = 1 and unit weights
    for piecewise-constant P; K > 1 with real weights for smoothed
    aggregation — ``weighted=True``), sourcing the coarse vector.
    ``m_*``: restriction gather over coarse rows (aggregate members, or
    Pᵀ rows when weighted), sourcing the fine vector.  Either base may be
    None → that direction runs the XLA-gather fallback instead of the
    Pallas kernel; the arrays are authoritative either way."""

    p_cols: jnp.ndarray
    p_vals: jnp.ndarray
    p_base: jnp.ndarray | None
    m_cols: jnp.ndarray
    m_vals: jnp.ndarray
    m_base: jnp.ndarray | None
    p_wr: int | None
    p_nsrc: int | None
    m_wr: int | None
    m_nsrc: int | None
    npad_f: int
    nc_pad: int
    weighted: bool = False
    # split-plan overflow for the restriction direction: the few member
    # indices outside the anchored window ride an XLA scatter-gather over
    # a compact padded COO (rows = coarse targets, cols = fine sources)
    m_ov_rows: jnp.ndarray | None = None
    m_ov_cols: jnp.ndarray | None = None
    m_ov_vals: jnp.ndarray | None = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("km", "nc_t"))
def _members_ell(labels: jnp.ndarray, km: int, nc_t: int):
    """Device build of the members-ELL: cols[r, c] = fine index of the
    r-th member of aggregate c in ascending fine order (0 beyond the
    aggregate size, val 0).

    Built by km rounds of "extract the smallest remaining member per
    aggregate" (a 1-D scatter-min + gather each) — the argsort+scan
    formulation this replaces cost ~70 s of XLA compile per level shape
    (argsort 11.6 s, 1-D associative_scan 55 s, 2-D lane scatter 11 s at
    10⁶ rows), which dominated the hierarchy-build cold start."""
    npad = labels.shape[0]
    idxs = jnp.arange(npad, dtype=jnp.int32)
    valid = labels >= 0
    lab = jnp.where(valid, labels, nc_t).astype(jnp.int32)
    remaining = valid
    col_rows, val_rows = [], []
    for _ in range(km):
        m = jnp.full((nc_t + 1,), npad, jnp.int32).at[lab].min(
            jnp.where(remaining, idxs, npad))
        taken = remaining & (jnp.take(m, lab, axis=0) == idxs)
        has = m[:nc_t] < npad
        col_rows.append(jnp.where(has, m[:nc_t], 0))
        val_rows.append(has.astype(jnp.float32))
        remaining = remaining & ~taken
    cols = jnp.stack(col_rows)
    vals = jnp.stack(val_rows)
    rownnz = jnp.sum(vals, axis=0).astype(jnp.int32)
    km_actual = jnp.max(rownnz)
    return cols, vals, rownnz, km_actual


@partial(jax.jit, static_argnames=("npad_f",))
def _prolong_arrays(labels: jnp.ndarray, npad_f: int):
    npad = labels.shape[0]
    if npad_f != npad:
        labels = jnp.concatenate(
            [labels, jnp.full((npad_f - npad,), -1, jnp.int32)])
    valid = labels >= 0
    p_cols = jnp.where(valid, labels, 0).astype(jnp.int32)[None, :]
    p_vals = valid.astype(jnp.float32)[None, :]
    p_rnnz = valid.astype(jnp.int32)
    return labels, p_cols, p_vals, p_rnnz


@jax.jit
def _max_agg_size(labels: jnp.ndarray):
    valid = labels >= 0
    n = labels.shape[0]
    counts = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(valid, labels, n)].add(valid.astype(jnp.int32))
    return jnp.max(counts[:n])


def transfer_plan_staged(labels: jnp.ndarray, nc_pad: int):
    """Staged generator (utils/staging.py) building both directions'
    kernel arrays + window plans from a level's (device) label vector.
    Host syncs — one scalar (max aggregate size) and the per-tile
    min/max reductions — are ``yield``\\ ed so peer levels batch them."""
    npad = labels.shape[0]
    npad_f = _round_up(npad, gp.T)
    nc_t = _round_up(nc_pad, gp.T)

    # --- prolongation arrays: one slot per fine row (one program; the
    # eager form dispatched ~5 tiny programs per level) ---
    labels, p_cols, p_vals, p_rnnz = _prolong_arrays(labels,
                                                     npad_f=npad_f)
    (cmin, cmax), km = yield (
        gp.plan_windows_device(p_cols, p_rnnz, npad_f // gp.T),
        _max_agg_size(labels))
    plan = gp.plan_from_minmax(cmin, cmax, nc_pad)
    p_base = p_wr = p_nsrc = None
    if plan is not None:
        b, p_wr, p_nsrc = plan
        p_base = jnp.asarray(b)

    # --- restriction members ---
    km = int(km)
    m_base = m_wr = m_nsrc = None
    m_ov_rows = m_ov_cols = m_ov_vals = None
    if km > 0:
        m_cols, m_vals, m_rnnz, _ = _members_ell(labels, km, nc_t)
        cmin, cmax = yield gp.plan_windows_device(m_cols, m_rnnz,
                                                  nc_t // gp.T)
        plan = gp.plan_from_minmax(cmin, cmax, npad_f)
        if plan is not None and km * 2 * plan[1] <= 32768:
            b, m_wr, m_nsrc = plan
            m_base = jnp.asarray(b)
        else:
            # outlier members defeat the exact plan: anchor windows on
            # the coarse diagonal, spill the stragglers to an XLA path.
            # All candidate overflow fractions come back in ONE readback.
            stretch = npad_f / max(nc_t, 1)
            wrs = tuple(wr for wr in (16, 32, 64, 128, 192)
                        if km * 2 * wr <= 32768)
            if wrs:
                cands = [gp.anchored_base(nc_t // gp.T, wr, npad_f,
                                          stretch=stretch) for wr in wrs]
                bases = jnp.asarray(np.stack([b for b, _ in cands]))
                fracs = yield gp.overflow_fracs_device(m_cols, m_rnnz,
                                                       bases, wrs)
                chosen = next((i for i, wr in enumerate(wrs)
                               if float(fracs[i]) <= 0.25), None)
                if chosen is not None:
                    wr = wrs[chosen]
                    base = jnp.asarray(cands[chosen][0])
                    mc, mv, _, ov_r, ov_c, ov_v, nov_dev = \
                        gp.split_overflow_device(m_cols, m_vals, m_rnnz,
                                                 base, wr)
                    nov = int((yield nov_dev))
                    m_cols, m_vals = mc, mv
                    m_base, m_wr, m_nsrc = base, wr, cands[chosen][1]
                    if nov > 0:
                        n_ov = _round_up(max(nov, 1), 1024)
                        keep = jnp.arange(n_ov) < nov
                        m_ov_rows = jnp.where(keep, ov_r[:n_ov], 0)
                        m_ov_cols = jnp.where(keep, ov_c[:n_ov], 0)
                        m_ov_vals = jnp.where(keep, ov_v[:n_ov], 0.0)
    else:
        m_cols = jnp.zeros((1, nc_t), jnp.int32)
        m_vals = jnp.zeros((1, nc_t), jnp.float32)
    return TransferPlan(p_cols=p_cols, p_vals=p_vals, p_base=p_base,
                        m_cols=m_cols, m_vals=m_vals, m_base=m_base,
                        p_wr=p_wr, p_nsrc=p_nsrc, m_wr=m_wr, m_nsrc=m_nsrc,
                        npad_f=npad_f, nc_pad=nc_pad,
                        m_ov_rows=m_ov_rows, m_ov_cols=m_ov_cols,
                        m_ov_vals=m_ov_vals)


def build_transfer_plan(labels: jnp.ndarray, nc_pad: int) -> TransferPlan:
    """Blocking wrapper around :func:`transfer_plan_staged`."""
    from ..utils.staging import drive
    return drive([transfer_plan_staged(labels, nc_pad)])[0]


def tplan_record(tp: TransferPlan) -> dict | None:
    """Ladder record of a unit transfer plan's derived structure, or
    None when the member-overflow split path was taken."""
    if tp.weighted or tp.m_ov_rows is not None:
        return None

    def plan_of(base, wr, nsrc):
        if base is None:
            return None
        return (np.asarray(base).astype(int).tolist(), wr, nsrc)

    return dict(km=int(tp.m_cols.shape[0]) if tp.m_cols is not None
                else 0,
                p=plan_of(tp.p_base, tp.p_wr, tp.p_nsrc),
                m=plan_of(tp.m_base, tp.m_wr, tp.m_nsrc))


def tplan_replay(labels: jnp.ndarray, nc_pad: int, rec: dict):
    """Rebuild a unit transfer plan from a ladder record, no host sync.
    Returns (tplan, pending) for end-of-build validation."""
    npad = labels.shape[0]
    npad_f = _round_up(npad, gp.T)
    nc_t = _round_up(nc_pad, gp.T)
    labels, p_cols, p_vals, p_rnnz = _prolong_arrays(labels,
                                                     npad_f=npad_f)
    km_dev = _max_agg_size(labels)
    p_minmax = gp.plan_windows_device(p_cols, p_rnnz, npad_f // gp.T)
    km = rec["km"]

    def attach(plan):
        if plan is None:
            return None, None, None
        b, wr, nsrc = plan
        return jnp.asarray(np.asarray(b, np.int32)), wr, nsrc

    p_base, p_wr, p_nsrc = attach(rec.get("p"))
    m_base = m_wr = m_nsrc = None
    m_minmax = None
    if km > 0:
        m_cols, m_vals, m_rnnz, _ = _members_ell(labels, km, nc_t)
        m_base, m_wr, m_nsrc = attach(rec.get("m"))
        if m_base is not None:
            m_minmax = gp.plan_windows_device(m_cols, m_rnnz,
                                              nc_t // gp.T)
    else:
        m_cols = jnp.zeros((1, nc_t), jnp.int32)
        m_vals = jnp.zeros((1, nc_t), jnp.float32)
    pend = dict(kind="tplan", km=km_dev, p_minmax=p_minmax,
                m_minmax=m_minmax, rec=rec)
    for t in (km_dev,) + tuple(p_minmax) + tuple(m_minmax or ()):
        try:
            t.copy_to_host_async()
        except Exception:
            pass
    tp = TransferPlan(p_cols=p_cols, p_vals=p_vals, p_base=p_base,
                      m_cols=m_cols, m_vals=m_vals, m_base=m_base,
                      p_wr=p_wr, p_nsrc=p_nsrc, m_wr=m_wr, m_nsrc=m_nsrc,
                      npad_f=npad_f, nc_pad=nc_pad)
    return tp, pend


def _covers(minmax, plan) -> bool:
    cmin = np.asarray(minmax[0]).astype(np.int64)
    cmax = np.asarray(minmax[1]).astype(np.int64)
    b, wr, nsrc = plan
    base = np.asarray(b, np.int64)
    wbl = gp._wb(wr) * 128
    n = min(base.shape[0], cmin.shape[0])
    lo = base[:n] * wbl
    return bool(np.all(cmin[:n] >= lo)
                and np.all(cmax[:n] < lo + 2 * wr * 128)
                and np.all(cmax[:n] < nsrc))


def tplan_validate(pend) -> bool:
    rec = pend["rec"]
    try:
        if int(np.asarray(pend["km"])) != rec["km"]:
            return False
        if rec.get("p") is not None and \
                not _covers(pend["p_minmax"], rec["p"]):
            return False
        if rec.get("m") is not None:
            if pend["m_minmax"] is None or \
                    not _covers(pend["m_minmax"], rec["m"]):
                return False
        return True
    except Exception:
        return False


def _gather_spmv(cols, vals, x, base, wr, nsrc):
    if wr is not None and x.dtype == jnp.float32:
        return gp.windowed_gather_spmv(cols, vals, x, base, wr, nsrc)
    g = jnp.take(x, cols, axis=0)
    return jnp.sum(vals.astype(x.dtype) * g, axis=0)


def prolong_fast(tp: TransferPlan, xc: jnp.ndarray,
                 out_len: int) -> jnp.ndarray:
    """P @ xc via the windowed gather (XLA fallback without a plan)."""
    y = _gather_spmv(tp.p_cols, tp.p_vals, xc, tp.p_base, tp.p_wr,
                     tp.p_nsrc)
    return y[:out_len]


def restrict_fast(tp: TransferPlan, v: jnp.ndarray) -> jnp.ndarray:
    """Pᵀ @ v via the members gather (XLA fallback without a plan)."""
    y = _gather_spmv(tp.m_cols, tp.m_vals, v, tp.m_base, tp.m_wr,
                     tp.m_nsrc)
    if tp.m_ov_cols is not None:
        g = jnp.take(v, tp.m_ov_cols, axis=0)
        y = y.at[tp.m_ov_rows].add(tp.m_ov_vals.astype(v.dtype) * g)
    return y[: tp.nc_pad]


def build_transfer_plan_from_p(p: ELL, pt: ELL, nc_pad: int
                               ) -> TransferPlan:
    """Transfer plan from an explicit (possibly smoothed / non-unit)
    prolongation ELL and its transpose: prolongation = P's own gather
    SpMV over the coarse vector, restriction = Pᵀ's over the fine one."""

    def pad_rows(e: ELL) -> ELL:
        npad_t = _round_up(e.npad, gp.T)
        if npad_t == e.npad:
            return e
        import dataclasses
        return dataclasses.replace(
            e, cols=jnp.pad(e.cols, ((0, 0), (0, npad_t - e.npad))),
            vals=jnp.pad(e.vals, ((0, 0), (0, npad_t - e.npad))),
            rownnz=jnp.pad(e.rownnz, (0, npad_t - e.npad)),
            base_blk=None, wr=None, nsrc=None)

    from ..sparse.formats import with_device_plan
    p = with_device_plan(pad_rows(p)) if p.base_blk is None else p
    pt = with_device_plan(pad_rows(pt)) if pt.base_blk is None else pt
    return TransferPlan(
        p_cols=p.cols, p_vals=p.vals, p_base=p.base_blk,
        m_cols=pt.cols, m_vals=pt.vals, m_base=pt.base_blk,
        p_wr=p.wr, p_nsrc=p.nsrc, m_wr=pt.wr, m_nsrc=pt.nsrc,
        npad_f=p.npad, nc_pad=nc_pad, weighted=True)
