"""Hierarchy checkpoint / resume.

The reference's only persistence is writing P to
``matrices/<name>promatrix_*.mtx`` (``main.cu:291``, ``main.cpp:224``),
which acts as its setup/solve checkpoint boundary (``bicg.cpp:151`` reads
it back).  The TPU framework formalises this (SURVEY §5): the *entire*
hierarchy — per-level operators, labels, smoother state, coarse LU — is
one pytree, serialised to a single ``.npz`` with a JSON manifest of the
static metadata.  A solve can resume from a saved hierarchy without
redoing setup, and the promatrix interchange files remain available via
``setup.prolongation.p_csr_from_labels`` for cross-checking with the
reference binaries.
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from ..solve.hierarchy import Hierarchy

_FORMAT_VERSION = 1


def _replan_weighted(tp):
    """Recompute the windowed-gather plans of a reloaded weighted
    transfer (slot validity by val != 0 — junk gathered at truly-zero
    weights multiplies by 0, so this is safe)."""
    import dataclasses
    from ..ops import gather_pallas as gp
    from ..sparse.formats import plans_enabled
    if not plans_enabled():
        return tp
    out = {}
    for side, cols, vals, ncols in (
            ("p", tp.p_cols, tp.p_vals, tp.nc_pad),
            ("m", tp.m_cols, tp.m_vals, tp.npad_f)):
        ntiles = cols.shape[1] // gp.T
        if ntiles == 0 or cols.shape[1] % gp.T:
            continue
        cmin, cmax = gp.plan_minmax_masked(cols, vals != 0, ntiles)
        plan = gp.plan_from_minmax(np.asarray(cmin), np.asarray(cmax),
                                   ncols)
        if plan is not None:
            b, wr, nsrc = plan
            out[f"{side}_base"] = jnp.asarray(b)
            out[f"{side}_wr"] = wr
            out[f"{side}_nsrc"] = nsrc
    return dataclasses.replace(tp, **out)


def _strip_derived(hier: Hierarchy) -> Hierarchy:
    """Drop derived kernel plans before flattening: the windowed-gather
    plans (HYB base_blk / Level tplan) are rebuilt at load, keeping the
    on-disk leaf layout stable across backends."""
    import dataclasses
    from ..sparse.formats import ELL
    from ..sparse.hybrid import HYB

    def strip_ell(e):
        return dataclasses.replace(e, base_blk=None, wr=None, nsrc=None,
                                   roll_ov=None, roll_offsets=None) \
            if isinstance(e, ELL) else e

    from ..sparse.hybrid import merge_overflow_host as merge_overflow

    levels = []
    for lvl in hier.levels:
        a = lvl.a
        if isinstance(a, HYB):
            a = merge_overflow(a)
            a = dataclasses.replace(a, ell=strip_ell(a.ell), base_blk=None,
                                    wr=None, nsrc_pad=None)
        else:
            a = strip_ell(a)
        # unit (label-derived) transfer plans rebuild from labels at load;
        # WEIGHTED ones (smoothed aggregation) carry real operator data —
        # keep their arrays, strip only the derived window plans
        tp = lvl.tplan
        if getattr(tp, "weighted", False):
            tp = dataclasses.replace(tp, p_base=None, m_base=None,
                                     p_wr=None, p_nsrc=None, m_wr=None,
                                     m_nsrc=None)
        else:
            tp = None
        sm = lvl.smoother
        if sm.lmat is not None:     # ilu0 factors: strip derived plans
            sm = dataclasses.replace(sm, lmat=strip_ell(sm.lmat),
                                     umat=strip_ell(sm.umat))
        levels.append(dataclasses.replace(lvl, a=a, tplan=tp, smoother=sm))
    coarse = dataclasses.replace(hier.coarse, a=strip_ell(hier.coarse.a))
    return dataclasses.replace(hier, levels=tuple(levels), coarse=coarse)


def save_hierarchy(path: str, hier: Hierarchy) -> None:
    hier = _strip_derived(hier)
    leaves, treedef = jax.tree_util.tree_flatten(hier)
    meta = {
        "version": _FORMAT_VERSION,
        "nlevels": hier.nlevels,
        "cycle": hier.cycle,
        "pre_smooth": hier.pre_smooth,
        "post_smooth": hier.post_smooth,
        "kcycle_steps": hier.kcycle_steps,
        "kcycle_depth": hier.kcycle_depth,
        "combination": hier.combination,
        "levels": [
            {"nrows": lvl.a.nrows, "ncols": lvl.a.ncols,
             "nc_pad": lvl.nc_pad,
             "is_hybrid": hasattr(lvl.a, "offsets"),
             "tplan_weighted": bool(getattr(lvl.tplan, "weighted", False)),
             "tplan_m_ov": getattr(lvl.tplan, "m_ov_cols", None)
             is not None,
             "tplan_npad_f": getattr(lvl.tplan, "npad_f", 0),
             "offsets": list(getattr(lvl.a, "offsets", ())),
             "has_rest": getattr(lvl.a, "ell", None) is not None,
             "has_ilu": lvl.smoother.lmat is not None,
             "smoother": {
                 "kind": lvl.smoother.kind, "sweeps": lvl.smoother.sweeps,
                 "omega": lvl.smoother.omega, "degree": lvl.smoother.degree,
                 "lmin_frac": lvl.smoother.lmin_frac,
                 "inner_sweeps": lvl.smoother.inner_sweeps}}
            for lvl in hier.levels],
        "coarse": {"nrows": hier.coarse.a.nrows,
                   "ncols": hier.coarse.a.ncols},
    }
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez_compressed(path, manifest=json.dumps(meta), **arrays)


def load_hierarchy(path: str, dtype=None) -> Hierarchy:
    from ..sparse.formats import ELL
    from ..sparse.hybrid import HYB
    from ..solve.hierarchy import Level, CoarseSolve
    from ..solve.smoothers import Smoother

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["manifest"]))
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['version']}")
    leaves = [jnp.asarray(data[f"leaf_{i}"])
              for i in range(len(data.files) - 1)]
    it = iter(leaves)

    def next_n(k):
        return [next(it) for _ in range(k)]

    levels = []
    for lm in meta["levels"]:
        if lm["is_hybrid"]:
            dvals = next(it)
            ell = None
            if lm["has_rest"]:
                cols, vals, rownnz = next_n(3)
                ell = ELL(cols=cols, vals=vals, rownnz=rownnz,
                          nrows=lm["nrows"], ncols=lm["ncols"])
            from ..sparse.hybrid import _attach_gather_plan
            ell, base_blk, wr, nsrc_pad, ov = _attach_gather_plan(ell)
            a = HYB(dvals=dvals, ell=ell, base_blk=base_blk, ov=ov,
                    offsets=tuple(lm["offsets"]),
                    nrows=lm["nrows"], ncols=lm["ncols"],
                    wr=wr, nsrc_pad=nsrc_pad)
        else:
            cols, vals, rownnz = next_n(3)
            a = ELL(cols=cols, vals=vals, rownnz=rownnz,
                    nrows=lm["nrows"], ncols=lm["ncols"])
        from ..ops import gather_pallas as gp
        labels = next(it)
        d, lmax = next_n(2)
        lmat = umat = udiag = None
        if lm.get("has_ilu"):
            from ..sparse.formats import with_device_plan
            lc, lv, lr = next_n(3)
            uc, uv, ur = next_n(3)
            udiag = next(it)
            lmat = with_device_plan(ELL(cols=lc, vals=lv, rownnz=lr,
                                        nrows=lm["nrows"],
                                        ncols=lm["ncols"]))
            umat = with_device_plan(ELL(cols=uc, vals=uv, rownnz=ur,
                                        nrows=lm["nrows"],
                                        ncols=lm["ncols"]))
        sm = Smoother(d=d, lmax=lmax, lmat=lmat, umat=umat, udiag=udiag,
                      **lm["smoother"])
        tplan = None
        if lm.get("tplan_weighted"):
            from ..setup.transfers import TransferPlan
            p_cols, p_vals, m_cols, m_vals = next_n(4)
            ov = next_n(3) if lm.get("tplan_m_ov") else (None, None, None)
            tplan = _replan_weighted(
                TransferPlan(p_cols=p_cols, p_vals=p_vals, p_base=None,
                             m_cols=m_cols, m_vals=m_vals, m_base=None,
                             p_wr=None, p_nsrc=None, m_wr=None,
                             m_nsrc=None, npad_f=lm["tplan_npad_f"],
                             nc_pad=lm["nc_pad"], weighted=True,
                             m_ov_rows=ov[0], m_ov_cols=ov[1],
                             m_ov_vals=ov[2]))
        if tplan is None and (jax.default_backend() == "tpu"
                              or gp.INTERPRET):
            from ..setup.transfers import build_transfer_plan
            tplan = build_transfer_plan(jnp.asarray(labels, jnp.int32),
                                        lm["nc_pad"])
        levels.append(Level(a=a, labels=labels, smoother=sm, tplan=tplan,
                            nc_pad=lm["nc_pad"]))
    ca_cols, ca_vals, ca_rownnz, lu, piv = next_n(5)
    coarse = CoarseSolve(
        a=ELL(cols=ca_cols, vals=ca_vals, rownnz=ca_rownnz,
              nrows=meta["coarse"]["nrows"], ncols=meta["coarse"]["ncols"]),
        lu=lu, piv=piv, m=int(lu.shape[0]))
    return Hierarchy(levels=tuple(levels), coarse=coarse,
                     cycle=meta["cycle"], pre_smooth=meta["pre_smooth"],
                     post_smooth=meta["post_smooth"],
                     kcycle_steps=meta["kcycle_steps"],
                     kcycle_depth=meta["kcycle_depth"],
                     combination=meta.get("combination", "multiplicative"))
