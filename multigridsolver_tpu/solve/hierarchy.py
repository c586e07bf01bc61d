"""Multigrid hierarchy and cycles.

The reference is strictly two-level: exact sparse-LU of Ac plus an ILUT
smoother, combined additively or multiplicatively
(``src/CPU_C++/main.cpp:21-77``, ``src/common/bicg.cpp:19-62``,
``solve.m:15-25``).  Sparse LU does not map to the TPU; the TPU-native
design generalises to a *multilevel* hierarchy (the Fortran ground truth
itself allows maxlev=40 — ``dagtwolev_mex.f90:101``): keep coarsening until
the coarsest operator is small enough to LU-factorise **densely** on the
MXU, smooth the intermediate levels, and traverse with V- or K-cycles
(Notay's K-cycle: the recursive correction is accelerated by two steps of
flexible CG at every level).

The classic reference combination is still available: a 2-level hierarchy's
``precondition`` with ``pre_smooth=0, post_smooth=1`` is algebraically
exactly ``main.cpp:70-72``'s multiplicative combo  c + S(v − A·c)  with the
smoother S standing in for ILUT.

All structures are pytrees; `precondition` is pure and jittable; levels are
unrolled statically (the level count is host-known after setup).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import ELL
from ..sparse import ops
from ..setup.prolongation import prolong, restrict
from ..utils.diskstore import JsonStore
from .smoothers import Smoother, make_smoother

# hierarchy ladder: recorded hybrid/transfer structure per level-shape
# signature (see build_hierarchy)
_HLADDER = JsonStore("hier_ladder.json")


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "labels", "smoother", "tplan"],
         meta_fields=["nc_pad"])
@dataclass
class Level:
    """One grid level: its operator, the fine→coarse labels defining P, and
    the smoother state.  ``labels`` is (npad,) int32 with -1 for nodes kept
    out of the coarse space (G0 nodes, AGMG.cpp:118-123).  ``tplan`` (may
    be None) carries the windowed-gather transfer plans — kernel-speed
    prolong/restrict (setup/transfers.py)."""

    a: ELL
    labels: jnp.ndarray
    smoother: Smoother
    tplan: object | None
    nc_pad: int


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "lu", "piv"], meta_fields=["m"])
@dataclass
class CoarseSolve:
    """Dense LU of the coarsest operator (MXU-friendly; replaces the
    reference's Eigen SparseLU, main.cpp:47-48).  Padding rows carry an
    identity block so the factorisation is well-posed.

    The factorisation runs at TIGHT padding ``m`` (logical size rounded
    to 8), not the level's 1024-row device padding: the triangular
    solves are sequential in the matrix dimension, so a 1024-wide LU
    costs ~6x a 176-wide one per application — and the K-cycle visits
    the coarsest level up to 2^depth times per cycle."""

    a: ELL
    lu: jnp.ndarray
    piv: jnp.ndarray
    m: int

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        xm = jax.scipy.linalg.lu_solve((self.lu, self.piv), b[: self.m])
        if b.shape[0] == self.m:
            return xm
        return jnp.zeros_like(b).at[: self.m].set(xm)


@partial(jax.jit, static_argnames=("m",))
def _coarse_factor(a: ELL, m: int):
    """Dense assembly + LU of the coarsest operator as ONE program (the
    eager form dispatched ~6 programs, incl. a scatter-add whose solo
    compile cost 6.4 s cold; fused and pool-warmed it is off the
    critical path)."""
    dense = ops.to_dense(a)
    full = jnp.zeros((m, m), dtype=a.vals.dtype)
    full = full.at[: a.nrows, : min(a.ncols, m)].set(
        dense[:, : min(a.ncols, m)])
    # identity on padding (and on any empty all-zero rows, which would
    # otherwise make the factorisation singular — e.g. excluded G0 rows)
    empty = jnp.all(full == 0.0, axis=1)
    full = full + jnp.diag(jnp.where(empty, 1.0, 0.0).astype(a.vals.dtype))
    return jax.scipy.linalg.lu_factor(full)


def make_coarse_solve(a: ELL) -> CoarseSolve:
    from ..utils import precompile as pool
    m = min(max((a.nrows + 7) // 8 * 8, 8), a.npad)
    lu, piv = pool.call(_coarse_factor, a, m=m)
    return CoarseSolve(a=a, lu=lu, piv=piv, m=m)


@partial(jax.tree_util.register_dataclass,
         data_fields=["levels", "coarse"],
         meta_fields=["cycle", "pre_smooth", "post_smooth", "kcycle_steps",
                      "kcycle_depth", "combination"])
@dataclass
class Hierarchy:
    levels: tuple[Level, ...]
    coarse: CoarseSolve
    cycle: str = "vcycle"        # twolevel | vcycle | kcycle
    pre_smooth: int = 0
    post_smooth: int = 1
    kcycle_steps: int = 2
    # how the coarse correction and the smoother combine at each level:
    # "multiplicative" (main.cpp:70-72: c + S(v − A·c)) or "additive"
    # (main.cpp:74: c + S(v) — both applied to the same input, summed)
    combination: str = "multiplicative"
    # apply the inner-Krylov acceleration only on the finest kcycle_depth
    # levels: the recursion multiplies work by kcycle_steps per level, so
    # unbounded depth costs 2^L coarse visits for little extra convergence
    kcycle_depth: int = 3

    @property
    def nlevels(self) -> int:
        return len(self.levels) + 1

    def precondition(self, b: jnp.ndarray) -> jnp.ndarray:
        """Apply one multigrid cycle as M⁻¹ b (zero initial guess)."""
        return _cycle(self, 0, b)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.levels:
            return ops.spmv(self.levels[0].a, x)
        return ops.spmv(self.coarse.a, x)


def _coarse_correct(level: Level, hier: Hierarchy, idx: int,
                    r: jnp.ndarray) -> jnp.ndarray:
    from ..setup import transfers as tf
    tp = level.tplan
    # weighted plans (smoothed P) are authoritative — the label fallback
    # would apply the wrong operator; unit plans fall back only when no
    # kernel plan exists for the direction
    if tp is not None and (tp.weighted or tp.m_base is not None):
        rc = tf.restrict_fast(tp, r)
    else:
        rc = restrict(level.labels, r, level.nc_pad)
    if (hier.cycle == "kcycle" and idx + 1 < len(hier.levels)
            and idx + 1 <= hier.kcycle_depth):
        xc = _kcycle_accel(hier, idx + 1, rc)
    else:
        xc = _cycle(hier, idx + 1, rc)
    if tp is not None and (tp.weighted or tp.p_base is not None):
        return tf.prolong_fast(tp, xc, r.shape[0])
    return prolong(level.labels, xc)


def _cycle(hier: Hierarchy, idx: int, b: jnp.ndarray) -> jnp.ndarray:
    if idx == len(hier.levels):
        return hier.coarse.solve(b)
    level = hier.levels[idx]
    a = level.a
    if hier.combination == "additive":
        # additive two-level combo (main.cpp:74): coarse correction and
        # smoother both act on b, results summed — cheaper per application
        # (no extra fine SpMV), weaker than the multiplicative form
        return (_coarse_correct(level, hier, idx, b)
                + level.smoother.solve(a, b))
    if hier.pre_smooth == 0:
        # start from the coarse-grid correction of b itself — with one
        # post-smooth this reproduces the reference's multiplicative
        # two-level combo c + S(b − A c) (main.cpp:70-72)
        x = _coarse_correct(level, hier, idx, b)
    else:
        x = level.smoother.solve(a, b)
        for _ in range(hier.pre_smooth - 1):
            x = level.smoother.apply(a, b, x)
        r = b - ops.spmv(a, x)
        x = x + _coarse_correct(level, hier, idx, r)
    for _ in range(hier.post_smooth):
        x = level.smoother.apply(a, b, x)
    return x


def _kcycle_accel(hier: Hierarchy, idx: int, b: jnp.ndarray) -> jnp.ndarray:
    """Notay K-cycle: approximate A_idx⁻¹ b by `kcycle_steps` iterations of
    flexible CG preconditioned with the cycle at this level.  Statically
    unrolled (steps is 1-2 in practice)."""
    a = hier.levels[idx].a if idx < len(hier.levels) else hier.coarse.a
    x = jnp.zeros_like(b)
    r = b
    dirs: list[tuple[jnp.ndarray, jnp.ndarray]] = []
    for _ in range(hier.kcycle_steps):
        z = _cycle(hier, idx, r)
        # flexible-CG orthogonalisation against previous directions
        p = z
        for (pj, apj, denom) in dirs:
            beta = jnp.vdot(apj, p) / denom
            p = p - beta * pj
        ap = ops.spmv(a, p)
        denom = jnp.vdot(p, ap)
        alpha = jnp.where(denom != 0.0, jnp.vdot(p, r) / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        dirs.append((p, ap, denom))
    return x


def build_hierarchy(a: ELL, level_labels: list[np.ndarray | jnp.ndarray],
                    coarse_ops: list[ELL], smoother_kind: str = "chebyshev",
                    cycle: str = "vcycle", pre_smooth: int = 0,
                    post_smooth: int = 1, use_hybrid: bool = True,
                    kcycle_depth: int = 3,
                    combination: str = "multiplicative",
                    p_ops: list[ELL] | None = None,
                    pt_ops: list[ELL] | None = None,
                    _use_ladder: bool = True,
                    **smoother_kw) -> Hierarchy:
    """Assemble a Hierarchy from setup outputs.

    ``level_labels[l]``: labels taking level-l row space → level-(l+1)
    aggregates.  ``coarse_ops[l]``: the level-(l+1) operator (so
    ``len(coarse_ops) == len(level_labels)``).

    ``use_hybrid``: repack each level operator into the DIA+ELL hybrid so
    solve-phase SpMVs run at vector speed instead of gather speed (20x on
    the stencil suites — see sparse/hybrid.py).
    """
    from ..sparse import hybrid as hyb
    from ..ops import gather_pallas as gp
    from ..setup.transfers import (transfer_plan_staged, tplan_record,
                                   tplan_replay, tplan_validate)
    from ..utils.staging import drive

    use_plans = jax.default_backend() == "tpu" or gp.INTERPRET
    mats = [a] + list(coarse_ops)
    labs = []
    for l, labels in enumerate(level_labels):
        fine = mats[l]
        lab = jnp.asarray(labels, dtype=jnp.int32)
        if lab.shape[0] < fine.npad:
            lab = jnp.concatenate([
                lab, jnp.full((fine.npad - lab.shape[0],), -1, jnp.int32)])
        elif lab.shape[0] > fine.npad:
            # labels born at the setup tail shape (aggregation._TAIL_NPAD)
            # on a narrower fine level: rows beyond fine.npad are tail
            # padding (rownnz = 0 ⇒ excluded ⇒ label -1), safe to drop
            lab = lab[: fine.npad]
        labs.append(lab)

    nlv = len(level_labels)
    from ..utils import precompile as _pool
    mc = min(max((mats[-1].nrows + 7) // 8 * 8, 8), mats[-1].npad)
    _pool.warm(_coarse_factor, _pool.abstract_of(mats[-1]), m=mc)

    # hierarchy ladder: replay the recorded hybrid splits + transfer
    # plans with no host sync; validate the streamed scalars at the end
    # (same pattern as the setup ladder — see setup/aggregation.py)
    hkey = None
    pendings: list = []
    staged = None
    per_level = (1 if use_hybrid else 0) + (
        1 if (use_plans and p_ops is None) else 0)
    if use_hybrid and use_plans and p_ops is None and _use_ladder:
        import json
        hkey = json.dumps([[(m.npad, m.k, m.wr) for m in mats],
                           smoother_kind])
        lad = _HLADDER.get(hkey)
        if lad is not None:
            staged = []
            try:
                for l in range(nlv):
                    h, pend_h = hyb.hybrid_replay(mats[l],
                                                  lad["hyb"][l])
                    tp, pend_t = tplan_replay(labs[l], mats[l + 1].npad,
                                              lad["tp"][l])
                    staged += [h, tp]
                    pendings += [pend_h, pend_t]
            except Exception:
                staged = None
                pendings = []

    if staged is None:
        # build every level's hybrid split + transfer plan as staged
        # generators driven in lockstep: each stage's host readbacks
        # across ALL levels batch into one device_get (over the TPU
        # tunnel a blocking readback is ~50 ms, so the serial per-level
        # form spent seconds in pure round-trips — utils/staging.py)
        gens = []
        for l in range(nlv):
            if use_hybrid:
                gens.append(hyb.hybrid_staged(mats[l]))
            if use_plans and p_ops is None:
                gens.append(transfer_plan_staged(labs[l],
                                                 mats[l + 1].npad))
        staged = drive(gens)
        if hkey is not None and _HLADDER.get(hkey) is None:
            hrecs = [hyb.hybrid_record(staged[l * per_level])
                     for l in range(nlv)]
            trecs = [tplan_record(staged[l * per_level + 1])
                     for l in range(nlv)]
            if all(r is not None for r in hrecs + trecs):
                _HLADDER.put(hkey, {"hyb": hrecs, "tp": trecs})

    if smoother_kind == "chebyshev":
        # every level's operator is concrete now: compile all power
        # iterations concurrently (the per-level scan compiles were the
        # cold hierarchy build's dominator) — make_smoother below picks
        # each executable up through the pool
        from ..utils import precompile as pool
        from .smoothers import estimate_lmax
        for l in range(nlv):
            op_l = staged[l * per_level] if use_hybrid else mats[l]
            dt = getattr(op_l, "dtype", None) or op_l.vals.dtype
            pool.warm(estimate_lmax, pool.abstract_of(op_l),
                      jax.ShapeDtypeStruct((op_l.npad,), dt))

    levels = []
    for l in range(nlv):
        fine, coarse = mats[l], mats[l + 1]
        base = l * per_level
        op = staged[base] if use_hybrid else fine
        if p_ops is not None:
            from ..setup.transfers import build_transfer_plan_from_p
            tplan = build_transfer_plan_from_p(p_ops[l], pt_ops[l],
                                               coarse.npad)
        else:
            tplan = staged[base + (1 if use_hybrid else 0)] \
                if use_plans else None
        sm = make_smoother(op, kind=smoother_kind, ell=fine, **smoother_kw)
        levels.append(Level(a=op, labels=labs[l], smoother=sm, tplan=tplan,
                            nc_pad=coarse.npad))
    coarse_solve = make_coarse_solve(mats[-1])
    if pendings:
        ok = all((hyb.hybrid_validate(p) if p["kind"] == "hyb"
                  else tplan_validate(p)) for p in pendings)
        if not ok:
            return build_hierarchy(
                a, level_labels, coarse_ops, smoother_kind=smoother_kind,
                cycle=cycle, pre_smooth=pre_smooth,
                post_smooth=post_smooth, use_hybrid=use_hybrid,
                kcycle_depth=kcycle_depth, combination=combination,
                p_ops=p_ops, pt_ops=pt_ops, _use_ladder=False,
                **smoother_kw)
    return Hierarchy(levels=tuple(levels), coarse=coarse_solve,
                     cycle=cycle, pre_smooth=pre_smooth,
                     post_smooth=post_smooth, kcycle_depth=kcycle_depth,
                     combination=combination)
