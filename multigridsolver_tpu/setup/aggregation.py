"""Multi-pass pairwise aggregation driver and full hierarchy setup.

Orchestration mirrors the reference's pass loop
(``src/CPU_C++/AGMG.cpp:299-315``, ``src/GPU_CUDAC++/main.cu:95-277``):

  pass 1:  strength + G0 exclusion on A, matching → labels¹ (n → nc₁)
  pass s:  strength on the *coarse* matrix A̅ (no exclusions), matching
           → pass labels (nc₋₁ → nc), composed into the fine labels
           (label composition replaces the reference's P_cumm·P SpGEMM,
           main.cu:255-261)
  early exit when nnz(A̅) ≤ nnz(A)/τ (AGMG.cpp:309 / main.cu:100) or
  the coarse grid is smaller than ``max_restriction`` (AGMG.cpp:310).

The host reads back only nc and nnz per pass — the same scalars the CUDA
host reads (main.cu:189-214); everything else stays on device.

``build_amg_setup`` extends this to a full multilevel hierarchy (each level
runs one npass aggregation round on the previous coarse operator), which
the reference caps at two levels but its Fortran ground truth allows up to
maxlev=40 (dagtwolev_mex.f90:101).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import CSR, ELL
from ..utils.config import AggregationConfig, HierarchyConfig
from ..utils.timing import PhaseTimer
from .strength import compute_strength
from .matching import (mutual_match, labels_from_pairs, greedy_match_host,
                       cmk_order_host)
from .galerkin import galerkin_ell, galerkin_pair_ell, member_window_minmax
from .prolongation import compose_labels


@dataclass
class PassInfo:
    nc: int
    nnz: int
    rounds: int = 0


@dataclass
class AggregationResult:
    labels: jnp.ndarray          # (npad,) fine row → final aggregate (or -1)
    nc: int
    coarse: ELL                  # final coarse operator of this round
    passes: list[PassInfo] = field(default_factory=list)


@partial(jax.jit, static_argnames=("first_pass", "ktg", "checkdd", "trspos",
                                   "fracnegrcsum", "max_rounds", "symmetric",
                                   "mu_mode"))
def _match_pass(a: ELL, first_pass: bool, ktg: float, checkdd: float,
                trspos: float, fracnegrcsum: float, max_rounds: int,
                symmetric: bool = False, mu_mode: str = "simple"):
    st = compute_strength(a, ktg, first_pass, checkdd=checkdd,
                          trspos=trspos, fracnegrcsum=fracnegrcsum,
                          symmetric=symmetric, mu_mode=mu_mode)
    paired = mutual_match(a, st, max_rounds=max_rounds)
    labels, nc = labels_from_pairs(paired, st.excluded, a=a)
    # pack nc together with the members-plan min/max so the host learns
    # everything it needs from ONE readback (~35 ms per tunnel sync)
    mem_cmin, mem_cmax = member_window_minmax(labels)
    packed = jnp.concatenate([nc[None].astype(jnp.int32),
                              mem_cmin, mem_cmax])
    return paired, labels, packed, st.si, st.zerors


@partial(jax.jit, static_argnames=("wr_m", "nc_bound"))
def _galerkin_bound(a: ELL, paired, labels, wr_m: int, nc_bound: int):
    """Pairwise Galerkin at the static coarse bound ``nc_bound`` with
    anchored member windows of half-size ``wr_m`` (bases computed here
    from the member min/max; the ``fits`` flag reports coverage AND
    nc ≤ nc_bound).  Runs as its OWN program: matching and Galerkin are
    dispatched back-to-back without a host sync in between — fusing them
    into one giant XLA program was observed to miscompile at csky3d(80)
    scale (≈19 % of coarse rows silently dropped), while the split
    programs are exact.

    Packed layout: [nnz_c, max_deg, fits, ocmin(ntb)…, ocmax(ntb)…].
    """
    from .galerkin import galerkin_pair_arrays
    mem_cmin, mem_cmax = member_window_minmax(labels)
    nc = jnp.max(labels) + 1
    npad = a.npad
    w = wr_m * 128
    nsrc_m = ((npad + 2 * w + 127) // 128) * 128
    max_base = max(nsrc_m // w - 2, 0)
    ntb = nc_bound // 1024
    base_m = jnp.clip(mem_cmin[:ntb] // w, 0, max_base)
    fits = (jnp.all(mem_cmax[:ntb] < (base_m.astype(jnp.int64) + 2) * w)
            & (nc <= nc_bound))
    cols, vals, rownnz, info = galerkin_pair_arrays(
        a, paired, labels, nc_bound, base_m, wr_m, nsrc_m)
    packed = jnp.concatenate([
        jnp.stack([info[0], info[1], fits.astype(jnp.int32)]), info[2:]])
    return cols, vals, rownnz, packed


@jax.jit
def _concat_packed(p1, p2):
    return jnp.concatenate([p1, p2])


@partial(jax.jit, static_argnames=("kc_eff", "nc_pad"))
def _slice_coarse(cols, vals, rownnz, kc_eff: int, nc_pad: int):
    return (cols[:kc_eff, :nc_pad], vals[:kc_eff, :nc_pad],
            jnp.minimum(rownnz[:nc_pad], kc_eff).astype(jnp.int32))


@partial(jax.jit, static_argnames=("ktg", "checkdd", "trspos",
                                   "fracnegrcsum", "max_rounds", "symmetric",
                                   "mu_mode", "km", "retries"))
def _match_pass_checked(a: ELL, a0: ELL, si0: jnp.ndarray,
                        cum_labels: jnp.ndarray, zerors: jnp.ndarray,
                        ktg: float, checkdd: float, trspos: float,
                        fracnegrcsum: float, max_rounds: int,
                        symmetric: bool, mu_mode: str, km: int,
                        retries: int = 3):
    """Further-pass matching with the checktentagg PSD re-check.

    The reference's runner-up walk (rtent/jtent, f90:969-1017) becomes:
    match → batch-test all tentative merges in the ORIGINAL matrix →
    remove failed pairs' edges from the allowed mask → re-match, so every
    rejected node proposes to its next-best surviving neighbour.  After
    ``retries`` rounds the still-failing pairs break into singletons
    (the Fortran's terminal case when the candidate list is exhausted).
    """
    from .tentagg import checktentagg
    st = compute_strength(a, ktg, False, checkdd=checkdd, trspos=trspos,
                          fracnegrcsum=fracnegrcsum, symmetric=symmetric,
                          mu_mode=mu_mode)
    npad = a.npad
    nodes = jnp.arange(npad, dtype=jnp.int32)
    allowed = st.allowed
    paired = jnp.full((npad,), -1, jnp.int32)
    fail = jnp.zeros((npad,), bool)
    for _ in range(retries):
        paired = mutual_match(a, st._replace(allowed=allowed),
                              max_rounds=max_rounds)
        acc = checktentagg(a0, si0, cum_labels, a, paired,
                           float(ktg), zerors, km)
        fail = ~acc & (paired >= 0) & (paired != nodes)
        partner = jnp.where(paired >= 0, paired, -1)
        allowed = allowed & ~(fail[None, :] & (a.cols == partner[None, :]))
    paired = jnp.where(fail, nodes, paired)      # exhausted → singleton
    labels, nc = labels_from_pairs(paired, st.excluded, a=a)
    mem_cmin, mem_cmax = member_window_minmax(labels)
    packed = jnp.concatenate([nc[None].astype(jnp.int32),
                              mem_cmin, mem_cmax])
    return paired, labels, packed


def _unpack_match(a: ELL, packed_np: np.ndarray):
    """Host tail of _match_pass: nc + the members window plan."""
    from ..sparse.formats import plans_enabled
    from ..ops import gather_pallas as gp
    nc = int(packed_np[0])
    m_plan = None
    ntiles_m = (packed_np.shape[0] - 1) // 2
    multishard = getattr(getattr(a.cols, "sharding", None), "device_set",
                         None)
    if (ntiles_m and nc > 0 and plans_enabled()
            and (multishard is None or len(multishard) <= 1)):
        nc_pad = ((nc + 1023) // 1024) * 1024
        ntc = nc_pad // 1024
        plan = gp.plan_from_minmax(packed_np[1:1 + ntc],
                                   packed_np[1 + ntiles_m:1 + ntiles_m + ntc],
                                   a.npad)
        if plan is not None:
            base, wr, nsrc = plan
            m_plan = (jnp.asarray(base), wr, nsrc)
    return nc, m_plan


def paired_from_labels_host(labels_np: "np.ndarray") -> "np.ndarray":
    """Reconstruct the pair array from pairwise labels (host): members of a
    shared label become partners; singletons pair with themselves."""
    n = labels_np.shape[0]
    paired = np.full(n, -1, np.int64)
    order = np.argsort(labels_np, kind="stable")
    lab_sorted = labels_np[order]
    first = np.ones(n, bool)
    first[1:] = lab_sorted[1:] != lab_sorted[:-1]
    # positions of aggregate starts in the sorted order
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, n))
    for s, sz in zip(starts, sizes):
        if lab_sorted[s] < 0:
            continue
        members = order[s: s + sz]
        if sz == 1:
            paired[members[0]] = members[0]
        elif sz == 2:
            paired[members[0]] = members[1]
            paired[members[1]] = members[0]
        else:
            raise ValueError("labels are not pairwise")
    return paired


def _greedy_pass(a: ELL, first_pass: bool, cfg: AggregationConfig):
    """Host-exact greedy pass (parity mode, float64 on CSR).

    Runs in the native C++ runtime (io/native.py → native/mgio.cpp) when
    libmgio is built — the pure-Python loops are O(n·deg²) and only keep
    small parity fixtures honest; poisson1000-scale parity needs C++."""
    from ..io.native import cmk_order_native, greedy_pass_native
    csr = a.to_csr()
    st = compute_strength(a.astype(jnp.float64), cfg.ktg, first_pass,
                          checkdd=cfg.checkdd, trspos=cfg.trspos,
                          fracnegrcsum=cfg.fracnegrcsum)
    excluded = np.asarray(st.excluded)[: csr.nrows]
    si = np.asarray(st.si)[: csr.nrows]
    if first_pass:
        genuine = cfg.cmk_mode == "genuine"
        order = cmk_order_native(csr, genuine=genuine)
        if order is None:
            if genuine:
                from .matching import cmk_order_genuine_host
                order = cmk_order_genuine_host(csr)
            else:
                order = cmk_order_host(csr)
    else:
        order = np.arange(csr.nrows)
    diag = np.asarray(st.diag)[: csr.nrows]
    labels_np = greedy_pass_native(csr, diag, si, excluded, order, cfg.ktg)
    if labels_np is None:
        labels_np = greedy_match_host(csr, cfg.ktg, excluded, si, order)
    nc = int(labels_np.max()) + 1 if (labels_np >= 0).any() else 0
    labels = jnp.full((a.npad,), -1, jnp.int32)
    labels = labels.at[: csr.nrows].set(jnp.asarray(labels_np))
    return labels, nc


def pairwise_aggregate(a: ELL, cfg: AggregationConfig,
                       timer: PhaseTimer | None = None,
                       nnz0: int | None = None) -> AggregationResult:
    """One AGMG setup round: npass pairwise passes over ``a``.

    ``nnz0`` lets the caller pass a host-known nnz to avoid a device
    readback (ELL.nnz costs a tunnel round-trip)."""
    timer = timer or PhaseTimer(enabled=False)
    if nnz0 is None:
        nnz0 = a.nnz
    passes: list[PassInfo] = []

    pass1_state = {}

    def run_fused(mat: ELL, first: bool):
        """One-readback fused pass; returns (paired, labels, nc, coarse
        ELL with plan, nnz_c) or None when the member window ladder is
        exhausted (caller falls back to the two-program path)."""
        from ..ops import gather_pallas as gp
        from ..sparse.formats import plans_enabled
        wr_m = min(128, max(16, 2 * (mat.wr or 16)))
        # pass 1's coarse bound is free (nc ≤ n always); later passes
        # speculate 62.5 % — pairing below ~40 % trips the fits flag and
        # falls back to the two-program path (rare)
        if first:
            nc_bound = mat.npad
        else:
            nc_bound = min(mat.npad,
                           ((int(0.625 * mat.npad) + 1023) // 1024) * 1024)
        # matching (program 1) and bounded Galerkin (program 2) dispatch
        # back-to-back; the pass blocks on ONE concatenated readback
        paired, labels, packed1, si, zerors = _match_pass(
            mat, first, float(cfg.ktg), float(cfg.checkdd),
            float(cfg.trspos), float(cfg.fracnegrcsum),
            int(cfg.max_matching_rounds), bool(cfg.symmetric),
            str(cfg.mu_mode))
        ntf = mat.npad // 1024
        while True:
            cols, vals, rownnz, packed2 = _galerkin_bound(
                mat, paired, labels, wr_m, nc_bound)
            packed_np = np.asarray(_concat_packed(packed1, packed2))
            nc = int(packed_np[0])
            off = 1 + 2 * ntf                       # skip member minmax
            nnz_c, max_deg, fits = (int(x) for x in packed_np[off:off + 3])
            if fits:
                break
            if nc > nc_bound or wr_m >= 128:
                return None
            wr_m = min(128, wr_m * 2)
        if first:
            pass1_state["si"] = si
            pass1_state["zerors"] = zerors
        nc_pad = max(((nc + 1023) // 1024) * 1024, 1024)
        kc_eff = max(max_deg, 1)
        c, v, rn = _slice_coarse(cols, vals, rownnz, kc_eff, nc_pad)
        ell_c = ELL(cols=c, vals=v, rownnz=rn, nrows=nc, ncols=nc)
        ntb = nc_bound // 1024
        ntc = nc_pad // 1024
        if plans_enabled():
            base0 = off + 3
            plan = gp.plan_from_minmax(packed_np[base0:base0 + ntc],
                                       packed_np[base0 + ntb:
                                                 base0 + ntb + ntc], nc)
            if plan is not None:
                import dataclasses
                b, wr, nsrc = plan
                ell_c = dataclasses.replace(
                    ell_c, base_blk=jnp.asarray(b), wr=wr, nsrc=nsrc)
        return paired, labels, nc, ell_c, nnz_c

    def run_pass(mat: ELL, first: bool, pass_no: int = 1,
                 cum_labels=None):
        if cfg.matching == "greedy":
            labels, nc = _greedy_pass(mat, first, cfg)
            paired = jnp.asarray(
                paired_from_labels_host(np.asarray(labels)), jnp.int32)
            return paired, labels, nc, None
        km = 2 ** (pass_no - 1)
        if (cfg.check_tentagg and not first and km <= 8
                and pass1_state and a.npad % 1024 == 0):
            paired, labels, packed = _match_pass_checked(
                mat, a, pass1_state["si"], cum_labels,
                pass1_state["zerors"], float(cfg.ktg), float(cfg.checkdd),
                float(cfg.trspos), float(cfg.fracnegrcsum),
                int(cfg.max_matching_rounds), bool(cfg.symmetric),
                str(cfg.mu_mode), km)
        else:
            paired, labels, packed, si, zerors = _match_pass(
                mat, first, float(cfg.ktg), float(cfg.checkdd),
                float(cfg.trspos), float(cfg.fracnegrcsum),
                int(cfg.max_matching_rounds), bool(cfg.symmetric),
                str(cfg.mu_mode))
            if first:
                pass1_state["si"] = si
                pass1_state["zerors"] = zerors
        nc, m_plan = _unpack_match(mat, np.asarray(packed))
        return paired, labels, nc, m_plan

    def can_fuse(mat: ELL, pass_no: int) -> bool:
        import os
        from ..sparse.formats import plans_enabled
        if (cfg.matching != "mutual" or mat.npad % 1024 != 0
                or not plans_enabled()     # member gather rides Pallas
                or os.environ.get("MGS_NO_FUSED_SETUP") == "1"):
            return False
        km = 2 ** (pass_no - 1)
        return not (cfg.check_tentagg and pass_no > 1 and km <= 8)

    def one_pass(mat: ELL, first: bool, pass_no: int, cum_labels):
        if can_fuse(mat, pass_no):
            fused = run_fused(mat, first)
            if fused is not None:
                return fused
        paired, labels, nc, m_plan = run_pass(mat, first, pass_no=pass_no,
                                              cum_labels=cum_labels)
        ac2, nnz2 = galerkin_pair_ell(mat, paired, labels, nc,
                                      m_plan=m_plan)
        return paired, labels, nc, ac2, nnz2

    with timer.phase("aggregation.pass1"):
        paired, labels, nc, ac, nnz_c = one_pass(a, True, 1, None)
    cum_labels = labels
    passes.append(PassInfo(nc=nc, nnz=nnz_c))

    for s in range(2, cfg.npass + 1):
        if nnz_c <= nnz0 / cfg.tou:
            break
        if cfg.max_restriction and ac.nrows < cfg.max_restriction:
            break
        with timer.phase(f"aggregation.pass{s}"):
            paired, pass_labels, nc, ac, nnz_c = one_pass(
                ac, False, s, cum_labels)
        cum_labels = compose_labels(cum_labels, pass_labels)
        passes.append(PassInfo(nc=nc, nnz=nnz_c))

    return AggregationResult(labels=cum_labels, nc=nc, coarse=ac,
                             passes=passes)


@dataclass
class SetupResult:
    """Full multilevel setup output: per-level labels and operators.

    With smoothed aggregation (cfg.smooth_p), ``p_ops``/``pt_ops`` hold
    the explicit weighted prolongations P and Pᵀ per level (None
    otherwise — the label vectors are then the whole transfer story)."""

    matrices: list[ELL]              # level operators, finest first
    level_labels: list[jnp.ndarray]  # labels level l → level l+1
    rounds: list[AggregationResult] = field(default_factory=list)
    p_ops: list[ELL] | None = None
    pt_ops: list[ELL] | None = None


def build_amg_setup(a: ELL, cfg: HierarchyConfig,
                    timer: PhaseTimer | None = None) -> SetupResult:
    """Coarsen until the coarsest level fits a dense direct solve."""
    mats = [a]
    labels: list[jnp.ndarray] = []
    rounds: list[AggregationResult] = []
    p_ops: list[ELL] = []
    pt_ops: list[ELL] = []
    cur = a
    cur_nnz = None
    for _ in range(cfg.max_levels - 1):
        if cur.nrows <= cfg.max_coarse_size:
            break
        res = pairwise_aggregate(cur, cfg.aggregation, timer=timer,
                                 nnz0=cur_nnz)
        if res.nc == 0 or res.nc >= cur.nrows:
            break   # no coarsening progress; stop
        coarse = res.coarse
        cur_nnz = res.passes[-1].nnz
        if cfg.smooth_p is not None:
            from .smoothed import smoothed_prolongation, galerkin_general
            with timer.phase("aggregation.smooth_p") if timer else \
                    _nullcontext():
                ps = smoothed_prolongation(cur, res.labels, res.nc,
                                           omega=float(cfg.smooth_p))
                coarse, pt = galerkin_general(cur, ps)
                p_ops.append(ps)
                pt_ops.append(pt)
                cur_nnz = None          # triple product changes the nnz
        labels.append(res.labels)
        mats.append(coarse)
        rounds.append(res)
        cur = coarse
    smoothed = cfg.smooth_p is not None
    return SetupResult(matrices=mats, level_labels=labels, rounds=rounds,
                       p_ops=p_ops if smoothed else None,
                       pt_ops=pt_ops if smoothed else None)


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def refresh_setup(prev: SetupResult, a: ELL,
                  timer: PhaseTimer | None = None) -> SetupResult:
    """Lagged setup for matrix *sequences* (time-stepping, Newton loops):
    reuse the aggregation — labels, level structure, window plans — from
    a previous setup and recompute only the Galerkin coarse VALUES for a
    new operator with the same sparsity pattern.

    Production AMG packages offer exactly this reuse mode (the reference
    has no equivalent — its setup is one-shot); on TPU it skips the
    matching entirely, so a refresh costs a few Galerkin products instead
    of a full multi-pass aggregation.

    ``a`` must share the previous finest operator's pattern (cols and
    rownnz are reused from it; only ``a.vals`` is read).
    """
    import dataclasses
    from .galerkin import galerkin_ell
    if prev.p_ops is not None:
        raise NotImplementedError(
            "refresh of smoothed-aggregation setups needs the smoothing "
            "re-applied; run build_amg_setup instead")
    prev_fine = prev.matrices[0]
    if (a.cols.shape != prev_fine.cols.shape
            or (a.nrows, a.ncols) != (prev_fine.nrows, prev_fine.ncols)):
        raise ValueError(
            "refresh_setup requires the previous operator's pattern "
            f"(shape {prev_fine.cols.shape}/{prev_fine.nrows} vs "
            f"{a.cols.shape}/{a.nrows})")
    # keep the previous pattern + plans; take the new values
    cur = dataclasses.replace(prev_fine, vals=a.vals)
    mats = [cur]
    for l, labels in enumerate(prev.level_labels):
        nc_true = prev.matrices[l + 1].nrows
        with (timer.phase(f"refresh.galerkin{l+1}") if timer
              else _nullcontext()):
            coarse = galerkin_ell(cur, jnp.asarray(labels, jnp.int32),
                                  nc_true)
        mats.append(coarse)
        cur = coarse
    return SetupResult(matrices=mats, level_labels=prev.level_labels,
                       rounds=prev.rounds, p_ops=prev.p_ops,
                       pt_ops=prev.pt_ops)
