"""Hybrid DIA + ELL operator — the fast SpMV format for the solve phase.

XLA's TPU gather runs ~20x off the VPU ceiling (measured: 36 ms vs 1.8 ms
for 5M nnz), because the hardware has no vector-gather from HBM.  But the
reference's whole benchmark suite is stencil matrices — 5-point Poisson
(``src/common/poisson.cpp``), 7-point 3D skyscraper — whose columns sit on
a handful of constant diagonals j − i ∈ {o₁…o_D}.  Entries on those
diagonals need NO gather: y += dval_d · shift(x, o_d) with a static roll,
which XLA lowers to pure vector slices at full HBM bandwidth.

``HYB`` stores the diagonal part as (D, n) dense value lanes plus an ELL
remainder for off-diagonal stragglers (empty for pure stencils; the coarse
Galerkin operators keep strong locality so most entries still land on a
few diagonals).  The splitter takes the D most-populated offsets subject
to a fill-efficiency bound.

Used for the solve phase (SpMV-dominated: smoothers, Krylov, transfers);
the setup phase keeps plain ELL (its cost is in strength/matching, not
SpMV).
"""
from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .formats import CSR, ELL, _round_up
from . import ops as ell_ops


@partial(jax.tree_util.register_dataclass,
         data_fields=["dvals", "ell", "base_blk", "ov"],
         meta_fields=["offsets", "nrows", "ncols", "wr", "nsrc_pad"])
@dataclass
class HYB:
    """offsets: static diagonal shifts (tuple of ints, may be empty);
    dvals[d, i] = A[i, i + offsets[d]] (0 where absent / out of range);
    ell: remainder entries (None when everything fits on the diagonals).

    When the remainder's per-1024-row-tile column spread fits a VMEM
    window, ``base_blk``/``wr``/``nsrc_pad`` hold the windowed-gather
    plan (ops/gather_pallas.py) and the remainder ELL is padded to a
    1024-row multiple; the remainder SpMV then runs ~100x faster than
    the XLA gather.  ``base_blk`` is None when no plan exists.

    ``ov``: overflow entries under a *split* plan — when outlier columns
    (e.g. skyscraper tower boundaries after aggregation) defeat the
    cover-everything planner, the window is anchored on each tile's own
    rows and out-of-window entries move here (their slots in ``ell`` are
    zeroed).  Stored as a compact padded COO triple (rows, cols, vals)
    so the XLA scatter/gather pays ~14 ns per actual straggler, not per
    padded slot (3-13 %% of the remainder nnz on csky3d(80))."""

    dvals: jnp.ndarray          # (D, n_pad) — D may be 0
    ell: ELL | None
    base_blk: jnp.ndarray | None
    ov: tuple | None            # (rows, cols, vals) padded COO
    offsets: tuple
    nrows: int
    ncols: int
    wr: int | None
    nsrc_pad: int | None

    @property
    def npad(self) -> int:
        return self.dvals.shape[1]

    @property
    def dtype(self):
        return self.dvals.dtype


def hybrid_from_csr(a: CSR, max_diags: int = 48, min_fill: float = 0.02,
                    row_pad: int = 8, dtype=jnp.float32,
                    npad: int | None = None) -> HYB:
    """Split into diagonal + remainder parts.

    An offset qualifies as a diagonal if it holds at least ``min_fill · n``
    entries (dense lanes cost n values each regardless of fill).
    """
    n, m = a.shape
    n_pad = npad or max(_round_up(n, row_pad), row_pad)
    coo = a.to_coo()
    offs = coo.col - coo.row
    counts = Counter(offs.tolist())
    good = [o for o, c in counts.most_common(max_diags)
            if c >= min_fill * n and abs(o) < n_pad]
    good = sorted(good)
    dvals = np.zeros((len(good), n_pad), dtype=np.float64)
    off_index = {o: d for d, o in enumerate(good)}
    on_dia = np.array([o in off_index for o in offs])
    if len(good):
        d_idx = np.array([off_index.get(o, 0) for o in offs])
        np.add.at(dvals, (d_idx[on_dia], coo.row[on_dia]),
                  coo.val[on_dia])
    rest = ~on_dia
    ell = None
    if rest.any():
        from .formats import COO
        rest_csr = COO(row=coo.row[rest], col=coo.col[rest],
                       val=coo.val[rest], shape=a.shape).to_csr()
        ell = rest_csr.to_ell(row_pad=row_pad, dtype=dtype)
        if ell.npad != n_pad:
            ell = ELL(cols=jnp.pad(ell.cols,
                                   ((0, 0), (0, n_pad - ell.npad))),
                      vals=jnp.pad(ell.vals,
                                   ((0, 0), (0, n_pad - ell.npad))),
                      rownnz=jnp.pad(ell.rownnz, (0, n_pad - ell.npad)),
                      nrows=ell.nrows, ncols=ell.ncols)
    ell, base_blk, wr, nsrc_pad, ov = _attach_gather_plan(ell)
    return HYB(dvals=jnp.asarray(dvals, dtype=dtype), ell=ell,
               base_blk=base_blk, ov=ov,
               offsets=tuple(int(o) for o in good),
               nrows=n, ncols=m, wr=wr, nsrc_pad=nsrc_pad)


def hybrid_from_ell(a: ELL, **kw) -> HYB:
    kw.setdefault("dtype", a.vals.dtype)
    kw.setdefault("npad", a.npad)
    return hybrid_from_csr(a.to_csr(), **kw)


# route the ELL remainder through the windowed-gather Pallas kernel when a
# window plan exists (ops/gather_pallas.py; measured ~100x vs XLA gather)
USE_PALLAS_GATHER = True

# runtime budget on K * 2wr total vreg gather+selects per output vreg:
# the kernel's k-blocked grid caps each body at ~512 unrolled ops (compile
# cost is bounded), so this only bounds runtime: at the limit the kernel
# costs ~1.5 ns/element -- still ~5x under the XLA gather
_PLAN_UNROLL_BUDGET = 32768


def _attach_plan_staged(ell: ELL | None):
    """Staged generator (utils/staging.py) padding the remainder to a
    1024-row multiple and computing the windowed-gather plan.  Returns
    (ell, base_blk, wr, nsrc_pad, ov).

    Exact plan first (window covers every stored column); when outliers
    defeat it, a *split* plan: diagonal-anchored windows, out-of-window
    entries (≤ 2 % of nnz) compacted into the ``ov`` overflow ELL for
    the XLA-gather path.  All plan fields None when even that fails."""
    if ell is None or not USE_PALLAS_GATHER:
        return ell, None, None, None, None
    from ..ops import gather_pallas as gp
    if jax.default_backend() != "tpu" and not gp.INTERPRET:
        # CPU/GPU backends: XLA's gather is not the TPU scalar loop; the
        # Mosaic kernel would only run in (slow) interpret mode
        return ell, None, None, None, None
    npad_t = _round_up(ell.npad, gp.T)
    if npad_t != ell.npad:
        ell = ELL(cols=jnp.pad(ell.cols, ((0, 0), (0, npad_t - ell.npad))),
                  vals=jnp.pad(ell.vals, ((0, 0), (0, npad_t - ell.npad))),
                  rownnz=jnp.pad(ell.rownnz, (0, npad_t - ell.npad)),
                  nrows=ell.nrows, ncols=ell.ncols)
    ntiles = npad_t // gp.T
    cmin, cmax = yield gp.plan_windows_device(ell.cols, ell.rownnz, ntiles)
    plan = gp.plan_from_minmax(cmin, cmax, ell.ncols)
    if plan is not None and ell.k * 2 * plan[1] <= _PLAN_UNROLL_BUDGET:
        base_blk, wr, nsrc_pad = plan
        return ell, jnp.asarray(base_blk), wr, nsrc_pad, None
    # ---- split fallback: pick the candidate minimising the modelled
    # SpMV cost (kernel ≈ 0.09 ns/elem · wr/16; overflow COO ≈ 14
    # ns/straggler on the XLA path).  All candidate overflow fractions
    # come back in ONE readback. ----
    wrs = tuple(wr for wr in (16, 32, 64, 128, 192)
                if ell.k * 2 * wr <= _PLAN_UNROLL_BUDGET)
    if not wrs:
        return ell, None, None, None, None
    cands = [gp.anchored_base(ntiles, wr, ell.ncols) for wr in wrs]
    bases = jnp.asarray(np.stack([b for b, _ in cands]))
    fracs = yield gp.overflow_fracs_device(ell.cols, ell.rownnz, bases, wrs)
    best = None
    for i, wr in enumerate(wrs):
        frac = float(fracs[i])
        if frac > 0.25:
            continue
        cost = 0.09 * (wr / 16.0) + frac * 14.0     # ns per stored elem
        if best is None or cost < best[0]:
            best = (cost, i, wr)
    if best is None:
        return ell, None, None, None, None
    _, i, wr = best
    base, nsrc_pad = jnp.asarray(cands[i][0]), cands[i][1]
    out = gp.split_overflow_device(ell.cols, ell.vals, ell.rownnz,
                                   base, wr)
    mc, mv, _, ov_r, ov_c, ov_v, nov_dev = out
    nov = int((yield nov_dev))
    main = ELL(cols=mc, vals=mv, rownnz=ell.rownnz,
               nrows=ell.nrows, ncols=ell.ncols)
    ov = None
    if nov > 0:
        n_ov = _round_up(max(nov, 1), 1024)
        keep = jnp.arange(n_ov) < nov
        ov = (jnp.where(keep, ov_r[:n_ov], 0),
              jnp.where(keep, ov_c[:n_ov], 0),
              jnp.where(keep, ov_v[:n_ov], 0.0))
    return main, base, wr, nsrc_pad, ov


def _attach_gather_plan(ell: ELL | None):
    """Blocking wrapper around :func:`_attach_plan_staged` for one-shot
    callers (checkpoint reload)."""
    from ..utils.staging import drive
    return drive([_attach_plan_staged(ell)])[0]


def _ell_remainder_spmv(a: HYB, x: jnp.ndarray) -> jnp.ndarray:
    """Remainder SpMV sliced back to the HYB's row padding."""
    if a.wr is not None and x.dtype == jnp.float32:
        from ..ops.gather_pallas import windowed_gather_spmv
        ye = windowed_gather_spmv(a.ell.cols, a.ell.vals, x, a.base_blk,
                                  a.wr, a.nsrc_pad)
    else:
        ye = ell_ops.spmv(a.ell, x)
    return ye[: a.npad] if ye.shape[0] != a.npad else ye


def spmv(a: HYB, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x at vector-unit speed for the diagonal part.

    roll wraps around, but wrapped positions always carry dval = 0 (the
    splitter only stores in-range entries), so no edge masking is needed.
    """
    # DIA part via XLA rolls: measured 2.2x FASTER than a fused Pallas
    # window kernel on v5e/v6e (0.019 ms vs 0.043 ms at n=1M, marginal-
    # cost timing) -- XLA pipelines the static shifts at ~1.4 TB/s
    # effective, so there is deliberately no Pallas path here
    y = jnp.zeros((a.npad,), dtype=x.dtype)
    for d, o in enumerate(a.offsets):
        y = y + a.dvals[d] * jnp.roll(x, -o)
    if a.ell is not None:
        y = y + _ell_remainder_spmv(a, x)
    if a.ov is not None:
        orow, ocol, oval = a.ov
        y = y.at[orow].add(oval.astype(y.dtype)
                           * jnp.take(x, ocol, axis=0))
    return y


def spmv_tri(a: HYB, x: jnp.ndarray, lower: bool) -> jnp.ndarray:
    """Strictly-lower (or upper) triangular SpMV — offsets split by sign,
    remainder masked by column index (used by two-stage Gauss-Seidel)."""
    y = jnp.zeros((a.npad,), dtype=x.dtype)
    for d, o in enumerate(a.offsets):
        if (o < 0) if lower else (o > 0):
            y = y + a.dvals[d] * jnp.roll(x, -o)
    if a.ell is not None:
        e = a.ell
        ri = e.row_iota()
        mask = (e.vals != 0.0) & ((e.cols < ri) if lower else (e.cols > ri))
        g = jnp.take(x, e.cols, axis=0)
        y = y + jnp.sum(jnp.where(mask, e.vals, 0.0) * g, axis=0)[: a.npad]
    if a.ov is not None:
        orow, ocol, oval = a.ov
        tri = (ocol < orow) if lower else (ocol > orow)
        y = y.at[orow].add(jnp.where(tri, oval, 0.0).astype(y.dtype)
                           * jnp.take(x, ocol, axis=0))
    return y


def extract_diag(a: HYB) -> jnp.ndarray:
    d = jnp.zeros((a.npad,), dtype=a.dtype)
    for i, o in enumerate(a.offsets):
        if o == 0:
            d = d + a.dvals[i]
    if a.ell is not None:
        d = d + ell_ops.extract_diag(a.ell)[: a.npad]
    if a.ov is not None:
        orow, ocol, oval = a.ov
        d = d.at[orow].add(jnp.where(ocol == orow, oval, 0.0)
                           .astype(d.dtype))
    return d


def row_sum_abs_offdiag(a: HYB) -> jnp.ndarray:
    """Σⱼ≠ᵢ |aᵢⱼ| per row (for the l1-Jacobi safeguard)."""
    s = jnp.zeros((a.npad,), dtype=a.dtype)
    for i, o in enumerate(a.offsets):
        if o != 0:
            s = s + jnp.abs(a.dvals[i])
    if a.ell is not None:
        s = s + ell_ops.row_sum(a.ell, absolute=True,
                                skip_diag=True)[: a.npad]
    if a.ov is not None:
        orow, ocol, oval = a.ov
        s = s.at[orow].add(jnp.where(ocol != orow, jnp.abs(oval), 0.0)
                           .astype(s.dtype))
    return s


def row_mask(a: HYB) -> jnp.ndarray:
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, a.npad), 1)[0]
    return ri < a.nrows

def _offsets_from_host_sample(sample_cols: np.ndarray,
                              sample_nnz: np.ndarray, rows: np.ndarray,
                              n: int, npad: int, max_diags: int,
                              min_fill: float) -> list[int]:
    """Host-side offset detection from a fetched row sample."""
    k = sample_cols.shape[0]
    valid = (np.arange(k)[:, None] < sample_nnz[None, :]) & \
            (rows[None, :] < n)
    offs = sample_cols.astype(np.int64) - rows[None, :]
    vals, counts = np.unique(offs[valid], return_counts=True)
    nsample = max(int(valid.sum()), 1)
    frac = counts / nsample                # fraction of sampled nnz
    # an offset qualifies if its nnz share suggests ≥ min_fill·n entries
    avg_k = nsample / max(len(np.unique(rows[rows < n])), 1)
    keep = [int(o) for o, f in zip(vals, frac)
            if f * avg_k >= min_fill and abs(int(o)) < npad]
    keep = sorted(keep, key=lambda o: -frac[list(vals).index(o)])[:max_diags]
    return sorted(keep)


@partial(jax.jit, static_argnames=("stride",))
def _sample_sliver(cols, rownnz, stride: int):
    return cols[:, ::stride], rownnz[::stride]


@partial(jax.jit, static_argnames=("k_rest",))
def _mask_remainder(rcols, rvals, rnnz, k_rest: int):
    """Zero both cols and vals of invalid slots (the sorted leftovers
    beyond rnnz still hold covered entries' data).  One program per
    level (the eager form dispatched ~4)."""
    sl = jax.lax.broadcasted_iota(jnp.int32, (k_rest, rcols.shape[1]), 0)
    ok = sl < rnnz[None, :]
    return jnp.where(ok, rcols[:k_rest], 0), jnp.where(ok, rvals[:k_rest],
                                                       0.0)


@partial(jax.jit, static_argnames=("offs",))
def _split_by_offsets(a: ELL, offs: tuple):
    """Masked-reduction DIA extraction + remainder compaction (one small-
    extent per-row sort).  Module-level jit: the old per-call closure got
    a fresh jit wrapper every call and re-traced even warm."""
    ri = a.row_iota()
    mask = a.slot_mask()
    slot_off = a.cols - ri
    covered = jnp.zeros_like(mask)
    dvals = []
    for o in offs:
        hit = mask & (slot_off == o)
        dvals.append(jnp.sum(jnp.where(hit, a.vals, 0.0), axis=0))
        covered = covered | hit
    dvals = jnp.stack(dvals) if offs else \
        jnp.zeros((0, a.npad), a.vals.dtype)
    # compact the remainder: keep non-covered valid slots first
    keep = mask & ~covered
    key = jnp.where(keep, 0, 1).astype(jnp.int32)
    _, rcols, rvals = jax.lax.sort(
        (key, a.cols, a.vals), dimension=0, num_keys=1, is_stable=True)
    rnnz = jnp.sum(keep.astype(jnp.int32), axis=0)
    rmax = jnp.max(rnnz)
    return dvals, rcols, rvals, rnnz, rmax


def hybrid_staged(a: ELL, max_diags: int = 48, min_fill: float = 0.02):
    """Staged-generator DIA/ELL split (drive with utils/staging.py):
    offsets detected from a sampled sliver of the column array (one tiny
    transfer), the split itself built with masked reductions and one
    small-extent per-row sort — no nnz-sized host round-trip, and every
    host decision point is a ``yield`` so peer levels' readbacks batch
    into one sync per stage."""
    stride = max(1, a.npad // 4096)
    sample_cols, sample_nnz = yield _sample_sliver(a.cols, a.rownnz,
                                                   stride=stride)
    rows = np.arange(a.npad, dtype=np.int64)[::stride]
    offsets = _offsets_from_host_sample(sample_cols, sample_nnz, rows,
                                        a.nrows, a.npad, max_diags,
                                        min_fill)
    dvals, rcols, rvals, rnnz, rmax = _split_by_offsets(a, tuple(offsets))
    k_rest = int((yield rmax))
    ell = None
    if k_rest > 0:
        mc, mv = _mask_remainder(rcols, rvals, rnnz, k_rest=k_rest)
        ell = ELL(cols=mc, vals=mv, rownnz=rnnz, nrows=a.nrows,
                  ncols=a.ncols)
    ell, base_blk, wr, nsrc_pad, ov = yield from _attach_plan_staged(ell)
    return HYB(dvals=dvals, ell=ell, base_blk=base_blk, ov=ov,
               offsets=tuple(offsets), nrows=a.nrows, ncols=a.ncols,
               wr=wr, nsrc_pad=nsrc_pad)


def hybrid_record(h: HYB) -> dict | None:
    """Ladder record of a hybrid's derived structure (host scalars +
    plan base), or None when the split/overflow path was taken (those
    levels stay on the staged build).  Called once per shape on the
    blocking path — the np.asarray fetch is the recording cost."""
    if h.ov is not None:
        return None
    k_rest = h.ell.k if h.ell is not None else 0
    plan = None
    if h.base_blk is not None:
        plan = (np.asarray(h.base_blk).astype(int).tolist(), h.wr,
                h.nsrc_pad)
    return dict(offsets=list(h.offsets), k_rest=k_rest, plan=plan)


def hybrid_replay(a: ELL, rec: dict):
    """Rebuild the hybrid split from a ladder record with NO host sync.

    Returns (hyb, pending) — ``pending`` carries the device handles the
    end-of-build validation fetches asynchronously: the offsets sample,
    the remainder slot bound, and the remainder plan min/max."""
    from ..ops import gather_pallas as gp
    offs = tuple(rec["offsets"])
    k_rest = rec["k_rest"]
    dvals, rcols, rvals, rnnz, rmax = _split_by_offsets(a, offs)
    ell = None
    base_blk = wr = nsrc_pad = None
    cminmax = None
    if k_rest > 0:
        mc, mv = _mask_remainder(rcols, rvals, rnnz, k_rest=k_rest)
        ell = ELL(cols=mc, vals=mv, rownnz=rnnz, nrows=a.nrows,
                  ncols=a.ncols)
        if rec.get("plan") is not None:
            b, wr, nsrc_pad = rec["plan"]
            npad_t = _round_up(ell.npad, gp.T)
            if npad_t != ell.npad:
                ell = ELL(cols=jnp.pad(ell.cols,
                                       ((0, 0), (0, npad_t - ell.npad))),
                          vals=jnp.pad(ell.vals,
                                       ((0, 0), (0, npad_t - ell.npad))),
                          rownnz=jnp.pad(ell.rownnz,
                                         (0, npad_t - ell.npad)),
                          nrows=ell.nrows, ncols=ell.ncols)
            base_blk = jnp.asarray(np.asarray(b, np.int32))
            cminmax = gp.plan_windows_device(ell.cols, ell.rownnz,
                                             ell.npad // gp.T)
    stride = max(1, a.npad // 4096)
    sample = _sample_sliver(a.cols, a.rownnz, stride=stride)
    pend = dict(kind="hyb", sample=sample, stride=stride, rmax=rmax,
                cminmax=cminmax, rec=rec, nrows=a.nrows, npad=a.npad)
    for t in (sample[0], sample[1], rmax) + (cminmax or ()):
        try:
            t.copy_to_host_async()
        except Exception:
            pass
    hyb = HYB(dvals=dvals, ell=ell, base_blk=base_blk, ov=None,
              offsets=offs, nrows=a.nrows, ncols=a.ncols, wr=wr,
              nsrc_pad=nsrc_pad)
    return hyb, pend


def hybrid_validate(pend, max_diags: int = 48,
                    min_fill: float = 0.02) -> bool:
    """Check a replayed hybrid's record against the streamed handles."""
    from ..ops import gather_pallas as gp
    rec = pend["rec"]
    try:
        if int(np.asarray(pend["rmax"])) != rec["k_rest"]:
            return False
        sample_cols = np.asarray(pend["sample"][0])
        sample_nnz = np.asarray(pend["sample"][1])
        rows = np.arange(pend["npad"], dtype=np.int64)[:: pend["stride"]]
        offs = _offsets_from_host_sample(sample_cols, sample_nnz, rows,
                                         pend["nrows"], pend["npad"],
                                         max_diags, min_fill)
        if list(offs) != list(rec["offsets"]):
            return False
        if rec.get("plan") is not None:
            if pend["cminmax"] is None:
                return False
            cmin = np.asarray(pend["cminmax"][0]).astype(np.int64)
            cmax = np.asarray(pend["cminmax"][1]).astype(np.int64)
            b, wr, nsrc = rec["plan"]
            base = np.asarray(b, np.int64)
            wbl = gp._wb(wr) * 128
            n = min(base.shape[0], cmin.shape[0])
            lo = base[:n] * wbl
            if not (np.all(cmin[:n] >= lo)
                    and np.all(cmax[:n] < lo + 2 * wr * 128)
                    and np.all(cmax[:n] < nsrc)):
                return False
        return True
    except Exception:
        return False


def hybrid_from_ell_device(a: ELL, max_diags: int = 48,
                           min_fill: float = 0.02) -> HYB:
    """Blocking wrapper around :func:`hybrid_staged` for one-shot use."""
    from ..utils.staging import drive
    return drive([hybrid_staged(a, max_diags, min_fill)])[0]


def merge_overflow_host(a: HYB) -> HYB:
    """Fold split-plan overflow entries back into one remainder ELL
    (host round-trip).  Used where the split representation cannot
    follow — checkpointing and sharding."""
    import dataclasses
    if a.ov is None:
        return a
    import scipy.sparse as sp
    orow, ocol, oval = (np.asarray(t) for t in a.ov)
    n, m = a.ell.nrows, a.ell.ncols
    ov_sp = sp.coo_matrix(
        (oval, (np.clip(orow, 0, n - 1), np.clip(ocol, 0, m - 1))),
        shape=(n, m)).tocsr()
    comb = (a.ell.to_csr().to_scipy() + ov_sp).tocsr()
    ell = CSR.from_scipy(comb).to_ell(dtype=a.ell.vals.dtype)
    return dataclasses.replace(a, ell=ell, ov=None, base_blk=None,
                               wr=None, nsrc_pad=None)
