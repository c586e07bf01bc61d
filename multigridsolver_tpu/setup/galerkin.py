"""Galerkin coarse-operator construction  Ac = Pᵀ A P.

The reference forms this with two general sparse GEMMs
(Eigen: ``src/CPU_C++/AGMG.cpp:307-308``; cuSPARSE:
``src/GPU_CUDAC++/main.cu:251-253``) — the dominant setup cost per pass.
With piecewise-constant P expressed as a label vector, the triple product
collapses to a *relabel + reduce-by-key* over A's nonzeros:

    Ac[labels[i], labels[j]] += A[i, j]     (skip labels < 0)

Two device paths:

* :func:`galerkin_dense` — scatter straight into a dense (nc, nc) block.
  Used for the coarsest level, which is LU-factorised densely anyway.
* :func:`galerkin_ell` — sort-by-key + segment-sum producing a padded ELL
  coarse matrix with static bounded shapes (coarse nnz ≤ fine nnz), fully
  on-device; only the resulting true `nc`/`nnz_c`/row-width are read back by
  the host driver, mirroring the reference's scalar readbacks
  (``main.cu:189-214``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import ELL
from ..ops.scan import blocked_cumsum


def galerkin_dense(a: ELL, labels: jnp.ndarray, nc_pad: int) -> jnp.ndarray:
    """Dense Ac (nc_pad, nc_pad) by scatter-add over A's stored slots."""
    li = labels[None, :] + jnp.zeros_like(a.cols)   # (K, n_pad)
    lj = jnp.take(labels, a.cols, axis=0)
    valid = a.slot_mask() & (li >= 0) & (lj >= 0)
    v = jnp.where(valid, a.vals, 0.0)
    li = jnp.maximum(li, 0)
    lj = jnp.maximum(lj, 0)
    out = jnp.zeros((nc_pad, nc_pad), dtype=a.vals.dtype)
    return out.at[li, lj].add(v)


def coarse_coo(a: ELL, labels: jnp.ndarray):
    """Relabelled COO triplets of Ac, unreduced, with validity mask.

    Returns (li, lj, v, valid) each of shape (K * n_pad,).
    """
    li = labels[None, :] + jnp.zeros_like(a.cols)
    lj = jnp.take(labels, a.cols, axis=0)
    valid = a.slot_mask() & (li >= 0) & (lj >= 0)
    v = jnp.where(valid, a.vals, 0.0)
    return li.ravel(), lj.ravel(), v.ravel(), valid.ravel()


def galerkin_ell_arrays(a: ELL, labels: jnp.ndarray, nc: int, kc: int):
    """Device computation of the coarse ELL arrays.

    ``nc``: static padded coarse size (≥ true nc).  ``kc``: static coarse
    row width bound.  Entries that do not fit in ``kc`` are dropped — the
    caller must choose ``kc`` ≥ max coarse row degree (checked by returning
    the true max degree for host verification).

    Returns (cols, vals, rownnz, info) where info = [nnz_c, max_degree].
    """
    li, lj, v, valid = coarse_coo(a, labels)
    m = li.shape[0]
    # lexicographic stable sort by (row, col); invalid entries get row = nc
    # and sort to the end.  Two int32 keys instead of one int64 composite —
    # int64 is emulated (slow) on TPU.
    li = jnp.where(valid, li, nc).astype(jnp.int32)
    lj = jnp.where(valid, lj, nc).astype(jnp.int32)
    li, lj, v = jax.lax.sort((li, lj, v), num_keys=2, is_stable=True)
    valid_s = li < nc
    # runs of equal (row, col) = unique coarse entries
    same = (li[1:] == li[:-1]) & (lj[1:] == lj[:-1])
    newrun = jnp.concatenate([valid_s[:1], ~same & valid_s[1:]])
    run_id = blocked_cumsum(newrun.astype(jnp.int32)) - 1
    nnz_c = jnp.sum(newrun.astype(jnp.int32))
    # segment-sum values into runs (invalid entries carry v == 0 and are
    # dumped into segment m-1, which is only a real run if *all* m entries
    # are valid and unique — in which case there are no invalid entries)
    seg = jnp.where(valid_s, run_id, m - 1)
    sums = jax.ops.segment_sum(v, seg, num_segments=m)
    # the first entry of each run deposits the run's (row, col)
    dump = jnp.where(newrun, run_id, m - 1)
    rows_c = jnp.full((m,), nc, jnp.int32).at[dump].min(
        jnp.where(newrun, li, nc))
    cols_c = jnp.full((m,), nc, jnp.int32).at[dump].min(
        jnp.where(newrun, lj, nc))
    run_valid = rows_c < nc
    rows_c = jnp.where(run_valid, rows_c, 0)
    cols_c = jnp.where(run_valid, cols_c, 0)
    # coarse row degrees and the slot of each run within its row (runs are
    # key-sorted, hence contiguous and column-sorted within a row)
    rownnz = jax.ops.segment_sum(run_valid.astype(jnp.int32), rows_c,
                                 num_segments=nc)
    row_start = blocked_cumsum(rownnz) - rownnz
    run_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    slot = run_idx - jnp.take(row_start, rows_c)
    in_range = run_valid & (slot < kc)
    safe_r = jnp.where(in_range, rows_c, 0)
    safe_s = jnp.where(in_range, slot, 0)
    cols = jnp.zeros((kc, nc), dtype=jnp.int32)
    vals = jnp.zeros((kc, nc), dtype=a.vals.dtype)
    cols = cols.at[safe_s, safe_r].add(jnp.where(in_range, cols_c, 0))
    vals = vals.at[safe_s, safe_r].add(jnp.where(in_range, sums, 0.0))
    max_degree = jnp.max(rownnz)
    # host re-runs with a larger kc when max_degree > kc (overflow dropped)
    rownnz_clamped = jnp.minimum(rownnz, kc)
    info = jnp.stack([nnz_c.astype(jnp.int32), max_degree.astype(jnp.int32)])
    return cols, vals, rownnz_clamped, info


def galerkin_ell(a: ELL, labels: jnp.ndarray, nc_true: int,
                 kc: int | None = None, row_pad: int = 1024) -> ELL:
    """Host driver: build the coarse ELL, growing ``kc`` if the bound was
    exceeded.  ``nc_true`` is the host-known number of aggregates."""
    nc_pad = max(((nc_true + row_pad - 1) // row_pad) * row_pad, row_pad)
    if kc is None:
        kc = min(2 * a.k, nc_true) if nc_true > 1 else 1
    while True:
        cols, vals, rownnz, info = jax.jit(
            galerkin_ell_arrays, static_argnums=(2, 3))(a, labels, nc_pad, kc)
        max_deg = int(info[1])
        if max_deg <= kc:
            break
        kc = max_deg
    # compact the slot axis to the true max degree: the 2·K upper bound
    # would otherwise double every level, and every O(K²) op downstream
    # (transposed_slot_values) pays for the dead slots
    if max_deg < kc:
        kc_eff = max(max_deg, 1)
        cols = cols[:kc_eff]
        vals = vals[:kc_eff]
        rownnz = jnp.minimum(rownnz, kc_eff)
    from ..sparse.formats import with_device_plan
    return with_device_plan(
        ELL(cols=cols, vals=vals, rownnz=rownnz.astype(jnp.int32),
            nrows=nc_true, ncols=nc_true))

def galerkin_pair_arrays(a: ELL, paired: jnp.ndarray, labels: jnp.ndarray,
                         nc: int, m_base=None, m_wr: int | None = None,
                         m_nsrc: int | None = None):
    """Pairwise-structured Galerkin: merge each aggregate's ≤ 2 member rows.

    After a *pairwise* pass every aggregate has at most two members (leader
    ℓ, partner p — possibly ℓ = p), so coarse row c is the relabelled merge
    of fine rows ℓ(c) and p(c).  This needs only gathers, one tiny
    fixed-extent sort along the slot axis (2K ≤ 64 elements per lane) and
    local run-length sums — no global nnz-sized sort, which costs tens of
    seconds of Mosaic compile time and O(nnz log nnz) runtime in the
    general path above.

    ``nc`` is the padded coarse size.  ``m_base``/``m_wr``/``m_nsrc`` is
    the members window plan (per-coarse-tile min/max fine member index,
    produced by ``member_window_minmax`` inside the matching pass) routing
    the member-row fetches through the Pallas kernel; None → XLA gathers.

    Returns (cols, vals, rownnz, info) with slot width 2K; info packs
    [nnz_c, max_degree, out_cmin…, out_cmax…] — the coarse operator's own
    window-plan min/max per 1024-tile, so the host attaches the next
    pass's gather plan from the same single readback.
    """
    from ..sparse import ops as ell_ops
    k = a.k
    npad = a.npad
    # leader of each aggregate: the smaller member index (matching's
    # numbering rule); partner via `paired`
    nodes = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)[0]
    active = labels >= 0
    lead = jnp.minimum(nodes, jnp.where(paired >= 0, paired, nodes))
    is_leader = active & (lead == nodes)
    # -1 sentinel: padding aggregates in [nc_true, nc) receive no leader
    # and must produce EMPTY coarse rows (otherwise fine row 0's data is
    # duplicated into every padding row, polluting coarse SpMVs / vdots)
    leader_of = jnp.full((nc,), -1, jnp.int32).at[
        jnp.where(is_leader, labels, nc - 1)].max(
        jnp.where(is_leader, nodes, -1))
    real = leader_of >= 0
    safe_leader = jnp.maximum(leader_of, 0)
    partner_of = ell_ops.take_member_rows(
        safe_leader, paired[None, :], m_base, m_wr, m_nsrc)[0]
    partner_of = jnp.where(real & (partner_of >= 0), partner_of,
                           safe_leader)
    has_partner = real & (partner_of != safe_leader)

    # relabel the slot columns once on the fine side (rides a's own plan),
    # then fetch whole relabelled member rows via the members plan
    lc_fine = ell_ops.take_neighbor(a, jnp.where(active, labels, -1))
    vals_f32 = a.vals.astype(jnp.float32) if m_wr is not None else a.vals
    # union-symmetric transposed field (ELL.vals_t): merged over the SAME
    # slot pattern, which yields exactly Ac[J,I] per coarse slot (I,J) —
    # so coarse levels inherit the field and never run a transpose pass
    union = a.vals_t is not None
    vt_f32 = (a.vals_t.astype(jnp.float32)
              if union and m_wr is not None else a.vals_t)

    def member_rows(members):
        cols_m = ell_ops.take_member_rows(members, lc_fine,
                                          m_base, m_wr, m_nsrc)   # (K, nc)
        vals_m = ell_ops.take_member_rows(members, vals_f32,
                                          m_base, m_wr, m_nsrc)
        nnz_m = ell_ops.take_member_rows(members, a.rownnz[None, :],
                                         m_base, m_wr, m_nsrc)[0]  # (nc,)
        sl = jax.lax.broadcasted_iota(jnp.int32, cols_m.shape, 0)
        ok = (sl < nnz_m[None, :]) & real[None, :]
        ok = ok & (cols_m >= 0)        # excluded / junk columns dropped
        vt_m = None
        if union:
            vt_m = ell_ops.take_member_rows(members, vt_f32,
                                            m_base, m_wr, m_nsrc)
            vt_m = jnp.where(ok, vt_m.astype(a.vals.dtype), 0.0)
        return (jnp.where(ok, cols_m, nc),
                jnp.where(ok, vals_m.astype(a.vals.dtype), 0.0), vt_m)

    c1, v1, t1 = member_rows(safe_leader)
    c2, v2, t2 = member_rows(partner_of)
    c2 = jnp.where(has_partner[None, :], c2, nc)         # mask duplicates
    v2 = jnp.where(has_partner[None, :], v2, 0.0)
    cand_c = jnp.concatenate([c1, c2], axis=0)           # (2K, nc)
    cand_v = jnp.concatenate([v1, v2], axis=0)
    # sort each column's 2K candidates by coarse col (invalid = nc last)
    if union:
        t2 = jnp.where(has_partner[None, :], t2, 0.0)
        cand_t = jnp.concatenate([t1, t2], axis=0)
        cand_c, cand_v, cand_t = jax.lax.sort(
            (cand_c, cand_v, cand_t), dimension=0, num_keys=1)
    else:
        cand_c, cand_v = jax.lax.sort((cand_c, cand_v), dimension=0,
                                      num_keys=1)
    # run-length sum of equal adjacent cols: suffix accumulation (2K steps,
    # statically unrolled — 2K ≤ 64).  Unrolled over per-slot ROW views:
    # ``.at[s].add`` on the full (m2, n) array makes XLA materialise a
    # fresh (m2, n) buffer per step (~m2·m2·n traffic); row-wise the whole
    # recurrence is m2 fused (n,)-vector ops.
    m2 = 2 * k
    c_rows = [cand_c[s] for s in range(m2)]
    v_rows = [cand_v[s] for s in range(m2)]
    t_rows = [cand_t[s] for s in range(m2)] if union else None
    merged_v: list = [None] * m2
    merged_v[m2 - 1] = v_rows[m2 - 1]
    merged_t: list = [None] * m2
    if union:
        merged_t[m2 - 1] = t_rows[m2 - 1]
    for s in range(m2 - 2, -1, -1):
        same = c_rows[s] == c_rows[s + 1]
        merged_v[s] = v_rows[s] + jnp.where(same, merged_v[s + 1], 0.0)
        if union:
            merged_t[s] = t_rows[s] + jnp.where(same, merged_t[s + 1], 0.0)
    first_rows = [jnp.ones_like(c_rows[0], dtype=bool)] + [
        c_rows[s] != c_rows[s - 1] for s in range(1, m2)]
    keep_rows = [first_rows[s] & (c_rows[s] < nc) for s in range(m2)]
    # running output position per slot (prefix count of kept entries)
    pos_rows: list = [None] * m2
    acc = keep_rows[0].astype(jnp.int32)
    pos_rows[0] = acc - 1
    for s in range(1, m2):
        acc = acc + keep_rows[s].astype(jnp.int32)
        pos_rows[s] = acc - 1
    rownnz = acc
    # compact kept entries to the top slots per column with ONE stable
    # sort by output position (dropped entries key = m2, sinking below
    # every kept pos; their payloads are zeroed first, preserving the
    # c = 0 / v = 0 padding contract).  A lane-axis scatter
    # (.at[pos, ci].add) is pathological on TPU (measured 228 ms +
    # 11 s compile at (10, 10⁶)); the previous per-output-slot select
    # unroll was O(m2²) fused vector ops and its m2 > 24 one-hot 3D
    # fallback cost ~GBs of HBM traffic at coarse-level widths (m2 = 68
    # at n = 105k — measured the dominant slice of csky3d(80)'s warm
    # setup device time), while the sort is O(log² m2) compare layers
    # (~1 ms at (28, 320k)).
    keep_s = jnp.stack(keep_rows)
    key = jnp.where(keep_s, jnp.stack(pos_rows), m2).astype(jnp.int32)
    zc = jnp.where(keep_s, jnp.stack(c_rows), 0)
    zv = jnp.where(keep_s, jnp.stack(merged_v), 0.0)
    if union:
        zt = jnp.where(keep_s, jnp.stack(merged_t), 0.0)
        _, out_c, out_v, out_t = jax.lax.sort(
            (key, zc, zv, zt), dimension=0, num_keys=1)
    else:
        _, out_c, out_v = jax.lax.sort((key, zc, zv), dimension=0,
                                       num_keys=1)
        out_t = None
    head = jnp.stack([jnp.sum(rownnz), jnp.max(rownnz)]).astype(jnp.int32)
    # the coarse operator's own window-plan min/max per 1024-row tile
    # (identity-covered), packed into the same readback
    if nc % 1024 == 0:
        ntc = nc // 1024
        sl2 = jax.lax.broadcasted_iota(jnp.int32, out_c.shape, 0)
        ok2 = sl2 < rownnz[None, :]
        big = jnp.where(ok2, out_c, jnp.iinfo(jnp.int32).max)
        small = jnp.where(ok2, out_c, -1)
        ocmin = big.reshape(m2, ntc, 1024).min(axis=(0, 2))
        ocmax = small.reshape(m2, ntc, 1024).max(axis=(0, 2))
        tstart = jnp.arange(ntc, dtype=jnp.int32) * 1024
        ocmin = jnp.minimum(jnp.where(ocmax < 0, nc, ocmin), tstart)
        ocmax = jnp.maximum(jnp.where(ocmax < 0, 0, ocmax),
                            tstart + 1023)
        info = jnp.concatenate([head, ocmin, ocmax])
    else:
        info = head
    return out_c, out_v, rownnz, info, out_t


def member_window_minmax(labels: jnp.ndarray):
    """Per-coarse-1024-tile [cmin, cmax] COVER of the fine member indices —
    the members window plan input for the next Galerkin (run inside the
    matching pass so it shares that pass's readback).  Uses the fine tile
    count as the bound on coarse tiles; empty tiles report (0, 0).

    Scatter-free tile-granular formulation: a direct per-member scatter
    (.at[label // 1024].min/max over npad nodes) costs ~12 ms each at 10⁶
    rows (TPU scatters are serialised).  Instead, reduce each FINE tile's
    label range (reshape min/max — pure VPU), deposit fine-tile ids at the
    coarse tiles those ranges touch (a scatter over ntiles ≈ 10³ elements,
    microseconds), and fill with prefix scans.  The result covers at
    fine-TILE granularity — up to 1024 rows looser per side than the exact
    minmax, which only means the window planner picks the next wr up.
    """
    npad = labels.shape[0]
    if npad % 1024 != 0:
        z = jnp.zeros((0,), jnp.int32)
        return z, z
    nt = npad // 1024
    lab2 = labels.reshape(nt, 1024)
    valid = lab2 >= 0
    big = jnp.iinfo(jnp.int32).max
    lmin = jnp.min(jnp.where(valid, lab2, big), axis=1)      # (nt,)
    lmax = jnp.max(jnp.where(valid, lab2, -1), axis=1)
    has = lmax >= 0
    ct_lo = jnp.where(has, lmin // 1024, nt)                 # deposit slots
    ct_hi = jnp.where(has, lmax // 1024, nt)
    ft = jnp.arange(nt, dtype=jnp.int32)
    # ft_last[ct] = max fine tile whose range starts at or before ct
    dep_last = jnp.full((nt + 1,), -1, jnp.int32).at[ct_lo].max(
        jnp.where(has, ft, -1))[:nt]
    ft_last = jax.lax.associative_scan(jnp.maximum, dep_last)
    # ft_first[ct] = min fine tile whose range ends at or after ct
    dep_first = jnp.full((nt + 1,), nt, jnp.int32).at[ct_hi].min(
        jnp.where(has, ft, nt))[:nt]
    ft_first = jax.lax.associative_scan(jnp.minimum, dep_first,
                                        reverse=True)
    nc_max = jnp.max(jnp.where(valid, lab2, -1))
    ct = jnp.arange(nt, dtype=jnp.int32)
    occupied = (ct <= nc_max // 1024) & (ft_first <= ft_last)
    cmin = jnp.where(occupied, ft_first * 1024, 0)
    cmax = jnp.where(occupied, ft_last * 1024 + 1023, 0)
    return cmin, cmax


def galerkin_pair_ell(a: ELL, paired: jnp.ndarray, labels: jnp.ndarray,
                      nc_true: int, row_pad: int = 1024,
                      m_plan=None) -> tuple[ELL, int]:
    """Host driver for the pairwise-merge Galerkin path.

    Returns (coarse ELL, nnz_c).  One readback total: nnz, max degree and
    the coarse operator's gather-plan min/max all ride one packed info
    vector (host↔device round-trips through the TPU tunnel cost ~35 ms
    each and dominate naive setup loops).  ``m_plan`` is the members
    window plan (base_blk, wr, nsrc) from the matching pass."""
    from ..sparse.formats import plans_enabled
    from ..ops import gather_pallas as gp
    nc_pad = max(((nc_true + row_pad - 1) // row_pad) * row_pad, row_pad)
    m_base, m_wr, m_nsrc = m_plan if m_plan is not None else (None, None,
                                                             None)
    cols, vals, rownnz, info, vt = jax.jit(
        galerkin_pair_arrays, static_argnums=(3, 5, 6))(
        a, paired, labels, nc_pad, m_base, m_wr, m_nsrc)
    from ..parallel.multihost import host_read
    info_np = host_read(info)
    nnz_c = int(info_np[0])
    kc_eff = max(int(info_np[1]), 1)
    ell = ELL(cols=cols[:kc_eff], vals=vals[:kc_eff],
              rownnz=jnp.minimum(rownnz, kc_eff).astype(jnp.int32),
              nrows=nc_true, ncols=nc_true,
              vals_t=vt[:kc_eff] if vt is not None else None)
    multishard = getattr(getattr(cols, "sharding", None), "device_set",
                         None)
    if (info_np.shape[0] > 2 and plans_enabled()
            and (multishard is None or len(multishard) <= 1)):
        ntc = (info_np.shape[0] - 2) // 2
        plan = gp.plan_from_minmax(info_np[2:2 + ntc],
                                   info_np[2 + ntc:], nc_true)
        if plan is not None:
            import dataclasses
            base, wr, nsrc = plan
            ell = dataclasses.replace(ell, base_blk=jnp.asarray(base),
                                      wr=wr, nsrc=nsrc)
    return ell, nnz_c
