"""Core sparse operations on the slot-major padded-ELL device format.

Every op here is a pure jittable function over :class:`ELL` pytrees, written
so XLA sees only static shapes and dense ``(K, n)`` arrays — the TPU-native
counterpart of the reference's per-row CUDA kernels
(``src/GPU_CUDAC++/Aggregation.cu:17-90``, ``MatrixOperations.cu``).
Reductions over a row's slots are axis-0 (sublane) reductions; the row axis
rides the 128-lane dimension.

Column access: the reference materialises an explicit CSC copy via cuSPARSE
(``MatrixOperations.cu:473-544``) so each thread can walk a column.  Here,
column-wise quantities (column sums, Aᵀ values aligned with A's slots) are
computed by scatter-add / gather over the ELL slots — fused XLA ops instead
of a format conversion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .formats import ELL


def take_neighbor(a: ELL, x: jnp.ndarray,
                  idx: jnp.ndarray | None = None) -> jnp.ndarray:
    """Gather the per-neighbour field ``x[idx]`` (idx defaults to
    ``a.cols``) — THE hot access pattern of strength/matching/Galerkin.

    With a window plan on ``a`` this rides the Pallas windowed-gather
    kernel; the plan covers every stored column plus each tile's own row
    range, so any index drawn from {stored cols} ∪ {own rows} (partner
    proposals, pair indices, leaders) is in-window.  Out-of-window junk
    (e.g. -1 sentinels clamped to 0) must be masked by the caller exactly
    as it already masks the XLA-gather result for sentinel indices.

    INVALID-SLOT CONTRACT: entries at slot ≥ rownnz[i] (and padding rows)
    return UNSPECIFIED values — the plain XLA gather returns x[padding
    col], the roll fast path returns the rolled neighbour, the windowed
    kernel returns clamped-window junk.  Every consumer must mask by slot
    validity (spmv via vals == 0, strength/matching via slot masks);
    nothing may branch on an invalid slot's value.

    ``x``: (m,) f32 / int32 / bool (bool goes through int32 bits).
    """
    if idx is None:
        if (getattr(a, "roll_offsets", None) is not None
                and a.shard is None and x.dtype != jnp.float64):
            # uniform-slot fast path: slot s's stored column is i + d_s
            # for ≥ 98 % of entries (true of every shipped stencil family
            # at the finest level — poisson row-major 5-point, csky3d
            # interiors), so the neighbour field is K contiguous shifted
            # reads instead of K·n windowed gathers (the gather chain
            # costs ∝ wr; rolls are flat ~0.1 ns/elem at any spread).
            # The few mismatched entries are patched by a precomputed
            # scatter (sparse/formats._roll_plan).
            xb = x.astype(jnp.int32) if x.dtype == jnp.bool_ else x
            if xb.shape[0] < a.npad:
                xb = jnp.pad(xb, (0, a.npad - xb.shape[0]))
            elif xb.shape[0] > a.npad:
                xb = xb[: a.npad]
            # multi-delta roll: entries off their own slot's mode delta
            # are overwhelmingly at ANOTHER slot's mode (boundary rows
            # pack the same stencil offsets at shifted slot positions),
            # so slot s selects per-lane among the |D| shared shifted
            # loads by comparing its actual delta — a K × |D| fused
            # VPU chain, no gather of any kind
            uniq = sorted(set(a.roll_offsets))
            rolls = {d: jnp.roll(xb, -d) for d in uniq}
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, a.npad),
                                            1)[0]
            outs = []
            for s, dm in enumerate(a.roll_offsets):
                o = rolls[dm]
                if len(uniq) > 1:
                    delta_s = a.cols[s] - rows
                    for d in uniq:
                        if d != dm:
                            o = jnp.where(delta_s == d, rolls[d], o)
                outs.append(o)
            out = jnp.stack(outs)
            if a.roll_ov is not None:    # residual deltas: tiny scatter
                ov_s, ov_r, ov_c = a.roll_ov
                out = out.at[ov_s, ov_r].set(xb[ov_c],
                                             mode="promise_in_bounds")
            return out != 0 if x.dtype == jnp.bool_ else out
        idx = a.cols
    if a.base_blk is None:
        return jnp.take(x, idx, axis=0)
    from ..ops.gather_pallas import windowed_take, windowed_take_sharded
    one_d = idx.ndim == 1
    if one_d:
        idx = idx[None, :]
    if a.shard is not None:
        mesh, axis, npr, hblk = a.shard
        xi = x.astype(jnp.int32) if x.dtype == jnp.bool_ else x
        if xi.dtype in (jnp.float32, jnp.int32):
            out = windowed_take_sharded(idx, xi, a.base_blk, a.wr, npr,
                                        hblk, mesh, axis)
            if x.dtype == jnp.bool_:
                out = out != 0
            return out[0] if one_d else out
        return jnp.take(x, idx[0] if one_d else idx, axis=0)
    if x.dtype == jnp.bool_:
        out = windowed_take(idx, x.astype(jnp.int32), a.base_blk, a.wr,
                            a.nsrc) != 0
    elif x.dtype in (jnp.float32, jnp.int32):
        out = windowed_take(idx, x, a.base_blk, a.wr, a.nsrc)
    else:   # f64 etc (host-parity paths): keep the XLA gather
        return jnp.take(x, idx[0] if one_d else idx, axis=0)
    return out[0] if one_d else out


def take_member_rows(members: jnp.ndarray, xs: jnp.ndarray,
                     base_blk, wr: int | None, nsrc: int | None
                     ) -> jnp.ndarray:
    """out[s, c] = xs[s, members[c]] — fetch whole slot rows at member
    indices (Galerkin pair merge).  The explicit ``base_blk``/``wr``/
    ``nsrc`` *members* window plan routes the gather (None → XLA gather
    fallback); no operator plan is consulted."""
    if wr is None:
        return jnp.take(xs, members, axis=1)
    from ..ops.gather_pallas import windowed_take_rows
    return windowed_take_rows(members, xs, base_blk, wr, nsrc)


def spmv(a, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x.  ``x``: (ncols_padded,) — padded slots must be 0-safe.

    Polymorphic over ELL and the DIA+ELL hybrid (fast solve-phase format).
    Invalid ELL slots have val = 0, so no masking is needed; ``cols``
    padding is 0 which is always in range.
    """
    if hasattr(a, "mesh"):        # HaloOp: sharded ppermute-halo path
        return a.spmv(x)
    if hasattr(a, "offsets"):
        from . import hybrid
        return hybrid.spmv(a, x)
    if getattr(a, "shard", None) is not None and a.base_blk is not None \
            and x.dtype == jnp.float32:
        return jnp.sum(a.vals * take_neighbor(a, x), axis=0)
    if a.base_blk is not None and x.dtype == jnp.float32:
        from ..ops.gather_pallas import windowed_gather_spmv
        return windowed_gather_spmv(a.cols, a.vals, x, a.base_blk, a.wr,
                                    a.nsrc)
    gathered = jnp.take(x, a.cols, axis=0)          # (K, n_pad)
    return jnp.sum(a.vals * gathered, axis=0)


def spmv_t(a: ELL, y: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """x = Aᵀ @ y via scatter-add (no transpose materialisation)."""
    contrib = a.vals * y[None, : a.npad]            # (K, n_pad)
    out = jnp.zeros((out_size,), dtype=contrib.dtype)
    return out.at[a.cols].add(contrib)


def extract_diag(a: ELL) -> jnp.ndarray:
    """(npad,) diagonal; 0 where a row stores no diagonal entry."""
    isdiag = (a.cols == a.row_iota()) & a.slot_mask()
    return jnp.sum(jnp.where(isdiag, a.vals, 0.0), axis=0)


def row_sum(a: ELL, absolute: bool = False, skip_diag: bool = False
            ) -> jnp.ndarray:
    """Σⱼ aᵢⱼ per row (optionally |aᵢⱼ|, optionally excluding the diagonal)."""
    v = jnp.abs(a.vals) if absolute else a.vals
    if skip_diag:
        v = jnp.where(a.cols == a.row_iota(), 0.0, v)
    # padding slots already hold 0
    return jnp.sum(v, axis=0)


def col_sum(a: ELL, absolute: bool = False, skip_diag: bool = False
            ) -> jnp.ndarray:
    """Σᵢ aᵢⱼ per column, via scatter-add (replaces the reference's CSC copy)."""
    v = jnp.abs(a.vals) if absolute else a.vals
    mask = a.slot_mask()
    if skip_diag:
        mask = mask & (a.cols != a.row_iota())
    v = jnp.where(mask, v, 0.0)
    out = jnp.zeros((a.npad,), dtype=v.dtype)
    return out.at[a.cols].add(v)


def _transposed_lookup(a: ELL, reduce_vals: bool):
    """Shared K-way transpose matching with O(K·n) live memory.

    For every stored (i → j) slot we need row j's entry for column i.  The
    naive formulation gathers whole K-wide rows per slot — a (K, K, n)
    intermediate that blows past HBM once coarse-level K reaches ~40.
    Instead, loop over the K *source* slots s₂ (a device ``fori_loop``):
    each iteration gathers one (K, n) plane — cols[s₂] and vals[s₂]
    evaluated at j = a.cols — and accumulates where the column matches i.
    Work is identical (O(K²·n) compares), peak memory drops K-fold.

    ``reduce_vals=True`` additionally tracks the hit mask, so value AND
    existence come out of ONE loop — this is the setup phase's costliest
    program (measured 175 ms at sky80 level 1), so it must never run
    twice per pass.
    """
    ri = a.row_iota()
    j = a.cols                                       # (K, n)
    nnz_j = take_neighbor(a, a.rownnz)               # (K, n)
    if reduce_vals:
        init = (jnp.zeros(j.shape, a.vals.dtype), jnp.zeros(j.shape, bool))
    else:
        init = jnp.zeros(j.shape, bool)

    def body(s2, acc):
        cols_row = jnp.take(a.cols, s2, axis=0)      # (n,)
        cols_j = take_neighbor(a, cols_row)          # (K, n)
        hit = (cols_j == ri) & (s2 < nnz_j)
        if reduce_vals:
            vals_row = jnp.take(a.vals, s2, axis=0)
            vals_j = take_neighbor(a, vals_row)
            return acc[0] + jnp.where(hit, vals_j, 0.0), acc[1] | hit
        return acc | hit

    return jax.lax.fori_loop(0, a.k, body, init)


def transposed_slot_values(a: ELL,
                           with_pairs: bool = False) -> jnp.ndarray:
    """(K, n_pad) array t where t[s, i] = A[j, i] for j = cols[s, i] (0 if
    the transposed entry is not stored).

    TPU analogue of the reference's per-μ-evaluation binary searches
    (``MatrixAccess.cu:28-47``): a vectorised K-way compare against row j's
    stored columns (K small), chunked to bound memory at large K.
    ``with_pairs=True`` also returns the pair-exists mask from the same
    loop (no second transpose-matching pass)."""
    vals_t, hit = _transposed_lookup(a, reduce_vals=True)
    if with_pairs:
        return vals_t, hit & a.slot_mask()
    return vals_t


def pair_exists(a: ELL) -> jnp.ndarray:
    """(K, n_pad) bool: True where the transposed entry (j, i) is stored."""
    return _transposed_lookup(a, reduce_vals=False) & a.slot_mask()


def transpose_slot_field(a: ELL, field: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fetch an arbitrary per-slot field through the transposed pattern.

    Returns (field_t, has_pair): field_t[s, i] = field[s', j] where slot
    (s, i) stores column j and slot (s', j) stores column i (0 where no
    such transposed slot exists), and has_pair marks slots whose
    transposed entry is stored.  Same O(K·n)-memory source-slot loop as
    ``_transposed_lookup``.
    """
    ri = a.row_iota()
    j = a.cols
    nnz_j = take_neighbor(a, a.rownnz)
    init = (jnp.zeros(j.shape, field.dtype), jnp.zeros(j.shape, bool))

    def body(s2, carry):
        acc, has = carry
        cols_row = jnp.take(a.cols, s2, axis=0)
        cols_j = take_neighbor(a, cols_row)
        hit = (cols_j == ri) & (s2 < nnz_j)
        f_row = jnp.take(field, s2, axis=0)
        f_j = take_neighbor(a, f_row)
        return acc + jnp.where(hit, f_j, 0), has | hit

    acc, has = jax.lax.fori_loop(0, a.k, body, init)
    return acc, has & a.slot_mask()


def symmetrized_offdiag_sums(a: ELL, vals_t: jnp.ndarray | None = None,
                             has_pair: jnp.ndarray | None = None
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (Σⱼ≠ᵢ |(aᵢⱼ + aⱼᵢ)/2|,  Σⱼ≠ᵢ (aᵢⱼ + aⱼᵢ)/2).

    Exact union-pattern merge semantics of the reference's two-pointer
    CSR/CSC walks (``Aggregation.cu:17-64``, ``AGMG.cpp:48-90``): a shared
    entry contributes |aᵢⱼ+aⱼᵢ|/2 once; an entry stored in only one of
    row i / column i contributes |a|/2.

    ``vals_t``/``has_pair``: the transposed values / pair-exists mask if
    the caller already has them (compute_strength does) — recomputing
    them here would double the costliest program of the setup pass.
    With a union-symmetric operator (``a.vals_t`` present) every term is
    a local field read: no transpose pass, no scatter correction.
    """
    union = a.vals_t is not None
    if vals_t is None:
        if union:
            vals_t, has_pair = a.vals_t, a.slot_mask()
        else:
            vals_t, has_pair = transposed_slot_values(a, with_pairs=True)
    mask = a.slot_mask()
    offdiag = mask & (a.cols != a.row_iota())
    sym = (a.vals + vals_t) / 2.0
    abs_from_rows = jnp.sum(jnp.where(offdiag, jnp.abs(sym), 0.0), axis=0)
    if union:
        # the union pattern stores BOTH directions, so each row's own
        # slots already cover every lone-transposed contribution
        plain_sum = jnp.sum(jnp.where(offdiag, sym, 0.0), axis=0)
        return abs_from_rows, plain_sum
    # an entry (i,j) stored while (j,i) is not contributes |aij|/2 to row
    # j's union pattern — scattered below
    lone = offdiag & ~has_pair
    extra = jnp.zeros((a.npad,), dtype=a.vals.dtype)
    extra = extra.at[a.cols].add(
        jnp.where(lone, jnp.abs(a.vals) / 2.0, 0.0))
    abs_sum = abs_from_rows + extra
    rs = row_sum(a, skip_diag=True)
    cs = col_sum(a, skip_diag=True)
    plain_sum = (rs + cs) / 2.0
    return abs_sum, plain_sum


def get_element(a: ELL, i: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Random element access A[i, j] (vectorised over index arrays)."""
    cols_i = jnp.take(a.cols, i, axis=1)      # (K, ...)
    vals_i = jnp.take(a.vals, i, axis=1)
    nnz_i = jnp.take(a.rownnz, i, axis=0)
    sl = jax.lax.broadcasted_iota(jnp.int32, cols_i.shape, 0)
    hit = (cols_i == j[None, ...]) & (sl < nnz_i[None, ...])
    return jnp.sum(jnp.where(hit, vals_i, 0.0), axis=0)


def to_dense(a: ELL) -> jnp.ndarray:
    """(nrows, ncols) dense materialisation (small matrices only)."""
    out = jnp.zeros((a.npad, a.ncols), dtype=a.vals.dtype)
    v = jnp.where(a.slot_mask(), a.vals, 0.0)
    out = out.at[a.row_iota(), a.cols].add(v)
    return out[: a.nrows]
