"""General sparse × sparse product (SpGEMM) on slot-major ELL operands.

The reference delegates SpGEMM to Eigen (``src/CPU_C++/AGMG.cpp:307-308``)
and cuSPARSE (``src/GPU_CUDAC++/MatrixOperations.cu:643-746``, csrgemm2's
hash tables / row-merging).  Hash tables don't vectorise on the VPU; the
TPU-native formulation is a **merge accumulator**:

    for each A slot k_a (K_A static steps):
        fetch B's whole slot rows at j = A.cols[k_a]      (windowed gather)
        scale by A.vals[k_a]
        merge into the running per-row accumulator:
            concatenate slots → per-lane sort by column → run-length sum
            → compact (the same fixed-extent local merge the pairwise
            Galerkin uses, setup/galerkin.py)

Every step is a static-shape (W, n) vectorised op; the only data-dependent
quantity — the true output row degree — is bounded by ``kc`` and verified
by the returned max-degree (the host driver grows ``kc`` and retries on
overflow, mirroring ``galerkin_ell``'s protocol).

Used by smoothed-aggregation prolongation (P = (I − ω D⁻¹A)·P₀ and the
Galerkin triple product with non-unit P), and exposed as a general
building block.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .formats import ELL, with_device_plan, _round_up
from . import ops


def _merge_rows(cand_c: jnp.ndarray, cand_v: jnp.ndarray, sentinel: int,
                kc: int):
    """Per-lane merge of (W, n) candidate slots: sort by column, sum runs,
    compact to the first kc slots.  Invalid slots carry col = sentinel
    (sorted last) and val = 0.  Returns (cols, vals, rownnz, max_deg)."""
    cand_c, cand_v = jax.lax.sort((cand_c, cand_v), dimension=0, num_keys=1)
    # run totals by a segmented prefix scan (log₂ W steps — the unrolled
    # suffix loop costs O(W) compiled ops per merge, which made the CPU
    # fallback's XLA compiles explode for wide products)
    first = jnp.concatenate([
        jnp.ones((1, cand_c.shape[1]), bool),
        cand_c[1:] != cand_c[:-1]], axis=0)

    def seg_add(a, b):
        (va, sa), (vb, sb) = a, b
        return jnp.where(sb, vb, va + vb), sa | sb

    merged, _ = jax.lax.associative_scan(seg_add, (cand_v, first), axis=0)
    # each run's total sits at its LAST element
    last = jnp.concatenate([cand_c[:-1] != cand_c[1:],
                            jnp.ones((1, cand_c.shape[1]), bool)], axis=0)
    keep = last & (cand_c < sentinel)
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=0) - 1
    rownnz = jnp.sum(keep.astype(jnp.int32), axis=0)
    W, n = cand_c.shape
    ok = keep & (pos < kc)
    safe_pos = jnp.where(ok, pos, kc)
    if W * kc <= 4096:
        # one-hot select-and-sum: lane-axis scatters are serialised on TPU
        # (measured 228 ms runtime / 11 s compile at (10, 10⁶) in the
        # Galerkin merge); O(W·kc·n) VPU work is far cheaper
        sel = safe_pos[None, :, :] == jax.lax.broadcasted_iota(
            jnp.int32, (kc, W, n), 0)
        out_c = jnp.sum(jnp.where(sel, cand_c[None], 0), axis=1,
                        dtype=jnp.int32)
        out_v = jnp.sum(jnp.where(sel, merged[None], 0.0), axis=1,
                        dtype=merged.dtype)
    else:
        out_c = jnp.zeros((kc + 1, n), jnp.int32)
        out_v = jnp.zeros((kc + 1, n), cand_v.dtype)
        ci = jax.lax.broadcasted_iota(jnp.int32, cand_c.shape, 1)
        out_c = out_c.at[safe_pos, ci].add(
            jnp.where(ok, cand_c, 0).astype(jnp.int32))
        out_v = out_v.at[safe_pos, ci].add(jnp.where(ok, merged, 0.0))
        out_c, out_v = out_c[:kc], out_v[:kc]
    # rows that overflowed kc keep their first kc slots; max_deg tells the
    # host to retry with a larger bound
    return out_c, out_v, jnp.minimum(rownnz, kc), jnp.max(rownnz)


@partial(jax.jit, static_argnames=("kc", "sentinel"))
def _spgemm_step(acc_c, acc_v, max_deg, a: ELL, b: ELL, ka, kc: int,
                 sentinel: int):
    """One A-slot expansion + merge.  The accumulator is pre-padded to
    the full width ``kc`` so EVERY step shares one compiled program —
    a single small merge instead of a K_A-stage fused chain (whose giant
    programs have segfaulted XLA:CPU's compiler under suite load)."""
    kb = b.k
    j = jnp.take(a.cols, ka, axis=0)
    av = jnp.take(a.vals, ka, axis=0)
    valid_a = (ka < a.rownnz) & (av != 0.0)
    cols_b = ops.take_member_rows(j, b.cols, a.base_blk, a.wr,
                                  a.nsrc)                 # (K_B, n)
    vals_b = ops.take_member_rows(
        j, b.vals.astype(jnp.float32) if a.base_blk is not None
        else b.vals, a.base_blk, a.wr, a.nsrc).astype(a.vals.dtype)
    nnz_b = ops.take_member_rows(j, b.rownnz[None, :], a.base_blk,
                                 a.wr, a.nsrc)[0]
    slot_b = jax.lax.broadcasted_iota(jnp.int32, (kb, a.npad), 0)
    ok = valid_a[None, :] & (slot_b < nnz_b[None, :])
    cand_c = jnp.concatenate(
        [acc_c, jnp.where(ok, cols_b, sentinel)], axis=0)
    cand_v = jnp.concatenate(
        [acc_v, jnp.where(ok, av[None, :] * vals_b, 0.0)], axis=0)
    acc_c, acc_v, rownnz, md = _merge_rows(cand_c, cand_v, sentinel, kc)
    acc_c = jnp.where(jax.lax.broadcasted_iota(
        jnp.int32, acc_c.shape, 0) < rownnz[None, :], acc_c, sentinel)
    return acc_c, acc_v, jnp.maximum(max_deg, md.astype(jnp.int32))


def spgemm_arrays(a: ELL, b: ELL, kc: int):
    """Device SpGEMM: returns (cols, vals, rownnz, max_deg) of C = A·B
    with slot width ``kc`` (entries beyond are dropped; check max_deg).
    Host-driven loop over A's slots; all steps share one jitted program
    (no host syncs until the caller reads max_deg)."""
    sentinel = b.npad  # > any valid column index of B
    acc_c = jnp.full((kc, a.npad), sentinel, jnp.int32)
    acc_v = jnp.zeros((kc, a.npad), a.vals.dtype)
    max_deg = jnp.zeros((), jnp.int32)
    for ka in range(a.k):
        acc_c, acc_v, max_deg = _spgemm_step(acc_c, acc_v, max_deg, a, b,
                                             jnp.int32(ka), kc, sentinel)
    rownnz = jnp.sum((acc_c < sentinel).astype(jnp.int32), axis=0)
    cols = jnp.where(acc_c < sentinel, acc_c, 0)
    vals = jnp.where(acc_c < sentinel, acc_v, 0.0)
    return cols, vals, rownnz, max_deg


def spgemm_ell(a: ELL, b: ELL, kc: int | None = None) -> ELL:
    """Host driver: C = A·B as an ELL, growing the width bound on
    overflow (one scalar readback per attempt, like galerkin_ell)."""
    if a.ncols > b.nrows:
        raise ValueError(f"shape mismatch: {a.ncols} vs {b.nrows}")
    if kc is None:
        # generous first guess: every overflow retry recompiles the whole
        # K_A-stage merge chain, which is far costlier than padded slots
        kc = min(a.k * b.k, max(2 * (a.k + b.k), 16), max(b.ncols, 1))
    while True:
        cols, vals, rownnz, max_deg = spgemm_arrays(a, b, kc)
        md = int(max_deg)
        if md <= kc:
            break
        kc = md
    kc_eff = max(min(md, kc), 1)
    c = ELL(cols=cols[:kc_eff], vals=vals[:kc_eff],
            rownnz=rownnz, nrows=a.nrows, ncols=b.ncols)
    return with_device_plan(c)


@partial(jax.jit, static_argnames=("kt", "npad_t"))
def _transpose_rounds(a: ELL, kt: int, npad_t: int):
    """kt claim rounds: each round, every output column (= source column
    j) claims its smallest-key unclaimed stored entry via scatter-min and
    deposits it at the round's output slot.  Keys (row-major, slot-minor)
    are unique per entry, so claims never collide and the transposed rows
    come out in CSR-canonical (ascending source row) order.  Cost: kt
    rounds of O(K*n) scatters/gathers -- no sort, no host round-trips,
    and the best-key gathers ride A's windowed-gather plan when present.
    Replaces the reference's CSC copy (MatrixOperations.cu:388-629) with
    a formulation that needs no per-lane pointers or atomics."""
    from . import ops as ell_ops
    mask = a.slot_mask()
    ri = a.row_iota()
    sl = jax.lax.broadcasted_iota(jnp.int32, a.cols.shape, 0)
    big = jnp.int32(np.iinfo(np.int32).max)
    key0 = ri * a.k + sl                      # unique per stored entry
    out_c = jnp.zeros((kt, npad_t), jnp.int32)
    out_v = jnp.zeros((kt, npad_t), a.vals.dtype)

    def body(r, st):
        rem, out_c, out_v = st
        key = jnp.where(rem, key0, big)
        best = jnp.full((npad_t,), big, jnp.int32).at[a.cols].min(
            key, mode="drop")
        best_at = ell_ops.take_neighbor(a, best) \
            if npad_t == a.npad else jnp.take(best, a.cols, axis=0)
        claimed = rem & (key == best_at)
        row_r = jnp.zeros((npad_t,), jnp.int32).at[a.cols].add(
            jnp.where(claimed, ri, 0), mode="drop")
        val_r = jnp.zeros((npad_t,), a.vals.dtype).at[a.cols].add(
            jnp.where(claimed, a.vals, 0.0), mode="drop")
        out_c = jax.lax.dynamic_update_index_in_dim(out_c, row_r, r, 0)
        out_v = jax.lax.dynamic_update_index_in_dim(out_v, val_r, r, 0)
        return rem & ~claimed, out_c, out_v

    _, out_c, out_v = jax.lax.fori_loop(0, kt, body, (mask, out_c, out_v))
    rownnz_t = jnp.zeros((npad_t,), jnp.int32).at[a.cols].add(
        mask.astype(jnp.int32), mode="drop")
    return out_c, out_v, rownnz_t


def transpose_ell(a: ELL, kt: int | None = None) -> ELL:
    """A-transpose as an ELL, fully device-resident (no host CSR
    round-trip).  ``kt`` bounds the output width (max stored entries per
    source column); when None it is read back once (max of a scatter-add
    column count -- the transpose itself then runs sync-free)."""
    npad_t = _round_up(max(a.ncols, 1), 1024)
    if kt is None:
        cnt = jnp.zeros((npad_t,), jnp.int32).at[a.cols].add(
            a.slot_mask().astype(jnp.int32), mode="drop")
        kt = int(jnp.max(cnt))
    kt = max(int(kt), 1)
    cols_t, vals_t, rownnz_t = _transpose_rounds(a, kt, npad_t)
    t = ELL(cols=cols_t, vals=vals_t, rownnz=rownnz_t,
            nrows=a.ncols, ncols=a.nrows)
    return with_device_plan(t)
