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

from .formats import ELL, with_device_plan
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


def transpose_ell(a: ELL, kc: int | None = None) -> ELL:
    """Aᵀ as an ELL (host-driven width growth).  Built by relabelling each
    stored (i, j, v) to (j, i, v) through one global sort — the device
    sort path of galerkin_ell reused with identity labels."""
    from ..setup.galerkin import galerkin_ell_arrays
    # reuse: Aᵀ = "Galerkin" of A with row labels = column index requires
    # a different relabel; simplest correct device route: sort the COO by
    # (col, row) and rebuild — delegated to galerkin_ell_arrays' sort by
    # treating (col → row) as (row' → col') via a swapped ELL view is not
    # expressible slot-major, so go through the host CSR transpose (small
    # one-time cost; device-resident transpose arrives with the windowed
    # scatter kernel).
    t = a.to_csr().transpose()
    return t.to_ell(k=None, dtype=a.vals.dtype)
