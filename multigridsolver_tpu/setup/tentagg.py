"""checktentagg — PSD quality re-check of tentative aggregate merges.

Ground truth: ``dag2l_checktentagg_GF`` in
``/root/reference/src/CPU_Matlab/dagtwolev_mex.f90:1052-1401``.  On
further passes (s ≥ 2), before accepting the merge of two existing
aggregates, AGMG 3.x tests the merged aggregate's quality **in the
original matrix**: build the symmetrised submatrix W over the union of
fine members, form

    W ← A_G − (2/κ)·D_G + (2 / (κ·1ᵀD_G1)) · D_G 1 1ᵀ D_G

(with the σ_G heuristic for negative external-connection sums), and
accept iff W is nonnegative definite — checked by a Cholesky whose
pivots must stay positive (the Fortran unrolls d ≤ 8 by hand; we run a
batched Cholesky on all candidate pairs at once).

The reference's *runner-up* mechanism (rtent/jtent candidate lists,
f90:969-1017) walks each node's μ-sorted neighbour list when the best
pair fails.  The TPU-native equivalent: a failed pair's *edge* is
removed from the allowed mask and the handshake matching runs again —
every node then proposes to its next-best surviving neighbour, which is
exactly the runner-up semantics without any per-node list walk.

Everything is built fine-side with scatters into a (nc, D, D) batch of
W matrices — no per-pair member loops, no data-dependent shapes:

* every fine node knows its aggregate (cum_labels), its rank within the
  aggregate (computed by one sort + segmented iota), and — through the
  coarse pairing — which tentative merge (leader coarse node) it belongs
  to and on which side;
* every stored A₀ entry whose endpoints both lie inside the same
  tentative merge scatters (a_ij)/2 into W[lead, slot_i, slot_j] and
  W[lead, slot_j, slot_i] (union-pattern symmetrisation, as the
  Fortran's two CSR walks do);
* the d×d test then runs as dense batched algebra over the nc axis with
  invalid member slots identity-embedded.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import ELL
from ..sparse import ops


def member_ranks(labels: jnp.ndarray, km: int) -> jnp.ndarray:
    """rank[i] = position of fine node i within its aggregate (0-based,
    ordered by fine index — the Fortran sorts ``set`` ascending), clipped
    to km-1.  Excluded nodes get rank 0 (masked downstream).

    km rounds of scatter-min (extract the smallest remaining member per
    aggregate) — the argsort+associative_scan formulation this replaces
    cost ~70 s of XLA compile per level shape on TPU."""
    npad = labels.shape[0]
    idxs = jnp.arange(npad, dtype=jnp.int32)
    valid = labels >= 0
    lab = jnp.where(valid, labels, npad).astype(jnp.int32)
    remaining = valid
    rank = jnp.zeros((npad,), jnp.int32)
    for r in range(km - 1):
        m = jnp.full((npad + 1,), npad, jnp.int32).at[lab].min(
            jnp.where(remaining, idxs, npad))
        taken = remaining & (jnp.take(m, lab, axis=0) == idxs)
        rank = jnp.where(taken, r, rank)
        remaining = remaining & ~taken
    # everyone not extracted in the first km-1 rounds clips to km-1
    rank = jnp.where(remaining & valid, km - 1, rank)
    return rank


def checktentagg(a0: ELL, si0: jnp.ndarray, labels: jnp.ndarray,
                 ac: ELL, paired: jnp.ndarray, ktg: float,
                 zerors: jnp.ndarray, km: int) -> jnp.ndarray:
    """Batched accept/reject of every tentative pair.

    ``a0``/``si0``: the ORIGINAL (finest) operator and its pass-1 Si
    vector.  ``labels``: fine → current-coarse cumulative labels (before
    this pass).  ``ac``: the current coarse operator (its window plan
    routes the coarse-side gathers).  ``paired``: this pass's tentative
    pairing over coarse nodes.  ``km``: static bound on members per
    existing aggregate (2^(s-1), capped by the caller).

    Returns acc (nc_pad,) bool per coarse node — True when the node's
    tentative pair passes (or it has no pair).  Both pair endpoints
    receive the same verdict.
    """
    ncp = paired.shape[0]
    npad = a0.npad
    D = 2 * km
    cnodes = jnp.arange(ncp, dtype=jnp.int32)
    partner_c = jnp.where(paired >= 0, paired, cnodes)
    haspair_c = (paired >= 0) & (partner_c != cnodes)
    lead_c = jnp.minimum(cnodes, partner_c)

    # ---- fine-side maps -------------------------------------------------
    rank = member_ranks(labels, km)
    lab_ok = labels >= 0
    safe_lab = jnp.where(lab_ok, labels, 0)
    # coarse fields pulled to the fine side through the labels (the
    # prolongation gather pattern; the label values are not covered by
    # a0's column plan, so these three stay on the XLA gather — one
    # n-sized gather each, paid only when check_tentagg is enabled)
    lead_f = jnp.take(lead_c, safe_lab, axis=0)
    inpair_f = jnp.take(haspair_c, safe_lab, axis=0) & lab_ok
    side_f = jnp.where(labels == lead_f, 0, 1)
    slot_f = jnp.clip(rank + km * side_f, 0, D - 1)

    # ---- neighbour-side maps (per stored slot) --------------------------
    lead_j = ops.take_neighbor(a0, lead_f.astype(jnp.int32))    # (K, npad)
    slot_j = jnp.clip(ops.take_neighbor(a0, slot_f.astype(jnp.int32)),
                      0, D - 1)
    labok_j = ops.take_neighbor(a0, lab_ok.astype(jnp.int32)) != 0
    internal = (a0.slot_mask() & inpair_f[None, :] & labok_j
                & (lead_j == lead_f[None, :]))
    offd = internal & (a0.cols != a0.row_iota())

    # ---- scatter W, sig, AGe batches ------------------------------------
    vals32 = a0.vals.astype(jnp.float32)
    lead_slot = jnp.where(inpair_f, lead_f, ncp)       # trash row ncp
    lead_bcast = jnp.broadcast_to(lead_slot[None, :], a0.cols.shape)
    slot_i_b = jnp.broadcast_to(slot_f[None, :], a0.cols.shape)
    w = jnp.zeros((ncp + 1, D, D), jnp.float32)
    half = jnp.where(offd, vals32 / 2.0, 0.0)
    tgt_l = jnp.where(offd, lead_bcast, ncp)
    w = w.at[tgt_l, slot_i_b, slot_j].add(half)
    w = w.at[tgt_l, slot_j, slot_i_b].add(half)
    # diagonal + per-member si (scattered once per fine member)
    diag0 = ops.extract_diag(a0).astype(jnp.float32)
    si32 = si0.astype(jnp.float32)
    dvals = jnp.where(zerors, si32, diag0)
    mslot = jnp.where(inpair_f, slot_f, 0)
    mlead = jnp.where(inpair_f, lead_f, ncp)
    w = w.at[mlead, mslot, mslot].add(jnp.where(inpair_f, dvals, 0.0))
    sig = jnp.zeros((ncp + 1, D), jnp.float32).at[mlead, mslot].add(
        jnp.where(inpair_f, si32, 0.0))
    valid = jnp.zeros((ncp + 1, D), bool).at[mlead, mslot].max(inpair_f)
    w, sig, valid = w[:ncp], sig[:ncp], valid[:ncp]

    # ---- the d×d quality algebra (batched over coarse nodes) ------------
    eps = jnp.asarray(100 * np.finfo(np.float32).eps, jnp.float32)
    eyemask = jnp.eye(D, dtype=bool)[None]                # (1, D, D)
    diagw = jnp.einsum("cjj->cj", w)                      # (ncp, D)
    offsum = jnp.sum(w, axis=2) - diagw
    # AGe uses the *original* si (f90:1145-1150: AGe = W(j,j) − si(j),
    # or 0 under zerors), before sig absorbs the internal off-diagonals
    age0 = jnp.where(zerors, 0.0, diagw - sig)
    sig = sig + offsum
    age = jnp.where(sig < 0.0, age0 + 2.0 * sig, age0)
    v = jnp.where(valid, diagw, 0.0)
    umd = 1.0 - 2.0 / ktg
    new_diag = umd * diagw - jnp.abs(sig)
    w = jnp.where(eyemask, new_diag[:, :, None], w)
    # rank-one correction  + (2/(κ·1ᵀD_G1)) · D_G 1 1ᵀ D_G
    beta = jnp.sum(v, axis=1)
    beta_safe = jnp.where(beta == 0.0, 1.0, beta)
    coef = 2.0 / ktg / beta_safe
    w = w + coef[:, None, None] * v[:, :, None] * v[:, None, :]
    # identity-embed invalid member slots, and — in the near-singular
    # case (A_G has the constant vector in its null space) — also the
    # LAST valid member: the test then runs on the leading
    # (d-1)-submatrix exactly as f90:1240-1247.  NOTE the Fortran
    # compares alp against repsmach·beta with beta already inverted to
    # dbndmum1/Σv (f90:1224,1240)
    alp = jnp.max(jnp.where(valid, jnp.abs(age), 0.0), axis=1)
    nvalid = jnp.sum(valid.astype(jnp.int32), axis=1)
    singular = alp < eps * jnp.abs(coef)
    sl = jax.lax.broadcasted_iota(jnp.int32, (ncp, D), 1)
    # valid slots are non-contiguous (side-0 members at 0..size1-1,
    # side-1 at km..km+size2-1), so "last member" = max valid slot index,
    # not nvalid-1
    last_valid = jnp.max(jnp.where(valid, sl, -1), axis=1)
    drop = singular[:, None] & (sl == last_valid[:, None])
    keep = valid & ~drop
    cross = keep[:, :, None] & keep[:, None, :]
    w = jnp.where(cross, w, 0.0)
    w = jnp.where(eyemask & ~keep[:, :, None], 1.0, w)

    chol = jnp.linalg.cholesky(w)
    ok = jnp.all(jnp.isfinite(jnp.einsum("cjj->cj", chol)), axis=1) & \
        jnp.all(jnp.einsum("cjj->cj", jnp.where(jnp.isfinite(chol), chol,
                                                0.0)) > 0.0, axis=1)
    acc = ok | ~haspair_c | (nvalid <= 1)
    # both endpoints read the leader's verdict (lead_c is within the
    # coarse band — ac's identity-covered plan handles it)
    acc_all = ops.take_neighbor(ac, acc.astype(jnp.int32),
                                idx=lead_c[None, :])[0] != 0
    return jnp.where(haspair_c, acc_all, True)
