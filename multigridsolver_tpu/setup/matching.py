"""Pairwise matching — the core of the aggregation setup.

The reference matches greedily: the CPU path walks nodes sequentially in
BFS ("CMK") order taking each node's best-μ available neighbour
(``src/CPU_C++/AGMG.cpp:138-179``); the CUDA path runs a racy parallel
claim — μ-sorted neighbour lists + BFS-level scheduling + ``atomicCAS``
ownership (``src/GPU_CUDAC++/Aggregation.cu:115-209``, driven by
``main.cu:154-159``).  TPUs have no global atomics, and a sequential scan
would serialise the device — so the TPU-native algorithm is **iterative
mutual-best handshake matching** (Luby/Manne-style locally-dominant edge
matching):

  round:  every unmatched node proposes to its best available allowed
          neighbour (minimal μ, ties broken by a canonical edge key that
          both endpoints compute identically);
  accept: proposals that are mutual (i→j and j→i) become pairs;
  repeat until no proposals exist; leftovers become singletons.

Because μ(i,j) is evaluated bitwise-identically from both endpoints
(see strength.py) and ties are broken by the canonical key
(min(i,j), max(i,j)), every round matches at least the locally-dominant
edges — the loop terminates in O(log n) rounds in practice and the result
is *deterministic* (unlike the reference's atomicCAS races, results.txt's
"iterations come out to be same" A/B being its only guard).

Acceptance criterion, as in the reference's own CPU-vs-GPU methodology:
solve-iteration parity, not identical pair sets.

An exact sequential CMK-greedy matcher (host/numpy, float64) is also
provided for parity testing against the reference CPU implementation.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import ELL
from ..sparse import ops
from .strength import StrengthData


def _edge_hash(a: ELL) -> jnp.ndarray:
    """Per-slot canonical edge hash, identical from both endpoints.

    Loop-invariant (depends only on the pattern): computed ONCE per
    matching, outside the handshake loop."""
    ri = a.row_iota()
    lo = jnp.minimum(ri, a.cols)
    hi = jnp.maximum(ri, a.cols)
    canon = (lo.astype(jnp.uint32) * jnp.uint32(2654435761)
             + hi.astype(jnp.uint32))
    h = canon
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    # int32-safe 31-bit hash key (int64 is emulated/slow on TPU); a hash
    # collision within one node's K candidates is ~K·2⁻³¹-rare and at
    # worst falls through to the smallest-column tie-break below
    return (h & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)


def _best_neighbor(a: ELL, mu: jnp.ndarray, allowed: jnp.ndarray,
                   available: jnp.ndarray,
                   ehash: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-node best available allowed neighbour by (μ, canonical edge key).

    Returns (npad,) int32: proposed partner or -1.

    The winning slot's column is extracted with pure K-axis min
    reductions (lexicographic (μ, ekey, col) minimum) — NOT
    argmin + take_along_axis: a per-lane dynamic gather along the slot
    axis lowers to a serialised cross-sublane select on TPU (measured
    ~6 ms of the 8.5 ms round cost at 10⁶ rows; the three reductions
    below are ~0.3 ms).
    """
    cand = allowed & ops.take_neighbor(a, available) \
                   & available[None, :]
    inf = jnp.asarray(jnp.inf, mu.dtype)
    mu_c = jnp.where(cand, mu, inf)
    best_mu = jnp.min(mu_c, axis=0, keepdims=True)          # (1, n)
    # Among slots achieving best_mu, break ties by the *hashed* canonical
    # edge key, identical from both endpoints.  A positional tie-break
    # (e.g. smallest index) creates directional cascades — on a row-major
    # grid every node prefers its north neighbour and matching proceeds
    # one row per round, O(√n) rounds; hashing gives the standard Luby
    # guarantee of expected O(log n) rounds.
    if ehash is None:
        ehash = _edge_hash(a)
    imax = jnp.iinfo(jnp.int32).max
    tie = cand & (mu_c == best_mu)
    ekey = jnp.where(tie, ehash, imax)
    best_ekey = jnp.min(ekey, axis=0, keepdims=True)
    pcand = jnp.where(ekey == best_ekey, a.cols, imax)
    partner = jnp.min(pcand, axis=0)
    has = jnp.any(tie, axis=0)
    return jnp.where(has, partner, -1)


def mutual_match(a: ELL, strength: StrengthData,
                 max_rounds: int = 64,
                 skipass_frac: float = 0.0) -> jnp.ndarray:
    """Run the handshake matching.

    Returns ``paired`` (npad,) int32: partner index for matched nodes,
    own index for singletons, -1 for excluded nodes (G0 etc.).

    ``skipass_frac`` > 0 enables the Fortran's skipass heuristic
    (``dagtwolev_mex.f90:314-323``, simplified): when the DD-excluded
    nodes alone already provide the target coarsening fraction, pairwise
    matching is skipped and every remaining node becomes a singleton.
    """
    npad = a.npad
    nodes = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)[:, 0]
    undecided = ~strength.excluded            # still seeking a partner
    if skipass_frac > 0.0:
        n_rows = jnp.sum(a.row_mask())
        n_excl = jnp.sum(strength.excluded & a.row_mask())
        skip = n_excl >= skipass_frac * jnp.maximum(n_rows, 1)
        # singleton-ise everyone by claiming no proposals can form
        undecided = undecided & ~skip
        post_skip = skip
    else:
        post_skip = None

    def cond(st):
        return st["again"] & (st["round"] < max_rounds)

    ehash = _edge_hash(a)        # loop-invariant, hoisted
    # roll-eligible operators check mutuality SLOT-WISE: pp[s, i] =
    # prop[cols[s, i]] is cols-structured, so it rides the K shifted
    # loads + narrow rank patch instead of a wide windowed gather at
    # idx = prop (whose targets span the full stencil spread).  prop[i]
    # is always one of row i's stored columns (or -1), so
    # ∃s: cols[s,i] = prop[i] ∧ pp[s,i] = i  ⟺  prop[prop[i]] = i.
    slotwise = (getattr(a, "roll_offsets", None) is not None
                and a.shard is None)
    if slotwise:
        slot_ok = (jax.lax.broadcasted_iota(jnp.int32,
                                            (a.k, npad), 0)
                   < a.rownnz[None, :])

    def body(st):
        prop = _best_neighbor(a, strength.mu, strength.allowed,
                              st["avail"], ehash=ehash)
        # mutual acceptance.  prop values are stored columns (or -1 → 0),
        # both covered by a's window plan (identity included)
        if slotwise:
            pp = ops.take_neighbor(a, prop)
            hit = slot_ok & (a.cols == prop[None, :]) \
                & (pp == nodes[None, :])
            mutual = (prop >= 0) & jnp.any(hit, axis=0)
        else:
            prop_of_prop = ops.take_neighbor(a, prop,
                                             idx=jnp.maximum(prop, 0))
            mutual = (prop >= 0) & (prop_of_prop == nodes)
        paired = jnp.where(mutual & st["avail"], prop, st["paired"])
        avail = st["avail"] & ~mutual
        # nodes with no proposal left will never match: close them out as
        # singletons *only* when they also cannot be proposed to any more —
        # conservative: keep them until the loop exits, then singleton-ise.
        again = jnp.any(mutual & st["avail"])
        return dict(paired=paired, avail=avail, again=again,
                    round=st["round"] + 1)

    init = dict(paired=jnp.full((npad,), -1, jnp.int32),
                avail=undecided,
                again=jnp.asarray(True),
                round=jnp.int32(0))
    st = jax.lax.while_loop(cond, body, init)
    paired = st["paired"]
    # leftovers (still available, not excluded) become singletons
    paired = jnp.where(st["avail"] & undecided, nodes, paired)
    if post_skip is not None:
        paired = jnp.where(post_skip & ~strength.excluded, nodes, paired)
    return jnp.where(strength.excluded, -1, paired)


def labels_from_pairs(paired: jnp.ndarray, excluded: jnp.ndarray,
                      a: ELL | None = None
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Number aggregates and label nodes.

    Leader = smaller index of a pair (``paired[i] >= i`` ⇔ i leads, exactly
    the GPU's get_useful_pairs rule, Aggregation.cu:214-225); aggregates are
    numbered by leader order via a prefix sum (the CUB scan's role,
    PrefixSum.cu:6-21 — here jnp.cumsum).

    Returns (labels, nc) with labels[i] = -1 for excluded nodes and nc a
    device scalar.
    """
    from ..ops.scan import blocked_cumsum
    npad = paired.shape[0]
    nodes = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)[:, 0]
    active = (paired >= 0) & ~excluded
    leader = active & (paired >= nodes)
    agg_of_leader = blocked_cumsum(leader.astype(jnp.int32)) - 1
    # follower takes its partner's (the leader's) aggregate id
    partner = jnp.maximum(paired, 0)
    if a is not None:
        agg_of_partner = ops.take_neighbor(a, agg_of_leader, idx=partner)
    else:
        agg_of_partner = jnp.take(agg_of_leader, partner, axis=0)
    labels = jnp.where(leader, agg_of_leader, agg_of_partner)
    labels = jnp.where(active, labels, -1).astype(jnp.int32)
    nc = jnp.sum(leader.astype(jnp.int32))
    return labels, nc


def greedy_match_host(a_csr, ktg: float, first_pass_excluded: np.ndarray,
                      si: np.ndarray, order: np.ndarray | None = None
                      ) -> np.ndarray:
    """Exact sequential greedy matching (numpy, float64) in the given
    priority order — parity twin of ``AGMG.cpp:138-179``.

    ``a_csr``: host CSR.  Returns labels (n,) int32 (-1 = excluded).
    """
    n = a_csr.nrows
    indptr, indices, data = a_csr.indptr, a_csr.indices, a_csr.data
    dense_diag = np.zeros(n)
    for i in range(n):
        for k in range(indptr[i], indptr[i + 1]):
            if indices[k] == i:
                dense_diag[i] = data[k]

    def coeff(i, j):
        lo, hi = indptr[i], indptr[i + 1]
        pos = np.searchsorted(indices[lo:hi], j)
        if pos < hi - lo and indices[lo + pos] == j:
            return data[lo + pos]
        return 0.0

    if order is None:
        order = cmk_order_host(a_csr)
    in_u = ~first_pass_excluded.astype(bool).copy()
    labels = np.full(n, -1, np.int32)
    nc = 0
    for i in order:
        if not in_u[i]:
            continue
        best_j, best_mu = -1, np.inf
        for k in range(indptr[i], indptr[i + 1]):
            j = indices[k]
            if j == i or not in_u[j]:
                continue
            aij = data[k]
            if aij == 0.0:
                continue
            aii, ajj = dense_diag[i], dense_diag[j]
            if aii - si[i] + ajj - si[j] < 0:
                continue
            aji = coeff(j, i)
            with np.errstate(divide="ignore", invalid="ignore"):
                num = 2.0 / (1.0 / aii + 1.0 / ajj)
                den = (-(aij + aji) / 2.0
                       + 1.0 / (1.0 / (aii - si[i]) + 1.0 / (ajj - si[j])))
                mu = num / den
            if mu > 0.0 and mu < best_mu:
                best_j, best_mu = j, mu
        if best_j != -1 and best_mu <= ktg:
            labels[i] = nc
            labels[best_j] = nc
            in_u[i] = in_u[best_j] = False
        else:
            labels[i] = nc
            in_u[i] = False
        nc += 1
    return labels


def cmk_order_host(a_csr) -> np.ndarray:
    """BFS visitation order from node 0 — the reference's simplified "CMK"
    (``AGMG.cpp:14-46``: no degree sort, no reversal; unreached nodes are
    appended, making the routine total where the reference asserts
    connectivity)."""
    n = a_csr.nrows
    indptr, indices = a_csr.indptr, a_csr.indices
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    cnt = 0
    for start in range(n):
        if visited[start]:
            continue
        visited[start] = True
        order[cnt] = start
        cnt += 1
        head = cnt - 1
        while head < cnt:
            u = order[head]
            head += 1
            for k in range(indptr[u], indptr[u + 1]):
                v = indices[k]
                if not visited[v]:
                    visited[v] = True
                    order[cnt] = v
                    cnt += 1
    return order


def cmk_order_genuine_host(a_csr) -> np.ndarray:
    """Genuine Cuthill-McKee — the Fortran ground truth
    (``dagtwolev_mex.f90:529-645``): degree-1 nodes first (index order),
    minimum-degree start, each BFS front's new neighbours appended in
    ascending-degree (stable) order, reducible restarts from the next
    unnumbered node of progressively relaxed minimal degree.  The
    reference's C++ "CMK" (AGMG.cpp:14-46) is the simplified BFS in
    :func:`cmk_order_host`; this is the full rule.  No reversal — AGMG
    uses plain CMK, not RCMK."""
    n = a_csr.nrows
    indptr, indices = a_csr.indptr, a_csr.indices
    deg = np.diff(indptr)
    order = np.empty(n, dtype=np.int64)
    numbered = np.zeros(n, dtype=bool)
    i2 = 0
    ones = np.flatnonzero(deg <= 1)
    order[: len(ones)] = ones
    numbered[ones] = True
    i2 = len(ones)
    if i2 >= n:
        return order
    rest = np.flatnonzero(deg > 1)
    jj = rest[np.argmin(deg[rest])]
    mindg = deg[jj]
    ijs = -1
    while True:
        order[i2] = jj
        numbered[jj] = True
        i2 += 1
        i1 = i2 - 1
        while i1 < i2 and i2 < n:
            u = order[i1]
            nbrs = indices[indptr[u]: indptr[u + 1]]
            new = [v for v in nbrs if v != u and not numbered[v]]
            new.sort(key=lambda v: deg[v])        # stable ascending degree
            for v in new:
                order[i2] = v
                numbered[v] = True
                i2 += 1
            i1 += 1
        if i2 >= n:
            return order
        jj = -1
        while jj < 0:
            ijs += 1
            if ijs >= n:
                mindg += 1
                ijs = 0
            if not numbered[ijs] and deg[ijs] == mindg:
                jj = ijs
