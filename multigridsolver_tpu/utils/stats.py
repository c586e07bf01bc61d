"""Setup statistics and observability.

The Fortran ground truth prints rich setup diagnostics: pass counts, the
quality threshold, and a histogram of accepted pair qualities (its
``save_trs`` accounting, ``dagtwolev_mex.f90:517-526, 1033-1048``), plus
peak-memory accounting (``memi/memr/memax``).  TPU equivalents:

* :func:`aggregate_quality_histogram` — distribution of μ over accepted
  pairs (⌊μ⌋ buckets, like save_trs), plus singleton/excluded counts;
* :func:`setup_report` — per-round coarsening table (nc, nnz, complexity);
* :func:`device_memory_report` — live/peak HBM from the JAX runtime,
  replacing the Fortran's hand-rolled memory counters;
* :func:`trace` — context manager around ``jax.profiler`` for device
  traces (the reference's TicToc can only see host wall-clock).
"""
from __future__ import annotations

from contextlib import contextmanager

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import ELL
from ..sparse import ops


def aggregate_quality_histogram(a: ELL, labels, nbuckets: int = 10):
    """Histogram of pair quality μ(i, j) over the matched pairs.

    Mirrors the Fortran's save_trs: bucket k counts pairs with
    ⌊μ⌋ + 1 == k (clamped to nbuckets).  Returns (hist, n_pairs,
    n_singletons, n_excluded).
    """
    from ..setup.strength import compute_strength

    labels_np = np.asarray(labels)[: a.nrows]
    st = compute_strength(a, ktg=float("inf"), first_pass=False)
    mu = np.asarray(st.mu)
    cols = np.asarray(a.cols)
    nnzr = np.asarray(a.rownnz)
    # find each aggregate's pair (i < j with same label)
    order = np.argsort(labels_np, kind="stable")
    ls = labels_np[order]
    starts = np.flatnonzero(np.concatenate([[True], ls[1:] != ls[:-1]]))
    sizes = np.diff(np.append(starts, len(ls)))
    hist = np.zeros(nbuckets, dtype=np.int64)
    n_pairs = n_single = 0
    for s, sz in zip(starts, sizes):
        if ls[s] < 0:
            continue
        if sz == 1:
            n_single += 1
            continue
        members = np.sort(order[s: s + sz])
        i, j = members[0], members[1]
        # μ from i's slot for j
        mu_ij = None
        for k in range(nnzr[i]):
            if cols[k, i] == j:
                mu_ij = mu[k, i]
                break
        if mu_ij is not None and np.isfinite(mu_ij) and mu_ij > 0:
            b = min(int(mu_ij), nbuckets - 1)
            hist[b] += 1
        n_pairs += 1
    n_excl = int((labels_np < 0).sum())
    return hist, n_pairs, n_single, n_excl


def setup_report(setup) -> str:
    """Coarsening table + operator complexity for a SetupResult."""
    lines = ["level        n          nnz    ratio   nnz-ratio"]
    n0 = setup.matrices[0].nrows
    nnz0 = setup.matrices[0].nnz
    prev_n = None
    total_nnz = 0
    for l, m in enumerate(setup.matrices):
        nnz = m.nnz
        total_nnz += nnz
        ratio = f"{prev_n / m.nrows:.2f}" if prev_n else "  - "
        lines.append(f"{l:>5} {m.nrows:>10} {nnz:>12}   {ratio:>5}"
                     f"   {nnz / nnz0:>8.3f}")
        prev_n = m.nrows
    lines.append(f"operator complexity: {total_nnz / nnz0:.3f}")
    return "\n".join(lines)


def device_memory_report() -> dict:
    """Live HBM stats from the runtime (replaces Fortran memi/memr/memax)."""
    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keys if stats and k in stats}


@contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Device-level profiling around a region (view with TensorBoard or
    xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
