"""High-level solve API.

``two_level_from_p`` reproduces the reference's solve-phase wiring
(``src/common/bicg.cpp:138-180``): given A and an explicit prolongation
matrix P (e.g. a shipped ``<name>promatrix_*.mtx``), build the two-level
preconditioner and run preconditioned BiCGStab.  ``solve_hierarchy`` is the
general multilevel entry point used with our own aggregation setup.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.formats import CSR, ELL
from ..sparse import ops
from ..setup.prolongation import labels_from_p_csr
from ..setup.galerkin import galerkin_ell
from .hierarchy import Hierarchy, build_hierarchy
from . import krylov


def two_level_from_p(a: CSR, p: CSR, smoother_kind: str = "gs2",
                     cycle: str = "twolevel", dtype=jnp.float32,
                     **smoother_kw) -> Hierarchy:
    """Two-level hierarchy from an explicit piecewise-constant P.

    Mirrors ``MultiGridPrecond`` (bicg.cpp:29-44): Ac = PᵀAP factorised
    exactly (densely here), smoother standing in for the ILUT half, combined
    multiplicatively (pre_smooth=0, post_smooth=1 ⇒ c + S(v − A·c))."""
    labels_np, nc = labels_from_p_csr(p)
    a_ell = a.to_ell(dtype=dtype)
    labels = jnp.full((a_ell.npad,), -1, dtype=jnp.int32)
    labels = labels.at[: len(labels_np)].set(jnp.asarray(labels_np))
    ac = galerkin_ell(a_ell, labels, nc)
    return build_hierarchy(a_ell, [labels], [ac.astype(dtype)],
                           smoother_kind=smoother_kind,
                           cycle="vcycle" if cycle == "twolevel" else cycle,
                           pre_smooth=0, post_smooth=1, **smoother_kw)


def pad_vector(v: np.ndarray, npad: int, dtype=None) -> jnp.ndarray:
    out = jnp.zeros((npad,), dtype=dtype or v.dtype)
    return out.at[: v.shape[0]].set(jnp.asarray(v, dtype=dtype))


@partial(jax.jit, static_argnames=("method", "tol", "maxiter"))
def _solve_jit(hier: Hierarchy, b: jnp.ndarray, method: str, tol: float,
               maxiter: int):
    matvec = hier.matvec
    precond = hier.precondition
    if method == "bicgstab":
        return krylov.bicgstab(matvec, b, precond, tol=tol, maxiter=maxiter)
    if method == "cg":
        return krylov.cg(matvec, b, precond, tol=tol, maxiter=maxiter)
    if method == "fcg":
        return krylov.fcg(matvec, b, precond, tol=tol, maxiter=maxiter)
    if method == "gmres":
        return krylov.gmres(matvec, b, precond, tol=tol, maxiter=maxiter)
    if method == "none":   # unpreconditioned
        return krylov.bicgstab(matvec, b, None, tol=tol, maxiter=maxiter)
    raise ValueError(f"unknown method {method!r}")


def solve_hierarchy(hier: Hierarchy, b: np.ndarray | jnp.ndarray,
                    method: str = "bicgstab", tol: float = 1e-6,
                    maxiter: int = 10000) -> krylov.SolveResult:
    """Solve A x = b with the hierarchy as right preconditioner.

    ``b`` is a logical-size vector; it is zero-padded to the device shape
    and the solution is returned un-padded."""
    a = hier.levels[0].a if hier.levels else hier.coarse.a
    n = a.nrows
    dtype = a.dtype if hasattr(a, "offsets") else a.vals.dtype
    if isinstance(b, jax.Array) and b.shape[0] == a.npad:
        # already device-resident at the padded shape (possibly sharded
        # across processes — don't pull it to host)
        bp = b.astype(dtype)
    else:
        bp = pad_vector(np.asarray(b), a.npad, dtype=dtype)
    res = _solve_jit(hier, bp, method, float(tol), int(maxiter))
    return krylov.SolveResult(x=res.x[:n], iterations=res.iterations,
                              relres=res.relres, status=res.status)


def solve_refined(hier: Hierarchy, a_host: CSR, b: np.ndarray,
                  tol: float = 1e-8, inner_tol: float = 1e-5,
                  method: str = "bicgstab", max_outer: int = 8,
                  maxiter: int = 500):
    """Mixed-precision iterative refinement to tolerances beyond a single
    f32 device solve (the 1e-8 north-star target).

    Classic scheme: residuals are computed on the host in float64 against
    the exact CSR operator; each correction equation A·dx = r is solved on
    device (f32 hierarchy) to ``inner_tol``.  Converges to ``tol`` in a
    handful of outer sweeps as long as the inner solver achieves a modest
    residual reduction.

    Returns (x, relres, total_inner_iterations, outer_sweeps).
    """
    import scipy.sparse as sp

    a_sp = a_host.to_scipy()
    b = np.asarray(b, dtype=np.float64)
    normb = np.linalg.norm(b)
    x = np.zeros_like(b)
    total_inner = 0
    for outer in range(1, max_outer + 1):
        r = b - a_sp @ x
        relres = np.linalg.norm(r) / normb
        if relres < tol:
            return x, relres, total_inner, outer - 1
        res = solve_hierarchy(hier, r, method=method, tol=inner_tol,
                              maxiter=maxiter)
        total_inner += int(res.iterations)
        x = x + np.asarray(res.x, dtype=np.float64)
    r = b - a_sp @ x
    return x, np.linalg.norm(r) / normb, total_inner, max_outer


def solve(a: CSR, b: np.ndarray, config=None, timer=None):
    """One-call solve driven by the typed config surface.

    Builds the multilevel hierarchy from ``HierarchyConfig`` settings and
    runs the configured Krylov method; with ``config.refine_outer > 0``
    the f32 device solve is wrapped in f64 iterative refinement.
    Returns (x, SolveResult-like info dict).
    """
    import jax.numpy as jnp
    from ..utils.config import SolveConfig, HierarchyConfig
    from ..setup.aggregation import build_amg_setup
    from .hierarchy import build_hierarchy

    cfg = config or SolveConfig()
    hcfg = getattr(cfg, "hierarchy", None) or HierarchyConfig()
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    ell = a.to_ell(dtype=dtype)
    setup = build_amg_setup(ell, hcfg, timer=timer)
    cyc = "kcycle" if cfg.cycle == "kcycle" else "vcycle"
    pre = 0 if cfg.cycle == "twolevel" else 1
    hier = build_hierarchy(
        setup.matrices[0], setup.level_labels, setup.matrices[1:],
        smoother_kind=cfg.smoother.kind, cycle=cyc, pre_smooth=pre,
        combination="multiplicative" if cfg.multiplicative else "additive",
        post_smooth=1, degree=cfg.smoother.degree,
        omega=cfg.smoother.omega, sweeps=cfg.smoother.sweeps,
        lmin_frac=cfg.smoother.lmin_frac,
        inner_sweeps=cfg.smoother.inner_sweeps,
        lmax_safety=cfg.smoother.lmax_safety)
    if cfg.refine_outer > 0:
        x, relres, inner, outer = solve_refined(
            hier, a, b, tol=cfg.refine_tol, inner_tol=cfg.tol,
            method=cfg.method, max_outer=cfg.refine_outer,
            maxiter=cfg.max_iter)
        return x, {"relres": relres, "inner_iterations": inner,
                   "outer_sweeps": outer, "hierarchy": hier}
    res = solve_hierarchy(hier, b, method=cfg.method, tol=cfg.tol,
                          maxiter=cfg.max_iter)
    return np.asarray(res.x), {"relres": float(res.relres),
                               "iterations": int(res.iterations),
                               "status": int(res.status),
                               "hierarchy": hier}
