"""Typed configuration for the AGMG setup/solve pipeline.

Exposes the *full* parameter surface of the reference, which is scattered
across three places:

* CLI args ``<ktg> <npass> <tou>`` (``src/CPU_C++/main.cpp:155-163``,
  ``src/GPU_CUDAC++/main.cu:27-39``),
* the MATLAB API defaults (``src/CPU_Matlab/agtwolev.m:67-77``), and
* the Fortran tunables module (``src/CPU_Matlab/dagtwolev_mex.f90:40-141``:
  ``kaptg_blocdia=8 / kaptg_dampJac=10``, ``checkdd=-0.5``,
  ``targetcoarsefac=4``, ``fracnegrcsum=0.25``, ``trspos=0.45``,
  ``maxlev=40``, npass clamped ≤ 10 at line 154).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class AggregationConfig:
    """Setup-phase (pairwise aggregation) parameters."""

    # Pair-quality threshold κ ("ktg"): accept pair iff 0 < μ(i,j) ≤ ktg.
    # Reference default: 10 nonsym / 8 sym (agtwolev.m:69, f90:103).
    ktg: float = 10.0
    # Number of pairwise passes (aggregate size up to 2^npass).
    # agtwolev.m:68 default 2; f90:154 clamps to ≤ 10.
    npass: int = 2
    # Early-exit coarsening factor τ: stop when nnz(Ac) ≤ nnz(A)/tou
    # (AGMG.cpp:309, main.cu:100).  The Fortran equivalent is
    # targetcoarsefac (f90:105, default 4); the published benchmarks used 8.
    tou: float = 8.0
    # Stop further passes when the coarse grid is already smaller than this
    # (AGMG.cpp:310 `max_restriction`; 0 disables).
    max_restriction: int = 0
    # Diagonal-dominance exclusion (G0): node i is kept out of aggregation if
    # aii ≥ dd_threshold(ktg) · Σⱼ≠ᵢ|(aij+aji)/2|  (AGMG.cpp:119,
    # Aggregation.cu:58-61).  The Fortran uses
    # checkddJ = max(|checkdd|, κ/(κ−2)) (f90:161-162) with checkdd = -0.5.
    checkdd: float = -0.5
    # Transfer node unaggregated if its largest positive off-diagonal exceeds
    # trspos · aii (f90:759, default 0.45).
    trspos: float = 0.45
    # "zerors" rule: if more than fracnegrcsum · n nodes have negative mean
    # row+col sum, treat the diagonal as row-sum-zero (f90:765-770).
    fracnegrcsum: float = 0.25
    # skipass heuristic (dagtwolev_mex.f90:314-323): skip the first
    # pairwise pass when the DD-excluded nodes alone already achieve the
    # target coarsening — skip iff n_excl ≥ skipass_frac · n.  The Fortran
    # uses the condition n > targetcoarsefac·(n − ndd), i.e. skipass_frac
    # = 1 − 1/targetcoarsefac, and runs ONE extra pass to compensate
    # (npass1 = npass + 1, f90:319); we reproduce both.  0 disables.
    skipass_frac: float = 0.0
    # Symmetric-problem mode (agtwolev.m `sym`): skips the transpose work and
    # uses the symmetric pairing thresholds.
    symmetric: bool = False
    # Matching algorithm: "mutual" = TPU-native iterative mutual-best
    # handshake matching; "greedy" = exact sequential CMK-priority greedy
    # matching (host, parity with AGMG.cpp:101-194).
    matching: str = "mutual"
    # Maximum mutual-matching handshake rounds (upper bound; converges much
    # earlier in practice).
    max_matching_rounds: int = 64
    # Optional tentative-aggregate PSD quality re-check in the original fine
    # matrix, as in dag2l_checktentagg (f90:1052-1401).
    check_tentagg: bool = False
    # CMK flavour for the exact-greedy parity path: "simple" = the C++
    # reference's BFS (AGMG.cpp:14-46), "genuine" = the Fortran's full
    # min-degree/degree-sorted rule (dagtwolev_mex.f90:529-645)
    cmk_mode: str = "simple"
    # Pair-quality formulation: "simple" = the C++/CUDA ports' μ
    # (AGMG.cpp:92-99); "notay" = the full AGMG 3.0 δ/η/σ formulation with
    # indefinite-case safeguards (dagtwolev_mex.f90:2603-2655).
    mu_mode: str = "simple"


@dataclass(frozen=True)
class HierarchyConfig:
    """Multilevel hierarchy construction parameters (beyond the reference's
    two-level scheme; the Fortran allows maxlev=40 — f90:101)."""

    max_levels: int = 12
    # Coarsest-level size at which we stop coarsening and factor densely.
    max_coarse_size: int = 512
    aggregation: AggregationConfig = field(default_factory=AggregationConfig)
    # Smoothed-aggregation prolongation (Vaněk-style, setup/smoothed.py):
    # None = the reference's piecewise-constant P; a float ω applies one
    # damped-Jacobi smoothing step P = (I − ωD⁻¹A)P₀ per level and builds
    # the coarse operators by the general SpGEMM triple product.
    smooth_p: float | None = None


@dataclass(frozen=True)
class SmootherConfig:
    kind: str = "chebyshev"     # jacobi | l1jacobi | chebyshev | gs2 | ilu0
    sweeps: int = 2
    # weighted-Jacobi damping
    omega: float = 0.8
    # Chebyshev: polynomial degree and spectral-interval fraction
    degree: int = 3
    lmax_safety: float = 1.1
    lmin_frac: float = 0.30
    # two-stage Gauss-Seidel inner Jacobi sweeps
    inner_sweeps: int = 2


@dataclass(frozen=True)
class SolveConfig:
    """Solve-phase parameters (BiCGStab defaults follow
    ``src/common/bicg.cpp:148, 164`` — tol 1e-6, maxit 10000)."""

    method: str = "bicgstab"    # bicgstab | fcg | cg | gmres
    tol: float = 1e-6
    max_iter: int = 10000
    cycle: str = "kcycle"       # twolevel | vcycle | kcycle
    # multiplicative vs additive combination of the coarse correction and the
    # smoother in the two-level preconditioner (main.cpp:70-75)
    multiplicative: bool = True
    smoother: SmootherConfig = field(default_factory=SmootherConfig)
    # dtype for the device solve
    dtype: str = "float32"
    # mixed-precision iterative refinement to reach tighter tolerances than
    # a single f32 Krylov solve allows (e.g. the 1e-8 north-star target)
    refine_outer: int = 0
    refine_tol: float = 1e-8
    # hierarchy construction settings (None = defaults)
    hierarchy: HierarchyConfig | None = None
