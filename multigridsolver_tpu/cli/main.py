"""Command-line drivers mirroring the reference's binaries.

    python -m multigridsolver_tpu setup <matrix> [--ktg --npass --tou]
        ≙ ``src/CPU_C++/main`` / ``src/GPU_CUDAC++/main`` CLIs
          (``main.cpp:153-239``, ``main.cu:18-297``): read
          ``<dir>/<matrix>.mtx``, run multi-pass pairwise aggregation,
          write ``<dir>/<matrix>promatrix_tpu.mtx``.

    python -m multigridsolver_tpu solve <matrix> [tpu|cpu|gpu] [...]
        ≙ ``src/common/bicg`` (``bicg.cpp:138-180``): read the matrix and a
          prolongation file, build the two-level preconditioner, solve
          against a random right-hand side, print iterations + tolerance.
          With ``--multilevel`` the full K-cycle hierarchy is used instead
          of the two-level + shipped-P combination.

    python -m multigridsolver_tpu generate poisson|csky2d|csky3d <n>
        ≙ ``src/common/poisson`` (``poisson.cpp:7-41``) plus generators for
          the CSky suites (reverse-engineered; no generator ships with the
          reference).

    python -m multigridsolver_tpu gridplot <matrix> <device>
        ≙ ``src/common/gridPlot.cpp`` + ``plotMatrix.py``: color the
          aggregates of a 2D problem and render a PNG.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _matrix_path(args, name):
    return os.path.join(args.dir, f"{name}.mtx")


def cmd_setup(args):
    import jax.numpy as jnp
    from ..io import read_mtx, write_mtx
    from ..setup.aggregation import pairwise_aggregate
    from ..setup.prolongation import p_csr_from_labels
    from ..utils.config import AggregationConfig
    from ..utils.timing import PhaseTimer, print_info

    a = read_mtx(_matrix_path(args, args.matrix))
    print_info("matrix", f"{a.nrows}x{a.ncols}, nnz={a.nnz}")
    # carry the transposed-value field (free aji reads in the setup; on
    # structurally symmetric inputs the pattern is unchanged)
    ell = a.to_ell(dtype=jnp.float32 if args.f32 else jnp.float64,
                   with_transpose=True)
    cfg = AggregationConfig(ktg=args.ktg, npass=args.npass, tou=args.tou,
                            matching=args.matching,
                            check_tentagg=args.check_tentagg)
    timer = PhaseTimer()
    with timer.phase("setup.total", block_on=None):
        res = pairwise_aggregate(ell, cfg, timer=timer)
    timer.report()
    for i, p in enumerate(res.passes):
        print_info(f"AGMG round {i+1} completed, matrix size", p.nc)
    if args.verbose:
        # setup statistics, as the Fortran prints at the end of dag2l
        # (dagtwolev_mex.f90:517-526): coarsening table + μ-quality
        # histogram of the matched pairs (save_trs moral equivalent)
        from ..utils.stats import aggregate_quality_histogram
        n, nnz = a.nrows, a.nnz
        print_info("coarsening", f"{n} -> {res.nc} "
                   f"(ratio {n / max(res.nc, 1):.2f})")
        for i, p in enumerate(res.passes):
            print_info(f"  pass {i+1}", f"nc={p.nc} nnz={p.nnz} "
                       f"nnz-ratio={p.nnz / nnz:.3f}")
        hist, n_pairs, n_single, n_excl = \
            aggregate_quality_histogram(ell, res.labels)
        print_info("pairs / singletons / excluded",
                   f"{n_pairs} / {n_single} / {n_excl}")
        print_info("pair-quality histogram (bucket k: k-1 < mu <= k)",
                   " ".join(str(int(h)) for h in hist))
    p = p_csr_from_labels(np.asarray(res.labels)[: a.nrows], res.nc)
    out = _matrix_path(args, f"{args.matrix}promatrix_{args.tag}")
    write_mtx(out, p)
    print_info("wrote", out)


def cmd_solve(args):
    import jax.numpy as jnp
    from ..io import read_mtx
    from ..solve import two_level_from_p, solve_hierarchy
    from ..utils.timing import PhaseTimer, print_info

    a = read_mtx(_matrix_path(args, args.matrix))
    rng = np.random.RandomState(args.seed)
    b = rng.rand(a.nrows)
    dtype = jnp.float32 if args.f32 else jnp.float64
    timer = PhaseTimer()
    if args.multilevel:
        from ..setup.aggregation import build_amg_setup
        from ..solve.hierarchy import build_hierarchy
        from ..utils.config import AggregationConfig, HierarchyConfig
        ell = a.to_ell(dtype=dtype)
        cfg = HierarchyConfig(
            max_coarse_size=args.max_coarse,
            aggregation=AggregationConfig(ktg=args.ktg, npass=args.npass,
                                          tou=args.tou,
                                          check_tentagg=args.check_tentagg),
            smooth_p=args.smooth_p)
        with timer.phase("setup"):
            setup = build_amg_setup(ell, cfg)
        print_info("levels", [m.nrows for m in setup.matrices])
        combo = "additive" if args.additive else "multiplicative"
        with timer.phase("hierarchy"):
            hier = build_hierarchy(setup.matrices[0], setup.level_labels,
                                   setup.matrices[1:],
                                   smoother_kind=args.smoother,
                                   cycle="kcycle", pre_smooth=1,
                                   post_smooth=1, combination=combo,
                                   p_ops=setup.p_ops,
                                   pt_ops=setup.pt_ops)
    else:
        p = read_mtx(_matrix_path(args,
                                  f"{args.matrix}promatrix_{args.device}"))
        with timer.phase("hierarchy"):
            hier = two_level_from_p(
                a, p, smoother_kind=args.smoother, dtype=dtype,
                combination="additive" if args.additive else
                "multiplicative")
    with timer.phase("solve"):
        res = solve_hierarchy(hier, b, method=args.method, tol=args.tol,
                              maxiter=args.maxiter)
    timer.report()
    if int(res.status) == 0:
        print_info("Tolerance", float(res.relres))
        print_info("Number of iterations BICG", int(res.iterations))
    else:
        print(f"solver problem, status {int(res.status)}", file=sys.stderr)
        sys.exit(2)


def cmd_generate(args):
    from .generators import poisson2d, csky2d, csky3d
    from ..io import write_mtx
    gen = {"poisson": poisson2d, "csky2d": csky2d, "csky3d": csky3d}
    mat = gen[args.family](args.n)
    name = args.out or {
        "poisson": f"poisson{args.n * args.n}",
        "csky2d": f"CSky2d{args.n}",
        "csky3d": f"CSky3d{args.n}"}[args.family]
    out = _matrix_path(args, name)
    write_mtx(out, mat)
    print(f"wrote {out}  ({mat.nrows}x{mat.ncols}, nnz={mat.nnz})",
          file=sys.stderr)


def cmd_gridplot(args):
    from .gridplot import grid_plot
    grid_plot(_matrix_path(args, args.matrix),
              _matrix_path(args, f"{args.matrix}promatrix_{args.device}"),
              out_png=os.path.join(
                  args.dir, f"{args.matrix}grid_{args.device}.png"),
              out_mtx=os.path.join(
                  args.dir, f"{args.matrix}grid_{args.device}.mtx"))


def build_parser():
    ap = argparse.ArgumentParser(prog="multigridsolver_tpu")
    ap.add_argument("--dir", default="matrices",
                    help="matrix directory (reference uses ../../matrices)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("setup", help="aggregation setup; writes promatrix")
    s.add_argument("matrix")
    s.add_argument("--ktg", type=float, default=10.0)
    s.add_argument("--npass", type=int, default=2)
    s.add_argument("--tou", type=float, default=8.0)
    s.add_argument("--check-tentagg", action="store_true",
                   help="PSD re-check of tentative aggregate merges in the "
                        "original matrix (dag2l_checktentagg)")
    s.add_argument("--matching", default="mutual",
                   choices=["mutual", "greedy"])
    s.add_argument("--tag", default="tpu")
    s.add_argument("--f32", action="store_true")
    s.add_argument("-v", "--verbose", action="store_true",
                   help="print coarsening table + pair-quality histogram "
                        "(the Fortran's setup statistics, f90:517-526)")
    s.set_defaults(fn=cmd_setup)

    s = sub.add_parser("solve", help="preconditioned Krylov solve")
    s.add_argument("matrix")
    s.add_argument("device", nargs="?", default="tpu",
                   help="promatrix source tag (cpu|gpu|tpu)")
    s.add_argument("--method", default="bicgstab",
                   choices=["bicgstab", "cg", "fcg", "gmres"])
    s.add_argument("--additive", action="store_true",
                   help="additive coarse+smoother combination "
                        "(main.cpp:74) instead of multiplicative")
    s.add_argument("--tol", type=float, default=1e-6)
    s.add_argument("--maxiter", type=int, default=10000)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--smoother", default="gs2",
                   choices=["jacobi", "l1jacobi", "chebyshev", "gs2",
                            "ilu0"])
    s.add_argument("--multilevel", action="store_true")
    s.add_argument("--check-tentagg", action="store_true",
                   help="PSD re-check of tentative aggregate merges")
    s.add_argument("--smooth-p", type=float, default=None, metavar="OMEGA",
                   help="smoothed-aggregation prolongation with damping "
                        "OMEGA (e.g. 0.667); default: piecewise-constant")
    s.add_argument("--max-coarse", type=int, default=512)
    s.add_argument("--ktg", type=float, default=10.0)
    s.add_argument("--npass", type=int, default=2)
    s.add_argument("--tou", type=float, default=8.0)
    s.add_argument("--f32", action="store_true")
    s.set_defaults(fn=cmd_solve)

    s = sub.add_parser("generate", help="write a test matrix")
    s.add_argument("family", choices=["poisson", "csky2d", "csky3d"])
    s.add_argument("n", type=int)
    s.add_argument("--out")
    s.set_defaults(fn=cmd_generate)

    s = sub.add_parser("gridplot", help="aggregate visualisation")
    s.add_argument("matrix")
    s.add_argument("device", nargs="?", default="tpu")
    s.set_defaults(fn=cmd_gridplot)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..utils.cache import enable_persistent_cache
    enable_persistent_cache()
    if not getattr(args, "f32", True):
        import jax
        jax.config.update("jax_enable_x64", True)
    args.fn(args)


if __name__ == "__main__":
    main()
