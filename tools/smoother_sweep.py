"""Measured smoother comparison on the bench problems (VERDICT r4 #4).

The reference smooths with ILUT inside its two-level preconditioner
(droptol 1e-2, ``src/CPU_C++/main.cpp:53-54``) and reports 6 BiCGStab
iterations on poisson1000/2000 (results.txt:93-95, 135-144); the bench's
Chebyshev(2) K-cycle converges in 8-9.  This sweep measures, per problem
and smoother {chebyshev deg 2/3, gs2, ilu0 (Chow–Patel, the ILUT
counterpart)}: BiCGStab iterations, relres and best-of-3 solve seconds —
so the default is chosen on wall-clock DATA, not iteration aesthetics.

Usage: python tools/smoother_sweep.py [p1000] [p2000] [sky80]
Writes tools/smoother_sweep_results.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(
                      os.environ.get("MGS_CACHE_DIR",
                                     "~/.cache/jaxcache_tpu")))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from multigridsolver_tpu.sparse.formats import CSR
from multigridsolver_tpu.setup.aggregation import build_amg_setup
from multigridsolver_tpu.solve.hierarchy import build_hierarchy
from multigridsolver_tpu.solve.api import solve_hierarchy, solve_refined
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)
from multigridsolver_tpu.utils.timing import device_sync


def poisson(n):
    lap = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n),
                   format="csr")
    eye = sp.identity(n, format="csr")
    return CSR.from_scipy((sp.kron(lap, eye) + sp.kron(eye, lap)).tocsr())


SMOOTHERS = [
    ("cheb2", dict(smoother_kind="chebyshev", degree=2)),
    ("cheb3", dict(smoother_kind="chebyshev", degree=3)),
    ("gs2", dict(smoother_kind="gs2")),
    ("ilu0", dict(smoother_kind="ilu0")),
]


def sweep(name, a, ell, cfg, rs, refined=False):
    only = os.environ.get("MGS_SWEEP_SMOOTHERS")   # e.g. "cheb2,ilu0"
    smoothers = [s for s in SMOOTHERS
                 if only is None or s[0] in only.split(",")]
    print(f"=== {name}: n={a.nrows} nnz={a.nnz} ===", flush=True)
    t0 = time.perf_counter()
    setup = build_amg_setup(ell, cfg)
    device_sync(setup.matrices[-1].vals)
    print(f"  setup: {time.perf_counter()-t0:.2f}s "
          f"levels={[m.nrows for m in setup.matrices]}", flush=True)
    b = rs.rand(a.nrows)
    out = {}
    for label, kw in smoothers:
        try:
            t0 = time.perf_counter()
            hier = build_hierarchy(setup.matrices[0], setup.level_labels,
                                   setup.matrices[1:], cycle="kcycle",
                                   pre_smooth=1, post_smooth=1,
                                   kcycle_depth=3, **kw)
            device_sync(hier.coarse.lu)
            build_s = time.perf_counter() - t0
            best = 1e9
            iters = relres = None
            for _ in range(3):
                t0 = time.perf_counter()
                if refined:
                    x, rr, inner, outer = solve_refined(
                        hier, a, b, tol=1e-8, inner_tol=1e-5)
                    dt = time.perf_counter() - t0
                    iters, relres = inner, float(rr)
                else:
                    r = solve_hierarchy(hier, b, method="bicgstab",
                                        tol=1e-6, maxiter=200)
                    device_sync(r.x)
                    dt = time.perf_counter() - t0
                    iters, relres = int(r.iterations), float(r.relres)
                best = min(best, dt)
            out[label] = dict(solve_s=round(best, 4), iters=iters,
                              relres=relres, build_s=round(build_s, 2))
            print(f"  {label}: {best:.3f}s iters={iters} "
                  f"relres={relres:.2e} (build {build_s:.1f}s)",
                  flush=True)
        except Exception as e:
            out[label] = dict(error=repr(e)[:300])
            print(f"  {label}: ERROR {e!r}", flush=True)
    return out


def main():
    which = set(sys.argv[1:]) or {"p1000", "p2000", "sky80"}
    rs = np.random.RandomState(0)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "smoother_sweep_results.json")
    cfg = HierarchyConfig(
        max_coarse_size=512,
        aggregation=AggregationConfig(ktg=10.0, npass=2, tou=8.0,
                                      symmetric=True))
    results = {}
    try:                      # merge over prior partial runs
        with open(path) as f:
            results = json.load(f)
    except (OSError, ValueError):
        pass
    if "p1000" in which:
        a = poisson(1000)
        results["poisson1000"] = {
            **results.get("poisson1000", {}),
            **sweep("poisson1000", a, a.to_ell(dtype=jnp.float32), cfg,
                    rs)}
        results["poisson1000"]["reference"] = dict(
            solve_s=2.956, iters=6, note="results.txt:93-95, L4-P + ILUT")
    if "p2000" in which:
        a = poisson(2000)
        results["poisson2000"] = {
            **results.get("poisson2000", {}),
            **sweep("poisson2000", a, a.to_ell(dtype=jnp.float32), cfg,
                    rs)}
        results["poisson2000"]["reference"] = dict(
            solve_s=15.81, iters=6, note="results.txt:135-144")
    if "sky80" in which:
        from multigridsolver_tpu.cli.generators import csky3d
        a = csky3d(80)
        cfg_ns = HierarchyConfig(
            max_coarse_size=512,
            aggregation=AggregationConfig(ktg=10.0, npass=2, tou=8.0))
        results["csky3d80"] = {
            **results.get("csky3d80", {}),
            **sweep("csky3d80", a,
                    a.to_ell(dtype=jnp.float32, with_transpose=True),
                    cfg_ns, rs, refined=True)}
        results["csky3d80"]["reference"] = dict(
            solve_s=7.705, iters=6, note="results.txt:119-121 (1e-6; "
            "ours refined to 1e-8)")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
