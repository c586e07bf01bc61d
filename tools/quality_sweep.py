"""Quality-knob evaluation: iteration counts with each knob on/off
(VERDICT r4 #6).

Knobs: ``check_tentagg`` (the Fortran ground truth runs its PSD re-check
unconditionally on further passes, dagtwolev_mex.f90:988), ``mu_mode=
"notay"`` (δ/η/σ μ formulation, f90:2603-2655), ``smooth_p`` (smoothed
aggregation — no reference counterpart, our quality lever).  For every
problem × knob: BiCGStab(1e-6) iterations, solve seconds (best of 2) and
warm setup seconds — the data the defaults are chosen on.

Usage: python tools/quality_sweep.py [small] [p1000] [sky80]
Writes tools/quality_sweep_results.json.
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
from multigridsolver_tpu.solve.api import solve_hierarchy
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)
from multigridsolver_tpu.utils.timing import device_sync


def poisson(n):
    lap = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n),
                   format="csr")
    eye = sp.identity(n, format="csr")
    return CSR.from_scipy((sp.kron(lap, eye) + sp.kron(eye, lap)).tocsr())


def variants(symmetric):
    base = dict(ktg=10.0, npass=2, tou=8.0, symmetric=symmetric)
    return [
        ("baseline", dict(base), None),
        ("check_tentagg", dict(base, check_tentagg=True), None),
        ("notay_mu", dict(base, mu_mode="notay"), None),
        ("smooth_p", dict(base), 2.0 / 3.0),
    ]


def run(name, a, ell, symmetric, rs):
    print(f"=== {name}: n={a.nrows} ===", flush=True)
    out = {}
    b = rs.rand(a.nrows)
    for label, agg_kw, smooth in variants(symmetric):
        try:
            cfg = HierarchyConfig(max_coarse_size=512, smooth_p=smooth,
                                  aggregation=AggregationConfig(**agg_kw))
            t0 = time.perf_counter()
            setup = build_amg_setup(ell, cfg)
            device_sync(setup.matrices[-1].vals)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            setup = build_amg_setup(ell, cfg)
            device_sync(setup.matrices[-1].vals)
            warm = time.perf_counter() - t0
            hier = build_hierarchy(setup.matrices[0], setup.level_labels,
                                   setup.matrices[1:],
                                   smoother_kind="chebyshev", degree=2,
                                   cycle="kcycle", pre_smooth=1,
                                   post_smooth=1, kcycle_depth=3,
                                   p_ops=setup.p_ops,
                                   pt_ops=setup.pt_ops)
            device_sync(hier.coarse.lu)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                r = solve_hierarchy(hier, b, method="bicgstab", tol=1e-6,
                                    maxiter=200)
                device_sync(r.x)
                best = min(best, time.perf_counter() - t0)
            out[label] = dict(
                iters=int(r.iterations), relres=float(r.relres),
                solve_s=round(best, 4), setup_warm_s=round(warm, 3),
                setup_cold_s=round(cold, 2),
                levels=[m.nrows for m in setup.matrices])
            print(f"  {label}: iters={int(r.iterations)} "
                  f"solve={best:.3f}s setup_warm={warm:.3f}s "
                  f"levels={[m.nrows for m in setup.matrices]}",
                  flush=True)
        except Exception as e:
            out[label] = dict(error=repr(e)[:300])
            print(f"  {label}: ERROR {e!r}", flush=True)
    return out


def main():
    which = set(sys.argv[1:]) or {"small", "p1000", "sky80"}
    rs = np.random.RandomState(0)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "quality_sweep_results.json")
    results = {}
    try:                      # merge over prior partial runs
        with open(path) as f:
            results = json.load(f)
    except (OSError, ValueError):
        pass
    def save():
        with open(path, "w") as f:     # incremental: a timeout mid-sweep
            json.dump(results, f, indent=2)   # keeps completed shapes

    if "small" in which:
        from multigridsolver_tpu.io import read_mtx
        from multigridsolver_tpu.cli.generators import csky3d
        for n in (10, 20, 30):
            mtx = f"/root/reference/matrices/CSky3d{n}.mtx"
            a = (read_mtx(mtx) if os.path.exists(mtx) else csky3d(n))
            if hasattr(a, "to_csr"):
                a = a.to_csr()
            results[f"CSky3d{n}"] = run(
                f"CSky3d{n}", a,
                a.to_ell(dtype=jnp.float32, with_transpose=True),
                False, rs)
            save()
        a = poisson(100)
        results["poisson100"] = run(
            "poisson100", a, a.to_ell(dtype=jnp.float32), True, rs)
        save()
    if "p1000" in which:
        a = poisson(1000)
        results["poisson1000"] = run(
            "poisson1000", a, a.to_ell(dtype=jnp.float32), True, rs)
        save()
    if "sky80" in which:
        from multigridsolver_tpu.cli.generators import csky3d
        a = csky3d(80)
        results["csky3d80"] = run(
            "csky3d80", a, a.to_ell(dtype=jnp.float32,
                                    with_transpose=True), False, rs)
        save()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
