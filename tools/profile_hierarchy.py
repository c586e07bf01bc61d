"""Profile build_hierarchy per-component on the real backend.

Usage: python tools/profile_hierarchy.py [n_grid]

Times, per level: hybrid packing, smoother construction (power
iteration), transfer-plan build, and the dense coarse LU — cold then
warm — so hierarchy-build optimisation targets are measured, not
guessed.
"""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jaxcache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

times = defaultdict(float)
counts = defaultdict(int)


def rec(name, t0, block=None):
    if block is not None:
        jax.block_until_ready(block)
    times[name] += time.perf_counter() - t0
    counts[name] += 1


def main():
    import scipy.sparse as sp
    from multigridsolver_tpu.sparse.formats import CSR
    from multigridsolver_tpu.setup.aggregation import build_amg_setup
    from multigridsolver_tpu.utils.config import (AggregationConfig,
                                                  HierarchyConfig)
    from multigridsolver_tpu.sparse import hybrid as hyb
    from multigridsolver_tpu.solve.smoothers import make_smoother
    from multigridsolver_tpu.setup.transfers import build_transfer_plan
    from multigridsolver_tpu.solve.hierarchy import make_coarse_solve

    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1],
                    shape=(n_grid, n_grid), format="csr")
    eye = sp.identity(n_grid, format="csr")
    a = CSR.from_scipy((sp.kron(lap1, eye) + sp.kron(eye, lap1)).tocsr())
    ell = a.to_ell(dtype=jnp.float32)
    cfg = HierarchyConfig(max_coarse_size=512, aggregation=
                          AggregationConfig(ktg=10.0, npass=2, tou=8.0,
                                            symmetric=True))
    t0 = time.perf_counter()
    s = build_amg_setup(ell, cfg)
    jax.block_until_ready(s.matrices[-1].vals)
    print(f"setup: {time.perf_counter()-t0:.1f}s "
          f"levels={[m.nrows for m in s.matrices]}", file=sys.stderr)

    for rep in ("cold", "warm"):
        times.clear()
        counts.clear()
        t_all = time.perf_counter()
        mats = s.matrices
        for l, labels in enumerate(s.level_labels):
            fine, coarse = mats[l], mats[l + 1]
            sh = f"L{l}:{fine.npad}"
            lab = jnp.asarray(labels, jnp.int32)[: fine.npad]
            t0 = time.perf_counter()
            op = hyb.hybrid_from_ell_device(fine)
            rec(f"hybrid {sh}", t0, op.dvals)
            t0 = time.perf_counter()
            sm = make_smoother(op, kind="chebyshev", degree=3)
            rec(f"smoother {sh}", t0, sm.lmax)
            t0 = time.perf_counter()
            tp = build_transfer_plan(lab, coarse.npad)
            rec(f"tplan {sh}", t0, tp.m_cols if tp is not None else None)
        t0 = time.perf_counter()
        cs = make_coarse_solve(mats[-1])
        rec("coarse_lu", t0, cs.lu)
        total = time.perf_counter() - t_all
        print(f"\n== {rep}: total {total:.2f}s ==", file=sys.stderr)
        for k in sorted(times):
            print(f"  {k:<22} {times[k]:8.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
