"""Measure handshake-matching convergence per level (ROADMAP P0 lever b).

The one-dispatch sky80 chain spends ~72 ms in coarse matching
while-loops; if the accept curve has a long tail (most pairs land in the
first few rounds), capping ``max_matching_rounds`` trades a few
singletons for the tail's gather rounds.  This probe runs the handshake
eagerly per level and prints the cumulative matched fraction per round,
then (optionally) rebuilds the setup at candidate caps and reports warm
setup seconds + BiCGStab iterations so the trade is decided on data.

Usage: python tools/matching_rounds_probe.py [probe|caps] [sky_n]
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

from multigridsolver_tpu.cli.generators import csky3d
from multigridsolver_tpu.setup.aggregation import build_amg_setup
from multigridsolver_tpu.setup.strength import compute_strength
from multigridsolver_tpu.setup import matching
from multigridsolver_tpu.sparse import ops
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)
from multigridsolver_tpu.utils.timing import device_sync


def probe_level(a, first_pass, max_rounds=64):
    """Eager handshake; returns list of cumulative matched fractions."""
    st = compute_strength(a, ktg=10.0, first_pass=first_pass,
                          symmetric=False)
    npad = a.npad
    nodes = np.arange(npad, dtype=np.int32)
    ehash = matching._edge_hash(a)
    avail = ~st.excluded
    n_active = int(jnp.sum(avail & a.row_mask()))
    paired = jnp.full((npad,), -1, jnp.int32)
    fracs = []
    for _ in range(max_rounds):
        prop = matching._best_neighbor(a, st.mu, st.allowed, avail,
                                       ehash=ehash)
        pp = ops.take_neighbor(a, prop, idx=jnp.maximum(prop, 0))
        mutual = (prop >= 0) & (pp == jnp.asarray(nodes))
        newly = int(jnp.sum(mutual & avail))
        paired = jnp.where(mutual & avail, prop, paired)
        avail = avail & ~mutual
        matched = int(jnp.sum(paired >= 0))
        fracs.append(matched / max(n_active, 1))
        if newly == 0:
            break
    return n_active, fracs


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "probe"
    sky_n = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    a = csky3d(sky_n)
    ell = a.to_ell(dtype=jnp.float32, with_transpose=True)
    device_sync(ell.vals)
    cfg = HierarchyConfig(
        max_coarse_size=512,
        aggregation=AggregationConfig(ktg=10.0, npass=2, tou=8.0))
    s = build_amg_setup(ell, cfg)
    device_sync(s.matrices[-1].vals)
    print(f"levels={[m.nrows for m in s.matrices]}", flush=True)

    if mode == "probe":
        for li, m in enumerate(s.matrices[:-1]):
            n_active, fr = probe_level(m, first_pass=(li == 0))
            tail = [f"{f:.3f}" for f in fr]
            print(f"L{li} n={m.nrows} active={n_active} "
                  f"rounds={len(fr)} cumfrac={tail}", flush=True)
        return

    # caps mode: rebuild at candidate caps, measure warm setup + iters
    from multigridsolver_tpu.solve.hierarchy import build_hierarchy
    from multigridsolver_tpu.solve.api import solve_hierarchy
    rs = np.random.RandomState(0)
    b = rs.rand(ell.nrows)
    out = {}
    for cap in (64, 10, 8, 6, 5, 4):
        cfgc = HierarchyConfig(
            max_coarse_size=512,
            aggregation=AggregationConfig(ktg=10.0, npass=2, tou=8.0,
                                          max_matching_rounds=cap))
        sc = build_amg_setup(ell, cfgc)       # compile/prime
        device_sync(sc.matrices[-1].vals)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sc = build_amg_setup(ell, cfgc)
            device_sync(sc.matrices[-1].vals)
            ts.append(time.perf_counter() - t0)
        hier = build_hierarchy(sc.matrices[0], sc.level_labels,
                               sc.matrices[1:], smoother_kind="chebyshev",
                               degree=2, cycle="kcycle", pre_smooth=1,
                               post_smooth=1, kcycle_depth=3,
                               p_ops=sc.p_ops, pt_ops=sc.pt_ops)
        device_sync(hier.coarse.lu)
        r = solve_hierarchy(hier, b, method="bicgstab", tol=1e-6,
                            maxiter=200)
        device_sync(r.x)
        out[cap] = dict(setup_warm_best=round(min(ts), 4),
                        setup_warm_mean=round(float(np.mean(ts)), 4),
                        iters=int(r.iterations),
                        levels=[m.nrows for m in sc.matrices])
        print(f"cap={cap}: {out[cap]}", flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "matching_rounds_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
