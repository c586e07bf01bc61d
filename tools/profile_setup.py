"""Profile the setup phase per-program on the real backend.

Usage: python tools/profile_setup.py [poisson|sky] [n]

Times, for each aggregation round and pass: the matching program, the
Galerkin program, and the blocking readback — the three components of the
fused one-readback pass — by monkeypatching timing hooks around them.
Prints a per-phase table so warm-setup optimisation targets are measured,
not guessed.
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

from multigridsolver_tpu.sparse.formats import CSR
from multigridsolver_tpu.setup import aggregation as agg
from multigridsolver_tpu.setup.aggregation import build_amg_setup
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)

times = defaultdict(float)
counts = defaultdict(int)


seq = defaultdict(int)

def record(name, t0, block=None):
    if block is not None:
        jax.block_until_ready(block)
    dt = time.perf_counter() - t0
    times[name] += dt
    counts[name] += 1
    seq[name] += 1
    times[f"{name}#{seq[name] % 100:02d}"] += dt
    counts[f"{name}#{seq[name] % 100:02d}"] += 1
    return dt


# --- wrap the pass-level programs ---
orig_match = agg._match_pass
orig_gal = agg._galerkin_bound
orig_concat = agg._concat_packed
orig_slice = agg._slice_coarse


def match_pass(*a, **kw):
    t0 = time.perf_counter()
    out = orig_match(*a, **kw)
    record("match_program", t0, out[2])
    return out


def galerkin_bound(*a, **kw):
    t0 = time.perf_counter()
    out = orig_gal(*a, **kw)
    record("galerkin_program", t0, out[3])
    return out


def concat_packed(*ps):
    out = orig_concat(*ps)
    t0 = time.perf_counter()
    np.asarray(out)
    record("readback_sync", t0)
    return out


def slice_coarse(*a, **kw):
    t0 = time.perf_counter()
    out = orig_slice(*a, **kw)
    record("slice_program", t0, out[1])
    return out


agg._match_pass = match_pass
agg._galerkin_bound = galerkin_bound
agg._concat_packed = concat_packed
agg._slice_coarse = slice_coarse


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "poisson"
    if which == "poisson":
        n_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
        import scipy.sparse as sp
        lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1],
                        shape=(n_grid, n_grid), format="csr")
        eye = sp.identity(n_grid, format="csr")
        a = CSR.from_scipy((sp.kron(lap1, eye) + sp.kron(eye, lap1)).tocsr())
        cfg = HierarchyConfig(max_coarse_size=512, aggregation=
                              AggregationConfig(ktg=10.0, npass=2, tou=8.0,
                                                symmetric=True))
    else:
        from multigridsolver_tpu.cli.generators import csky3d
        n_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 80
        t0 = time.perf_counter()
        a = csky3d(n_grid)
        print(f"gen: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        cfg = HierarchyConfig(max_coarse_size=512, aggregation=
                              AggregationConfig(ktg=10.0, npass=2, tou=8.0))

    print(f"n={a.nrows} nnz={a.nnz} device={jax.devices()[0]}",
          file=sys.stderr)
    # match bench.py: sky rides the union-pattern transposed-value field
    ell = a.to_ell(dtype=jnp.float32,
                   **({"with_transpose": True} if which != "poisson"
                      else {}))
    jax.block_until_ready(ell.vals)

    t0 = time.perf_counter()
    setup = build_amg_setup(ell, cfg)
    jax.block_until_ready(setup.matrices[-1].vals)
    print(f"cold setup: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    times.clear()
    counts.clear()

    best = 1e9
    for rep in range(3):
        times_snap = dict(times)
        t0 = time.perf_counter()
        setup = build_amg_setup(ell, cfg)
        jax.block_until_ready(setup.matrices[-1].vals)
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
        print(f"warm setup rep{rep}: {dt:.3f}s", file=sys.stderr)
    print(f"\nwarm best: {best:.3f}s   levels="
          f"{[m.nrows for m in setup.matrices]}", file=sys.stderr)
    print("\nper-phase totals over 3 warm reps (divide by 3):",
          file=sys.stderr)
    tot = 0.0
    for k in sorted(times):
        print(f"  {k:<22} {times[k]/3:8.4f}s  (x{counts[k]//3})",
              file=sys.stderr)
        tot += times[k] / 3
    print(f"  {'SUM':<22} {tot:8.4f}s", file=sys.stderr)

    # --- component breakdown at the 2 finest levels: marginal-cost timing
    # (chain reps inside one jit so tunnel sync cost cancels) ---
    from functools import partial as _p
    from multigridsolver_tpu.setup.strength import compute_strength
    from multigridsolver_tpu.setup.matching import (mutual_match,
                                                    labels_from_pairs)
    print("\ncomponent times (marginal, device-true):", file=sys.stderr)
    for lv, mat in enumerate(setup.matrices[:2]):
        agg_cfg = cfg.aggregation
        stat = dict(ktg=float(agg_cfg.ktg), first_pass=(lv == 0),
                    checkdd=float(agg_cfg.checkdd),
                    trspos=float(agg_cfg.trspos),
                    fracnegrcsum=float(agg_cfg.fracnegrcsum),
                    symmetric=bool(agg_cfg.symmetric),
                    mu_mode=str(agg_cfg.mu_mode))

        @_p(jax.jit, static_argnums=(1,))
        def strength_chain(m, reps):
            def body(i, acc):
                st = compute_strength(m, **stat)
                return acc + st.mu[0, 0] + st.si[0] + 1e-12 * i
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        @_p(jax.jit, static_argnums=(1,))
        def match_chain(m, reps):
            st = compute_strength(m, **stat)
            def body(i, acc):
                pr = mutual_match(m, st,
                                  max_rounds=agg_cfg.max_matching_rounds)
                return acc + pr[0] + i
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        @_p(jax.jit, static_argnums=(1,))
        def labels_chain(m, reps):
            st = compute_strength(m, **stat)
            pr = mutual_match(m, st,
                              max_rounds=agg_cfg.max_matching_rounds)
            def body(i, acc):
                lab, nc = labels_from_pairs(pr, st.excluded, a=m)
                return acc + lab[0] + nc + i
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        for name, fn in [("strength", strength_chain),
                         ("match", match_chain),
                         ("labels", labels_chain)]:
            try:
                f1 = lambda: fn(mat, 2)
                f2 = lambda: fn(mat, 12)
                jax.block_until_ready(f1()); jax.block_until_ready(f2())
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter(); np.asarray(f1())
                    a1 = time.perf_counter() - t0
                    t0 = time.perf_counter(); np.asarray(f2())
                    a2 = time.perf_counter() - t0
                    best = min(best, (a2 - a1) / 10)
                print(f"  L{lv} n={mat.nrows:>9} {name:<9} "
                      f"{best*1e3:8.2f} ms", file=sys.stderr)
            except Exception as e:
                print(f"  L{lv} {name}: FAILED {type(e).__name__}: {e}",
                      file=sys.stderr)


if __name__ == "__main__":
    main()
