"""Focused warm-setup micro-bench for the csky3d(80) row (VERDICT r4 #1).

Reference: matvf3dSky80 setup = 0.09 s on the L4
(src/GPU_CUDAC++/results.txt:42).  Round 4 ended at 0.323 s with all
blocking readbacks removed — the remainder was per-program dispatch.
This script measures N consecutive warm setups (after a priming run and
a pool barrier) and prints each, plus the pool hit/miss stats, so the
single-program fused round's effect is measured in isolation from the
full bench.

Usage: python tools/sky_setup_bench.py [n_reps] [sky_n]
"""
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
from multigridsolver_tpu.utils import precompile as pool
from multigridsolver_tpu.utils.config import (AggregationConfig,
                                              HierarchyConfig)
from multigridsolver_tpu.utils.timing import device_sync


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sky_n = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    a = csky3d(sky_n)
    ell = a.to_ell(dtype=jnp.float32, with_transpose=True)
    device_sync(ell.vals)
    cfg = HierarchyConfig(
        max_coarse_size=512,
        aggregation=AggregationConfig(ktg=10.0, npass=2, tou=8.0))
    t0 = time.perf_counter()
    s = build_amg_setup(ell, cfg)
    device_sync(s.matrices[-1].vals)
    print(f"prime: {time.perf_counter()-t0:.3f}s "
          f"levels={[m.nrows for m in s.matrices]}", flush=True)
    pool.barrier()           # let deferred single-round compiles land
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        s = build_amg_setup(ell, cfg)
        device_sync(s.matrices[-1].vals)
        dt = time.perf_counter() - t0
        ts.append(dt)
        print(f"warm{i}: {dt:.4f}s", flush=True)
    print(f"best={min(ts):.4f}s mean={np.mean(ts):.4f}s "
          f"std={np.std(ts):.4f}s pool={pool.stats}", flush=True)
    print(f"vs L4 0.09s -> {0.09/min(ts):.2f}x", flush=True)


if __name__ == "__main__":
    main()
