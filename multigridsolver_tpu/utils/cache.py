"""Persistent XLA compile cache wiring.

The reference pays its compile cost once, offline (nvcc builds a binary,
``src/GPU_CUDAC++/Makefile``); the TPU-native equivalent is the XLA
persistent compilation cache, which serves fully-compiled executables
(including Mosaic kernel binaries) across processes.  Measured on v5e:
poisson1000 setup first-ever compile ≈ 80 s; with a warm cache the same
fresh process takes ≈ 30 s, all of it Python tracing (which JAX cannot
persist).  Every entry point (CLI, bench, graft entry) calls
:func:`enable_persistent_cache` so users only ever pay first-compile
once per shape per machine.
"""
from __future__ import annotations

import os

_DEFAULT = "~/.cache/jaxcache_tpu"
_enabled = False


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently point JAX at the on-disk compile cache.

    ``MGS_CACHE_DIR`` overrides the default location.  Caches every
    program regardless of compile time (the setup phase launches dozens
    of sub-second programs whose re-compiles otherwise add up).
    """
    global _enabled
    import jax

    path = os.path.expanduser(
        path or os.environ.get("MGS_CACHE_DIR") or _DEFAULT)
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled = True
    return path
