"""Speculative parallel AOT compilation pool.

The setup phase's cold start is dominated by XLA/Mosaic compiles of a
handful of large per-level-shape programs (match, Galerkin, smoother
power iteration), dispatched one after another by the driver: each
``jit`` call blocks the main thread for the full remote compile
(measured 2.5-4.5 s per program through the TPU tunnel, ~65 s total on
a poisson1000 cold setup).  The compiles have *no data dependencies* —
every program shape in a fused aggregation round is statically derivable
at round entry (the coarse bound ``ncb``, window sizes and slot counts
are all functions of the fine shape) — so they can compile concurrently:
the tunnel's compile service scales near-linearly to at least 4 threads
(measured 4.4x on 4).

``warm`` launches ``fn.lower(*args, **statics).compile()`` on a daemon
thread keyed by the abstract signature.  ``call`` routes a driver-side
invocation through the pool: on a hit it joins the compile thread and
invokes the AOT executable directly — bypassing ``jit``'s per-call
persistent-cache fetch (~75 ms per program through the tunnel), which
would otherwise re-serialize all the loads the warm threads just did —
and on a miss it falls back to the plain jitted call.

Protocol: drivers pass all *dynamic* arguments positionally and all
jit-static arguments as keywords.  Dynamic leaves may be concrete arrays
or ``jax.ShapeDtypeStruct``; pytree dataclass meta fields (ELL.nrows,
wr, …) key the cache through the treedef.

The reference never needed this machinery because nvcc compiles its
kernels offline (``src/GPU_CUDAC++/Makefile``); the persistent XLA cache
(utils/cache.py) plays that role across processes, and this pool plays
it within the first process.
"""
from __future__ import annotations

import threading

import jax
import numpy as np

_lock = threading.Lock()
_entries: dict = {}
stats = {"warm": 0, "hit": 0, "miss": 0, "warm_err": 0}
# Cap concurrent background compiles: the tunnel's compile service
# scales to ~4 parallel requests, but saturating it inflates the
# latency of every *serial* main-thread compile interleaved with the
# warms (measured ~10x on sub-100 ms glue programs)
_slots = threading.BoundedSemaphore(3)


class _Entry:
    __slots__ = ("thread", "compiled", "err")

    def __init__(self):
        self.thread = None
        self.compiled = None
        self.err = None


def _leaf_sig(leaf):
    if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
        return ("arr", tuple(leaf.shape), str(leaf.dtype))
    return leaf


def _key(fn, args, statics):
    leaves, treedef = jax.tree_util.tree_flatten(args)
    return (id(fn), treedef, tuple(_leaf_sig(l) for l in leaves),
            tuple(sorted(statics.items())))


def _abstract(args):
    def go(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype)
        return leaf
    return jax.tree_util.tree_map(go, args)


def abstract_of(tree):
    """Public alias: replace array leaves with ShapeDtypeStructs."""
    return _abstract(tree)


def warm(fn, *args, **statics) -> None:
    """Start compiling ``fn(*args, **statics)`` in the background.

    Idempotent per abstract signature.  ``args`` hold the dynamic
    operands (arrays or ShapeDtypeStructs, pytrees allowed); ``statics``
    the jit-static keywords.  Returns immediately.
    """
    key = _key(fn, args, statics)
    with _lock:
        if key in _entries:
            return
        e = _Entry()
        _entries[key] = e
    abs_args = _abstract(args)

    def run():
        try:
            with _slots:
                e.compiled = fn.lower(*abs_args, **statics).compile()
            stats["warm"] += 1
        except Exception as ex:   # fall back to plain jit at call time
            e.err = ex
            stats["warm_err"] += 1

    e.thread = threading.Thread(target=run, daemon=True)
    e.thread.start()


def ready(fn, *args, **statics) -> bool:
    """Non-blocking: has ``warm`` finished compiling this signature?
    Lets a driver switch to a bigger fused program only once its compile
    has landed, instead of stalling on it."""
    key = _key(fn, args, statics)
    with _lock:
        e = _entries.get(key)
    return (e is not None and e.thread is not None
            and not e.thread.is_alive() and e.err is None
            and e.compiled is not None)


def call(fn, *args, **statics):
    """Invoke ``fn`` through the pool: AOT executable when warmed,
    plain jitted call otherwise."""
    key = _key(fn, args, statics)
    with _lock:
        e = _entries.get(key)
    if e is not None:
        # bounded join: if the background compile wedges (remote compile
        # service hiccup), duplicate the compile on the jit path rather
        # than hang the build
        e.thread.join(timeout=600.0)
        if e.thread.is_alive():
            stats["join_timeout"] = stats.get("join_timeout", 0) + 1
        elif e.err is None:
            try:
                out = e.compiled(*args)
                stats["hit"] += 1
                return out
            except ValueError:
                # the executable was compiled for default shardings;
                # explicitly-sharded arguments go through plain jit
                # (which respects their shardings)
                stats["reject"] = stats.get("reject", 0) + 1
    stats["miss"] += 1
    return fn(*args, **statics)


def barrier() -> None:
    """Wait for every in-flight warm compile (test/bench hook)."""
    with _lock:
        threads = [e.thread for e in _entries.values()
                   if e.thread is not None]
    for t in threads:
        t.join()


def reset() -> None:
    """Drop all pool state (frees executables; tests)."""
    barrier()
    with _lock:
        _entries.clear()
