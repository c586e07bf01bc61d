"""Phase timers and structured logging.

TPU-aware analogue of the reference's ``TicToc`` wall-clock timers
(``src/CPU_C++/TicToc.cpp:18-41``) and colored ``printInfo`` logging
(``src/GPU_CUDAC++/MatrixIO.cu:61-101``).  JAX dispatch is asynchronous, so a
naive wall-clock around a jitted call measures dispatch, not compute —
:class:`PhaseTimer` blocks on the provided arrays at phase end.
"""
from __future__ import annotations

import sys
import time
from contextlib import contextmanager

import jax

_COLORS = {"info": "\033[32m", "time": "\033[36m", "warn": "\033[33m",
           "err": "\033[31m"}
_RESET = "\033[0m"
_USE_COLOR = sys.stderr.isatty()


def _tag(kind: str) -> str:
    t = f"[{kind}]"
    return f"{_COLORS.get(kind, '')}{t}{_RESET}" if _USE_COLOR else t


def print_info(label: str, value=None, width: int = 42) -> None:
    msg = f"{_tag('info')} {label:<{width}}"
    if value is not None:
        msg += f" : {value}"
    print(msg, file=sys.stderr)


def print_warn(msg: str) -> None:
    print(f"{_tag('warn')} {msg}", file=sys.stderr)


def device_sync(tree) -> None:
    """Wait for device completion of every array in ``tree``.

    ``jax.block_until_ready`` is a NO-OP on some remote PJRT backends
    (measured on the tunneled TPU: it returns instantly while the device
    queue is still draining, so a wall-clock around it times *dispatch*,
    not compute).  The only reliable completion barrier is a readback:
    this fetches ONE element of each array leaf (batched into a single
    device_get), which cannot complete before everything enqueued ahead
    of it."""
    import numpy as np
    slivers = []
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and hasattr(leaf, "ravel") \
                and getattr(leaf, "size", 0):
            slivers.append(leaf.ravel()[:1])
    if slivers:
        jax.device_get(slivers)
    else:
        jax.block_until_ready(tree)


class PhaseTimer:
    """Named accumulating timers; ``block_on`` forces device completion."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def phase(self, name: str, block_on=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                device_sync(block_on)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def tic(self) -> float:
        return time.perf_counter()

    def toc(self, name: str, t0: float, block_on=None) -> float:
        if block_on is not None:
            device_sync(block_on)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    def report(self) -> None:
        for name, t in self.times.items():
            label = f"{name} (x{self.counts[name]})"
            print(f"{_tag('time')} {label:<42} : {t:.6f} s", file=sys.stderr)
