"""Batched device→host staging for multi-component builds.

Over the TPU tunnel a *blocking* dispatch+readback costs ~50 ms while a
pipelined dispatch costs <1 ms (measured, utils/cache.py context).  Build
phases that interleave host decisions with device work (the DIA/ELL
split, window planning, transfer plans) each need a handful of tiny host
values — but running levels one after another serialises every readback:
~30 syncs ≈ 1.5-3 s of pure round-trip latency per hierarchy build.

:func:`drive` runs many *staged generators* in lockstep.  A staged
generator is plain linear build code that yields a pytree of device
arrays whenever it needs host values and receives the fetched host pytree
back::

    def build_one(a):
        dev_stats = dispatch_stage1(a)
        host_stats = yield dev_stats          # batched with every peer
        ...
        return finished_thing

All generators' pending fetches are satisfied with ONE ``jax.device_get``
per stage, so the total sync count is the *maximum* stage count over the
components (≤ 5) instead of the sum (~30).
"""
from __future__ import annotations

import jax


def drive(gens: list):
    """Run staged generators in lockstep; returns their return values
    (in order).  Generators may finish at different stages."""
    gens = list(gens)
    results = [None] * len(gens)
    pending: dict[int, object] = {}
    for i, g in enumerate(gens):
        try:
            pending[i] = next(g)
        except StopIteration as s:
            results[i] = s.value
    while pending:
        idxs = list(pending)
        fetched = jax.device_get([pending[i] for i in idxs])
        nxt: dict[int, object] = {}
        for i, host_vals in zip(idxs, fetched):
            try:
                nxt[i] = gens[i].send(host_vals)
            except StopIteration as s:
                results[i] = s.value
        pending = nxt
    return results
