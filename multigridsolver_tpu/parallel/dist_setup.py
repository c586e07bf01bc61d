"""Distributed setup phase: aggregation over a row-sharded mesh.

The reference's setup is strictly single-GPU (``src/GPU_CUDAC++/main.cu``
pass pipeline).  The TPU-native distribution follows the scaling-book
recipe: the input operator's ELL arrays are sharded along rows
(``P(None, "rows")``), every setup program (strength, handshake
matching, pairwise Galerkin) is jitted over the sharded pytrees, and
XLA's SPMD partitioner inserts the collectives — halo exchanges for the
banded neighbour gathers, all-reduces for the matching loop's
convergence test, and a cross-shard scan for the leader numbering.

The handshake matching is naturally communication-light here: each
round's only non-local reads are the neighbour ``available`` flags
within the matrix band, and the mutual-acceptance check touches the same
halo.  The Pallas windowed-gather kernels are single-chip programs
(no partitioning rule), so plans are stripped before sharding and the
XLA gather lowering — which GSPMD partitions — takes over.

Determinism: every decision in the pipeline is integer or bitwise-
reproducible float math evaluated pointwise (μ comparisons, hashed tie
breaks), and the leader numbering is an integer prefix sum, so the
sharded setup yields **bit-identical labels** to the single-chip run —
asserted by ``tests/test_parallel.py`` on the virtual 8-device mesh.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..sparse.formats import ELL
from ..utils.config import HierarchyConfig
from .sharded import shard_ell


def strip_plan(a: ELL) -> ELL:
    return dataclasses.replace(a, base_blk=None, wr=None, nsrc=None,
                               shard=None)


def shard_ell_planned(a: ELL, mesh: Mesh) -> ELL | None:
    """Row-shard ``a`` while KEEPING its windowed-gather plan.

    Repads to a per-shard row count npr that is a multiple of the window
    size w = wr·128, computes the halo width hblk (in w-units) that covers
    every tile's window overhang into its neighbours, and marks the ELL
    with ``shard = (mesh, axis, npr, hblk)`` so every ``take_neighbor``
    rides the shard_map halo-exchange Pallas kernel
    (``ops.gather_pallas.windowed_take_sharded``) instead of a GSPMD
    all-gather.  Returns None when no single-hop halo covers the windows
    (hblk would exceed npr/w) — the caller falls back to the stripped
    GSPMD path.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..ops.gather_pallas import _wb
    if a.base_blk is None or a.wr is None:
        return None
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    # the sharded kernel's global→local rebase needs w and npr to be
    # multiples of the base granularity wb·128 — widen non-conforming
    # window sizes (wr 24→32, 40→48; window start is unchanged, so the
    # wider window still covers every planned column)
    wr = a.wr
    wbl_old = _wb(a.wr) * 128
    while (wr * 128) % (_wb(wr) * 128) != 0:
        wr += 8
    w = wr * 128
    wbl = _wb(wr) * 128
    npad = ((a.npad + ndev * w - 1) // (ndev * w)) * (ndev * w)
    npr = npad // ndev
    base = np.asarray(a.base_blk)
    if wbl != wbl_old:
        # widening changed the base granularity (wr 24→32: wb 16→32);
        # the stored bases are in OLD wbl units — rescale so the window
        # start stays put.  The round-down moves the start ≤ wbl−wbl_old
        # earlier, which the widened window's extra lanes exactly absorb
        # (24→32 adds 2·8·128 = 2048 lanes; round-down loses ≤ 2048).
        base = ((base.astype(np.int64) * wbl_old) // wbl).astype(base.dtype)
    ntiles_old = base.shape[0]
    ntiles = npad // 1024
    if ntiles != ntiles_old:
        # padding tiles (all-empty rows): anchor on their own row range
        extra = (np.arange(ntiles_old, ntiles, dtype=np.int64)
                 * 1024) // wbl
        base = np.concatenate([base, extra.astype(base.dtype)])
    # halo needed per tile: window [base·wbl, base·wbl + 2w) vs the
    # owning shard's row range [r0, r0 + npr)
    tile_lo = base.astype(np.int64) * wbl
    tile_hi = tile_lo + 2 * w
    r0 = (np.arange(ntiles, dtype=np.int64) * 1024 // npr) * npr
    over = np.maximum(np.maximum(r0 - tile_lo, tile_hi - (r0 + npr)), 0)
    hblk = int(-(-int(over.max()) // w))
    if hblk * w > npr:
        return None
    extra_rows = npad - a.npad
    pad2 = ((0, 0), (0, extra_rows))
    rows2d = NamedSharding(mesh, P(None, axis))
    rows1d = NamedSharding(mesh, P(axis))
    return ELL(
        cols=jax.device_put(jnp.pad(a.cols, pad2), rows2d),
        vals=jax.device_put(jnp.pad(a.vals, pad2), rows2d),
        rownnz=jax.device_put(jnp.pad(a.rownnz, (0, extra_rows)), rows1d),
        nrows=a.nrows, ncols=a.ncols,
        base_blk=jax.device_put(jnp.asarray(base, jnp.int32), rows1d),
        wr=wr, nsrc=max(a.nsrc or 0, int(tile_hi.max())),
        vals_t=(jax.device_put(jnp.pad(a.vals_t, pad2), rows2d)
                if a.vals_t is not None else None),
        shard=(mesh, axis, npr, hblk))


def build_amg_setup_sharded(a: ELL, cfg: HierarchyConfig, mesh: Mesh,
                            timer=None):
    """Run the full multilevel aggregation setup with every level's
    arrays row-sharded over ``mesh``.

    Returns the same SetupResult as the single-chip
    ``build_amg_setup`` — coarse operators come out sharded (their
    shardings propagate from the inputs through GSPMD); labels are
    bit-identical to the single-chip result.

    The finest level's neighbour gathers (the dominant setup cost) ride
    the halo-exchange Pallas kernel when the operator's window plan
    shards (``shard_ell_planned``); coarse levels and the Galerkin member
    gathers take the GSPMD-partitioned XLA paths.
    """
    from ..setup.aggregation import build_amg_setup
    a_sh = None
    if a.vals.dtype == jnp.float32:       # the Pallas kernel's dtype
        a_sh = shard_ell_planned(a, mesh)
    if a_sh is None:
        a_sh = shard_ell(strip_plan(a), mesh)
    return build_amg_setup(a_sh, cfg, timer=timer)
