"""Multi-chip distribution: row-partitioned levels over a device mesh.

The reference is single-process, single-GPU (SURVEY §2.5); its only
multi-rank scaffolding is vestigial Fortran MPI fields
(``dagtwolev_mex.f90:119-123``).  The TPU-native scaling axis is matrix-row
partitioning over a 1-D ``jax.sharding.Mesh``:

* every level's ELL arrays are sharded along rows (``P("rows", None)``),
* level vectors are sharded along the same axis,
* SpMV gathers x at arbitrary column indices — under ``jit`` XLA inserts
  the required all-gather of x over ICI automatically; reductions in the
  Krylov loop become ``psum`` collectives.  (A halo-optimised shard_map
  SpMV for banded matrices lives in ``halo.py``.)
* coarse levels shrink geometrically; beyond the finest level(s) the
  operators are small enough that replication is cheaper than sharding, so
  the hierarchy keeps them replicated (including the dense coarsest LU).

This mirrors the scaling-book recipe: pick a mesh, annotate shardings, let
XLA insert collectives.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse.formats import ELL
from ..solve.hierarchy import Hierarchy, Level


def make_row_mesh(n_devices: int | None = None,
                  devices=None) -> Mesh:
    """1-D mesh over the row-partition axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("rows",))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def repad_ell(a: ELL, row_multiple: int) -> ELL:
    """Grow row padding so npad divides evenly across the mesh."""
    npad = _round_up(a.npad, row_multiple)
    if npad == a.npad:
        return a
    extra = npad - a.npad
    return ELL(
        cols=jnp.pad(a.cols, ((0, 0), (0, extra))),
        vals=jnp.pad(a.vals, ((0, 0), (0, extra))),
        rownnz=jnp.pad(a.rownnz, (0, extra)),
        nrows=a.nrows, ncols=a.ncols)


def shard_ell(a: ELL, mesh: Mesh) -> ELL:
    ndev = mesh.devices.size
    a = repad_ell(a, ndev * 8)
    # slot-major layout: the row axis is axis 1 of cols/vals
    rows2d = NamedSharding(mesh, P(None, "rows"))
    rows1d = NamedSharding(mesh, P("rows"))
    return ELL(cols=jax.device_put(a.cols, rows2d),
               vals=jax.device_put(a.vals, rows2d),
               rownnz=jax.device_put(a.rownnz, rows1d),
               nrows=a.nrows, ncols=a.ncols)


def shard_operator(a, mesh: Mesh):
    """Row-shard a level operator (ELL or DIA+ELL hybrid)."""
    from ..sparse.hybrid import HYB, merge_overflow_host
    if isinstance(a, HYB):
        a = merge_overflow_host(a)   # split overflow doesn't shard
        ndev = mesh.devices.size
        npad = _round_up(a.npad, ndev * 8)
        dvals = jnp.pad(a.dvals, ((0, 0), (0, npad - a.npad)))
        rows2d = NamedSharding(mesh, P(None, "rows"))
        ell = shard_ell(repad_ell(a.ell, ndev * 8), mesh) \
            if a.ell is not None else None
        # the windowed-gather plan is single-chip (pallas_call is not
        # shard-aware here); sharded remainders take the XLA gather path
        return HYB(dvals=jax.device_put(dvals, rows2d), ell=ell,
                   base_blk=None, ov=None, offsets=a.offsets,
                   nrows=a.nrows, ncols=a.ncols, wr=None, nsrc_pad=None)
    return shard_ell(a, mesh)


def replicate(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def shard_vector(v: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(v, NamedSharding(mesh, P("rows")))


def shard_hierarchy(hier: Hierarchy, mesh: Mesh,
                    shard_levels: int = 1) -> Hierarchy:
    """Distribute a built hierarchy over the mesh.

    The finest ``shard_levels`` levels are row-sharded (their labels
    sharded alongside); deeper levels and the coarse LU are replicated.
    Labels are padded with -1 (excluded), so repadding never changes the
    operator.
    """
    from .halo import make_halo_op, halo_width
    from .exchange import exchange_ell
    ndev = mesh.devices.size
    new_levels = []
    for idx, lvl in enumerate(hier.levels):
        if idx < shard_levels:
            a = shard_operator(lvl.a, mesh)
            # banded operators ride the ppermute halo exchange instead of
            # the XLA all-gather (2W floats over ICI per SpMV, not n);
            # irregular ELL parts ride the index-list all_to_all
            if (hasattr(a, "offsets") and a.offsets
                    and halo_width(a) <= a.npad // ndev):
                a = make_halo_op(a, mesh)
            elif isinstance(a, ELL):
                a = exchange_ell(a, mesh) or a
            labels = lvl.labels
            if labels.shape[0] < a.npad:
                labels = jnp.concatenate([
                    labels,
                    jnp.full((a.npad - labels.shape[0],), -1, jnp.int32)])
            labels = jax.device_put(labels, NamedSharding(mesh, P("rows")))
            sm = replicate(lvl.smoother, mesh)
            sm = dataclasses.replace(
                sm, d=_pad_replicated(sm.d, a.npad, mesh, fill=1.0))
            new_levels.append(Level(a=a, labels=labels, smoother=sm,
                                    tplan=None, nc_pad=lvl.nc_pad))
        else:
            # single-chip pallas plans don't partition; deeper (replicated)
            # levels take the XLA transfer/gather paths
            lvl = dataclasses.replace(lvl, tplan=None)
            if hasattr(lvl.a, "offsets"):
                lvl = dataclasses.replace(
                    lvl, a=dataclasses.replace(lvl.a, base_blk=None,
                                               wr=None, nsrc_pad=None))
            new_levels.append(replicate(lvl, mesh))
    coarse = replicate(hier.coarse, mesh)
    return dataclasses.replace(hier, levels=tuple(new_levels), coarse=coarse)


def _pad_replicated(v: jnp.ndarray, n: int, mesh: Mesh, fill=0.0):
    if v.shape[0] < n:
        v = jnp.concatenate([
            v, jnp.full((n - v.shape[0],), fill, v.dtype)])
    return jax.device_put(v, NamedSharding(mesh, P("rows")))
