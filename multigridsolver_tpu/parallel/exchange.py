"""Index-list halo exchange for irregular sharded operators.

The banded (DIA) part of a sharded operator moves a contiguous width-W
halo between mesh neighbours (halo.py).  The ELL remainder and coarse
ELL levels reference *scattered* off-shard columns; round 2 served them
with an all-gather of x — O(n) ICI bytes per SpMV regardless of how few
entries were actually needed.

This module builds the moral equivalent of AGMG-MPI's ``lstout/lstin``
exchange lists (vestigial in the reference's Fortran,
``dagtwolev_mex.f90:119-123``), TPU-style: at shard time, for every
ordered shard pair (s → t), the sorted unique x indices owned by s that
t's rows reference.  Lists are padded to one static length L so the
whole exchange is ONE ``all_to_all`` of an (ndev, L) block per shard —
static shapes, no ragged transfers — and the operator's column indices
are rewritten once, on the host, to address the concatenation
``[x_local | recv]``.  Per SpMV each shard moves 2·ndev·L floats over
ICI instead of n.

When a shard pair shares no columns the lists are empty; when every
pair is empty the remainder is block-diagonal and the kernel runs with
no collective at all.  When the lists grow past the all-gather volume
(L·ndev > n_local) the plan is refused and the caller keeps the
all-gather path — the exchange must never be slower than what it
replaces.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class ExchangePlan:
    """Static exchange metadata + host arrays (device_put by the caller).

    ``send_idx[s, t, :]`` — indices (local to shard s) of the x entries
    shard s sends to shard t; entries past the true list length are 0
    (sent but unused).  ``cols`` — the operator's column indices
    rewritten per owning shard to address ``[x_local | recv.ravel()]``
    (length n_local + ndev·L).  ``L = 0`` ⇔ no cross-shard references.
    """

    send_idx: np.ndarray   # (ndev, ndev, L) int32
    cols: np.ndarray       # (K, npad) int32, remapped per shard
    L: int
    ndev: int
    n_local: int


def build_exchange_plan(cols: np.ndarray, rownnz: np.ndarray,
                        ndev: int) -> ExchangePlan | None:
    """Build send lists + remapped columns from host-side ELL arrays.

    Returns None when the exchange would move at least as much as an
    all-gather (L·ndev ≥ n_local) — caller keeps the all-gather path.
    """
    K, npad = cols.shape
    if npad % ndev != 0:
        return None
    nl = npad // ndev
    sl = np.arange(K, dtype=np.int32)[:, None]
    valid = sl < rownnz[None, :]
    c = np.where(valid, cols, 0).astype(np.int64)

    lists: dict[tuple[int, int], np.ndarray] = {}
    lmax = 0
    for t in range(ndev):
        blk = np.s_[:, t * nl:(t + 1) * nl]
        cb = c[blk][valid[blk]]
        owner = cb // nl
        remote = cb[owner != t]
        if remote.size == 0:
            continue
        for s in np.unique(remote // nl):
            u = np.unique(remote[remote // nl == s])
            lists[(int(s), t)] = u
            lmax = max(lmax, len(u))

    L = _round_up(lmax, 8) if lmax else 0
    # refuse when the exchange approaches all-gather volume: each shard
    # sends/receives ndev·L entries vs ~npad for the all-gather — demand
    # a 2x margin so the plan never loses to what it replaces
    if L * ndev >= npad // 2:
        return None

    send_idx = np.zeros((ndev, ndev, max(L, 1)), np.int32)[:, :, :L]
    newcols = np.zeros((K, npad), np.int32)
    for t in range(ndev):
        blk = np.s_[:, t * nl:(t + 1) * nl]
        cb = c[blk]
        owner = cb // nl
        nc = np.where(owner == t, cb - t * nl, 0).astype(np.int32)
        for s in range(ndev):
            if (s, t) not in lists:
                continue
            u = lists[(s, t)]
            send_idx[s, t, :len(u)] = (u - s * nl).astype(np.int32)
            m = owner == s
            nc[m] = (nl + s * L
                     + np.searchsorted(u, cb[m])).astype(np.int32)
        nc[~valid[blk]] = 0
        newcols[blk] = nc
    return ExchangePlan(send_idx=send_idx, cols=newcols, L=L,
                        ndev=ndev, n_local=nl)


def exchange_recv(x_local: jnp.ndarray, send_idx: jnp.ndarray,
                  L: int, ndev: int, axis: str = "rows") -> jnp.ndarray:
    """Inside shard_map: gather this shard's outgoing values and swap
    them with every peer.  Returns the flat (ndev·L,) recv buffer whose
    layout matches the remapped column indices."""
    sv = jnp.take(x_local, send_idx.reshape(-1), axis=0)
    sv = sv.reshape(ndev, L)
    recv = jax.lax.all_to_all(sv, axis, split_axis=0, concat_axis=0)
    return recv.reshape(-1)


@partial(jax.tree_util.register_dataclass,
         data_fields=["cols", "vals", "rownnz", "send_idx"],
         meta_fields=["mesh", "L", "nrows", "ncols", "npad"])
@dataclass
class ExchangeELL:
    """A row-sharded ELL operator whose SpMV moves only the off-shard x
    entries its columns actually reference (one all_to_all of the
    precomputed index lists) instead of all-gathering x.

    ``cols`` holds the plan's REMAPPED indices (into [x_local | recv]);
    ``ops.spmv`` dispatches here via the ``mesh`` attribute.
    """

    cols: jnp.ndarray      # (K, npad) remapped, sharded P(None, "rows")
    vals: jnp.ndarray      # (K, npad) sharded P(None, "rows")
    rownnz: jnp.ndarray    # (npad,) sharded P("rows")
    send_idx: jnp.ndarray  # (ndev, ndev, L) sharded P("rows", None, None)
    mesh: Mesh
    L: int
    nrows: int
    ncols: int
    npad: int

    @property
    def k(self) -> int:
        return self.cols.shape[0]

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        ndev = self.mesh.devices.size
        L = self.L

        def kernel(send_idx, cols, vals, x):
            if L > 0:
                ext = jnp.concatenate(
                    [x, exchange_recv(x, send_idx[0], L, ndev)])
            else:
                ext = x
            g = jnp.take(ext, cols, axis=0)
            return jnp.sum(vals * g, axis=0)   # invalid slots: vals = 0

        mapped = shard_map(
            kernel, mesh=self.mesh,
            in_specs=(P("rows", None, None), P(None, "rows"),
                      P(None, "rows"), P("rows")),
            out_specs=P("rows"))
        return mapped(self.send_idx, self.cols, self.vals, x)


def exchange_ell(ell, mesh: Mesh) -> "ExchangeELL | None":
    """Wrap an already-sharded ELL in the index-list exchange.  One host
    readback of cols/rownnz at shard time; None if the plan is refused
    (caller keeps the all-gather path)."""
    ndev = mesh.devices.size
    plan = build_exchange_plan(np.asarray(ell.cols),
                               np.asarray(ell.rownnz), ndev)
    if plan is None:
        return None
    rows2d = NamedSharding(mesh, P(None, "rows"))
    shards = NamedSharding(mesh, P("rows", None, None))
    return ExchangeELL(
        cols=jax.device_put(jnp.asarray(plan.cols), rows2d),
        vals=ell.vals, rownnz=ell.rownnz,
        send_idx=jax.device_put(jnp.asarray(plan.send_idx), shards),
        mesh=mesh, L=plan.L, nrows=ell.nrows, ncols=ell.ncols,
        npad=int(ell.cols.shape[1]))
