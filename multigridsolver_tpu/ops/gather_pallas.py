"""Pallas TPU kernel: windowed gather SpMV — the framework's gather engine.

TPU has no hardware vector-gather from HBM: XLA lowers ``jnp.take`` to a
scalar loop measured at ~7 ns/element on v5e, which made every ELL
remainder SpMV, prolongation and restriction gather the dominant cost of
the solve phase (the reference leans on cuSPARSE's gather-based SpMV,
``src/GPU_CUDAC++/MatrixOperations.cu``; a TPU design needs a different
weapon).

The weapon: Mosaic *can* gather along the 128-lane axis **within one
(8, 128) vreg** (``jnp.take_along_axis(src, lane, axis=1)`` lowers to the
VPU ``dynamic_gather`` op).  A general gather is composed from it:

* rows are processed in tiles of T = 1024 (one (8, 128) f32 vreg);
* the source vector is viewed as (m/128, 128) rows; each tile's sources
  are covered by a window of ``2·wr`` consecutive rows whose base row
  block is **scalar-prefetched** per tile (AGMG orderings — CMK fine
  levels, leader-numbered coarse levels — make column indices follow the
  row index closely, so windows are small; the planner measures the
  per-tile spread and picks ``wr``);
* within the tile, the gather runs per 128-wide window row ``s``:
  ``take_along_axis(bcast(win[s]), idx % 128)`` selected where
  ``idx // 128 == s`` — ``2·wr`` vreg-gathers + selects per output vreg.

Measured (v5e, marginal-cost timing over chained calls): 0.07 ns/element
vs 7 ns/element for the XLA gather — ~100×; exact (0 ULP) match.

The same kernel serves ELL-remainder SpMV (K = slots), prolongation
(K = 1, cols = labels) and restriction (members-ELL on coarse rows), so
every gather on the solve path rides it.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1024            # output rows per tile (one f32 vreg)
# candidate window halves (rows of 128); the minimum is 8 because the x
# block shape (wr, 128) must have its row count divisible by 8.  The large
# sizes exist for restriction members-gathers (window ~ coarsening ratio ×
# 1024); callers bound K · 2wr so the unrolled select chain stays sane
_WRS = (8, 16, 32, 64, 128)

# run the kernel through the Pallas interpreter (tests on the CPU backend)
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(K: int, wr: int, base_ref, cols_ref, vals_ref, xlo_ref, xhi_ref,
            o_ref):
    t = pl.program_id(0)
    base = base_ref[t] * (wr * 128)
    xw = jnp.concatenate([xlo_ref[...], xhi_ref[...]], axis=0)  # (2wr, 128)
    nwin = 2 * wr * 128
    acc = jnp.zeros((8, 128), jnp.float32)
    for k in range(K):
        idx = cols_ref[k] - base                     # (8, 128) local
        idx = jnp.clip(idx, 0, nwin - 1)             # invalid slots: val=0
        lane = jax.lax.rem(idx, jnp.full_like(idx, 128))
        sub = jax.lax.div(idx, jnp.full_like(idx, 128))
        g = jnp.zeros((8, 128), jnp.float32)
        for s in range(2 * wr):
            row = jnp.broadcast_to(xw[s][None, :], (8, 128))
            gs = jnp.take_along_axis(row, lane, axis=1)
            g = jnp.where(sub == s, gs, g)
        acc = acc + vals_ref[k] * g
    o_ref[...] = acc


@partial(jax.jit, static_argnames=("wr", "nsrc_pad"))
def windowed_gather_spmv(cols: jnp.ndarray, vals: jnp.ndarray,
                         x: jnp.ndarray, base_blk: jnp.ndarray,
                         wr: int, nsrc_pad: int) -> jnp.ndarray:
    """y[i] = Σ_k vals[k, i] · x[cols[k, i]] with per-tile windowed gather.

    ``cols``/``vals``: (K, npad) slot-major, npad % 1024 == 0; invalid
    slots must hold col = 0, val = 0.  ``base_blk``: (npad // 1024,) int32
    window base (in units of wr·128 source elements) per tile — every
    valid col in tile t must lie in
    ``[base_blk[t]·wr·128, (base_blk[t]+2)·wr·128)``.
    ``nsrc_pad``: static padded source length ≥ (max base_blk + 2)·wr·128
    and a multiple of 128; x is zero-padded to it.
    """
    K, npad = cols.shape
    assert npad % T == 0, npad
    ntiles = npad // T
    if x.shape[0] < nsrc_pad:
        x = jnp.pad(x, (0, nsrc_pad - x.shape[0]))
    xp2d = x.reshape(nsrc_pad // 128, 128)
    cols3 = cols.reshape(K, ntiles * 8, 128)
    vals3 = vals.astype(jnp.float32).reshape(K, ntiles * 8, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((K, 8, 128), lambda t, b: (0, t, 0)),
            pl.BlockSpec((K, 8, 128), lambda t, b: (0, t, 0)),
            pl.BlockSpec((wr, 128), lambda t, b: (b[t], 0)),
            pl.BlockSpec((wr, 128), lambda t, b: (b[t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda t, b: (t, 0)),
    )
    out = pl.pallas_call(
        partial(_kernel, K, wr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32),
        interpret=INTERPRET,
    )(base_blk, cols3, vals3, xp2d, xp2d)
    return out.reshape(npad)


def plan_windows(cols: np.ndarray, rownnz: np.ndarray,
                 ncols: int) -> tuple[np.ndarray, int, int] | None:
    """Pick per-tile window bases and the window half-size ``wr``.

    ``cols``: (K, npad) host array (npad % 1024 == 0); ``rownnz``: (npad,).
    Returns (base_blk int32 (ntiles,), wr, nsrc_pad), or None when some
    tile's column spread exceeds the largest supported window (the caller
    falls back to the XLA gather).
    """
    K, npad = cols.shape
    ntiles = npad // T
    valid = (np.arange(K)[:, None] < rownnz[None, :])
    big = np.where(valid, cols, np.iinfo(np.int32).max).reshape(K, ntiles, T)
    small = np.where(valid, cols, -1).reshape(K, ntiles, T)
    cmin = big.min(axis=(0, 2))      # (ntiles,) INT_MAX where empty
    cmax = small.max(axis=(0, 2))    # -1 where empty
    empty = cmax < 0
    cmin = np.where(empty, 0, cmin)
    cmax = np.where(empty, 0, cmax)
    for wr in _WRS:
        w = wr * 128
        base = cmin // w
        if np.all(cmax < (base + 2) * w):
            nsrc_pad = _round_up(
                max(int((base.max() + 2) * w), ncols, 128), 128)
            return base.astype(np.int32), wr, int(nsrc_pad)
    return None


@partial(jax.jit, static_argnames=("ntiles",))
def plan_windows_device(cols: jnp.ndarray, rownnz: jnp.ndarray,
                        ntiles: int):
    """Device-side (jittable) per-tile min/max column — used when the ELL
    lives on device and a host round-trip of the full cols array would
    cost more than the solve.  Returns (cmin, cmax) of shape (ntiles,);
    the (tiny) wr search runs on host on these 2·ntiles scalars."""
    K, npad = cols.shape
    valid = (jax.lax.broadcasted_iota(jnp.int32, cols.shape, 0)
             < rownnz[None, :])
    big = jnp.where(valid, cols, jnp.iinfo(jnp.int32).max)
    small = jnp.where(valid, cols, -1)
    cmin = big.reshape(K, ntiles, T).min(axis=(0, 2))
    cmax = small.reshape(K, ntiles, T).max(axis=(0, 2))
    empty = cmax < 0
    return jnp.where(empty, 0, cmin), jnp.where(empty, 0, cmax)


def plan_from_minmax(cmin: np.ndarray, cmax: np.ndarray,
                     ncols: int) -> tuple[np.ndarray, int, int] | None:
    """Host-side tail of the planner given per-tile (cmin, cmax)."""
    for wr in _WRS:
        w = wr * 128
        base = cmin // w
        if np.all(cmax < (base + 2) * w):
            nsrc_pad = _round_up(
                max(int((base.max() + 2) * w), ncols, 128), 128)
            return base.astype(np.int32), wr, int(nsrc_pad)
    return None
