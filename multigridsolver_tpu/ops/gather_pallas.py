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

Measured (v5e, marginal-cost timing over chained calls): 0.09 ns/element
at wr = 16 (scaling ~linearly in wr) vs 7 ns/element for the XLA gather —
up to ~100×; exact (0 ULP) match.  When outlier columns defeat the exact
planner, ``anchored_base`` + ``split_overflow_device`` provide *split
plans*: diagonal-anchored windows plus a compact COO overflow handled by
the XLA path (~14 ns per straggler).

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
# sizes serve restriction members-gathers (window ~ coarsening ratio x
# 1024); the k-blocked grid bounds each kernel BODY at ~512 unrolled ops
# regardless, so big wr costs runtime (2wr selects/vreg), not compile time
# window half-size ladder (in 128-lane units).  Per-element gather cost
# is ∝ wr (the kernel's unrolled select chain walks the whole window),
# so a dense ladder: a spread that just misses a bucket pays one step
# of extra chain, not 2x (measured on poisson3500 L1: spread 9399 fell
# off the pow2 64-bucket and ran at wr=128 — 2.7x the needed work).
# All entries are multiples of 8 so 2·wr is a multiple of the window
# base granularity _wb(wr) below.
_WRS = (8, 16, 24, 32, 40, 48, 64, 80, 96, 112, 128, 160, 192)


# base granularity per ladder entry (128-lane rows).  Power-of-two
# entries keep wb = wr — the original two-block layout, zero extra DMA
# descriptors.  The in-between rungs use fine 16-row granularity: they
# only ever win by cutting the select chain vs the next pow2 (e.g.
# poisson3500 L1, spread 9399: wr 48@wb16 = 96 chain steps vs 128@128 =
# 256), which dwarfs the ~17 % many-block DMA overhead (measured at
# wr = 64: 8 blocks 0.034 ms vs 2 blocks 0.029 ms on a 4M-row take).
_WB = {8: 8, 16: 16, 24: 16, 32: 32, 40: 16, 48: 16, 64: 64, 80: 16,
       96: 16, 112: 16, 128: 128, 160: 32, 192: 64}


def _wb(wr: int) -> int:
    """Window-base granularity in 128-lane rows.  Bases used to be in
    whole half-window (wr·128) units, wasting up to a full w = wr·128 of
    chain on alignment — a spread of w+2 forced the next wr bucket.  The
    kernels fetch the same 2·wr·128 window as nblk = 2wr/wb blocks of
    wb rows each, with the base aligned to wb·128 lanes."""
    return _WB.get(wr, min(wr, 16))


def _nblk(wr: int) -> int:
    wb = _wb(wr)
    assert (2 * wr) % wb == 0, wr
    return 2 * wr // wb

# run the kernel through the Pallas interpreter (tests on the CPU backend)
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# the exact gather form jnp.take_along_axis(row, lane, axis=1) emits on
# (8, 128) operands — Mosaic pattern-matches it to the VPU dynamic_gather
_LANE_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _window_gather(xw, idx, wr):
    """The core composed gather: (8,128) values of the (2wr,128) VMEM
    window at local indices ``idx`` (clipped; callers mask junk).

    Every op here is a RAW lax primitive bind: the unrolled 2wr-step
    select chain is traced once per kernel instance, and jnp-level sugar
    (where/take_along_axis) costs ~2 ms per call in trace dispatch inside
    Pallas bodies — measured 98 s of the 124 s poisson1000 cold setup
    before this was flattened to primitives (~25 µs/bind)."""
    nwin = 2 * wr * 128
    idx = jax.lax.clamp(jnp.int32(0), idx, jnp.int32(nwin - 1))
    c128 = jax.lax.full(idx.shape, 128, idx.dtype)
    lane = jax.lax.rem(idx, c128)
    sub = jax.lax.div(idx, c128)
    lane3 = jax.lax.reshape(lane, (8, 128, 1))
    g = jax.lax.full((8, 128), 0, xw.dtype)
    for s in range(2 * wr):
        row = jax.lax.broadcast_in_dim(
            jax.lax.index_in_dim(xw, s, axis=0, keepdims=False),
            (8, 128), (1,))
        gs = jax.lax.gather(
            row, lane3, _LANE_DNUMS, slice_sizes=(1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = jax.lax.select(
            jax.lax.eq(sub, jax.lax.full(sub.shape, s, sub.dtype)),
            gs, g)
    return g


# unrolled gather+select budget per kernel body: trades Mosaic compile
# time (~3 ms per unrolled select chain element) against the ~0.25 µs
# fixed cost of every grid step (measured: K innermost with kb=1 tripled
# the runtime of a K=5 SpMV purely on step overhead)
_BODY_BUDGET = 512


def _k_block(K: int, wr: int) -> int:
    """Largest power-of-two slot block within the unroll budget.  MUST
    divide the (power-of-two-bucketed) padded slot count: the grid's
    slot dimension is K//kb, so a non-divisor silently drops the
    trailing slots (bit us when the dense wr ladder introduced kb = 5/6
    for wr = 40/48)."""
    kb = max(1, min(K, _BODY_BUDGET // (2 * wr)))
    p = 1
    while p * 2 <= kb:
        p *= 2
    return p


def _k_block_balanced(K: int, wr: int) -> int:
    """Smallest block size whose groups cover K with minimal padding:
    K = 9 at kb_max = 8 gives kb = 5 (pad 10), not kb = 8 (pad 16) —
    padded slots cost full gather work in the SpMV hot path."""
    kb_max = max(1, _BODY_BUDGET // (2 * wr))
    ngroups = -(-K // kb_max)
    return -(-K // ngroups)


def _k_bucket(K: int) -> int:
    """Round the slot count up to a power of two: levels with K = 5, 9,
    13… then share Mosaic kernel binaries (compile cost is the setup
    phase's cold-start dominator), at the price of ≤ 2x zero-padded slot
    work."""
    b = 1
    while b < K:
        b *= 2
    return b


def _spmv_kernel(wr: int, kb: int, base_ref, cols_ref, vals_ref,
                 *x_refs):
    *x_refs, o_ref = x_refs
    t, kg = pl.program_id(0), pl.program_id(1)
    base = base_ref[t] * (_wb(wr) * 128)
    xw = jnp.concatenate([r[...] for r in x_refs], axis=0)  # (2wr, 128)
    acc = jnp.zeros((8, 128), jnp.float32)
    for j in range(kb):
        g = _window_gather(xw, cols_ref[j] - base, wr)
        acc = acc + vals_ref[j] * g

    @pl.when(kg == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += acc


def _x_block_specs(wr: int):
    """The 2·wr·128 source window as nblk wb-row blocks starting at the
    wb-aligned base (scalar-prefetched)."""
    wb = _wb(wr)
    return [pl.BlockSpec((wb, 128),
                         partial(lambda j, t, k, b: (b[t] + j, 0), j))
            for j in range(_nblk(wr))]


def _take_kernel(wr: int, kb: int, base_ref, cols_ref, *x_refs):
    *x_refs, o_ref = x_refs
    t = pl.program_id(0)
    base = base_ref[t] * (_wb(wr) * 128)
    xw = jnp.concatenate([r[...] for r in x_refs], axis=0)
    for j in range(kb):
        o_ref[j] = _window_gather(xw, cols_ref[j] - base, wr)


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

    The grid runs K innermost with the output tile revisited, so the slot
    count is never unrolled — Mosaic compile cost scales with the window
    (2wr selects), not with K · 2wr.
    """
    K, npad = cols.shape
    assert npad % T == 0, npad
    ntiles = npad // T
    if x.shape[0] < nsrc_pad:
        x = jnp.pad(x, (0, nsrc_pad - x.shape[0]))
    elif x.shape[0] > nsrc_pad:
        # padded sources can exceed the plan's window coverage (nsrc is
        # computed from the logical ncols); the plan guarantees no window
        # reaches past nsrc_pad, so the tail is never gathered
        x = x[:nsrc_pad]
    xp2d = x.astype(jnp.float32).reshape(nsrc_pad // 128, 128)
    kb = _k_block_balanced(K, wr)
    kp = _round_up(K, kb)
    cols3 = cols.reshape(K, ntiles * 8, 128)
    vals3 = vals.astype(jnp.float32).reshape(K, ntiles * 8, 128)
    if kp != K:
        cols3 = jnp.pad(cols3, ((0, kp - K), (0, 0), (0, 0)))
        vals3 = jnp.pad(vals3, ((0, kp - K), (0, 0), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, kp // kb),
        in_specs=[
            pl.BlockSpec((kb, 8, 128), lambda t, k, b: (k, t, 0)),
            pl.BlockSpec((kb, 8, 128), lambda t, k, b: (k, t, 0)),
            *_x_block_specs(wr),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda t, k, b: (t, 0)),
    )
    out = pl.pallas_call(
        partial(_spmv_kernel, wr, kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32),
        interpret=INTERPRET,
    )(base_blk, cols3, vals3, *([xp2d] * _nblk(wr)))
    return out.reshape(npad)


@partial(jax.jit, static_argnames=("wr", "nsrc_pad"))
def windowed_take(cols: jnp.ndarray, x: jnp.ndarray,
                  base_blk: jnp.ndarray, wr: int,
                  nsrc_pad: int) -> jnp.ndarray:
    """out[k, i] = x[cols[k, i]] — the per-slot gather without reduction
    (setup-phase workhorse: neighbour fields in strength/matching and the
    Galerkin member merges are gathers of this shape).

    ``x``: (nsrc,) float32 or int32 (int32 rides the same lane-gather —
    Mosaic's dynamic_gather moves bits, not arithmetic).  Out-of-window
    indices (e.g. the -1 sentinels) return junk — callers mask, exactly
    as they already masked the XLA-gather results.
    """
    K, npad = cols.shape
    assert npad % T == 0, npad
    ntiles = npad // T
    if x.shape[0] < nsrc_pad:
        x = jnp.pad(x, (0, nsrc_pad - x.shape[0]))
    elif x.shape[0] > nsrc_pad:
        x = x[:nsrc_pad]
    xp2d = x.reshape(nsrc_pad // 128, 128)
    kp = _k_bucket(K)
    kb = _k_block(kp, wr)
    cols3 = cols.reshape(K, ntiles * 8, 128)
    if kp != K:
        cols3 = jnp.pad(cols3, ((0, kp - K), (0, 0), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, kp // kb),
        in_specs=[
            pl.BlockSpec((kb, 8, 128), lambda t, k, b: (k, t, 0)),
            *_x_block_specs(wr),
        ],
        out_specs=pl.BlockSpec((kb, 8, 128), lambda t, k, b: (k, t, 0)),
    )
    out = pl.pallas_call(
        partial(_take_kernel, wr, kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, ntiles * 8, 128), x.dtype),
        interpret=INTERPRET,
    )(base_blk, cols3, *([xp2d] * _nblk(wr)))
    return out.reshape(kp, npad)[:K]


def _take_rows_kernel(wr: int, kb: int, base_ref, idx_ref, *x_refs):
    *x_refs, o_ref = x_refs
    t = pl.program_id(0)
    base = base_ref[t] * (_wb(wr) * 128)
    idx = idx_ref[0] - base
    for j in range(kb):
        xw = jnp.concatenate([r[j] for r in x_refs], axis=0)
        o_ref[j] = _window_gather(xw, idx, wr)


@partial(jax.jit, static_argnames=("wr", "nsrc_pad"))
def windowed_take_rows(idx: jnp.ndarray, xs: jnp.ndarray,
                       base_blk: jnp.ndarray, wr: int,
                       nsrc_pad: int) -> jnp.ndarray:
    """out[s, i] = xs[s, idx[i]] — one index vector gathering from S
    parallel source rows (the Galerkin member merge: fetch each aggregate
    member's whole relabelled slot row at once).

    ``idx``: (npad,) int32, npad % 1024 == 0; ``xs``: (S, nsrc) f32/int32;
    window plan over the *idx* values.  Out-of-window indices return junk
    (callers mask).
    """
    npad = idx.shape[0]
    S, nsrc = xs.shape
    assert npad % T == 0, npad
    ntiles = npad // T
    if nsrc < nsrc_pad:
        xs = jnp.pad(xs, ((0, 0), (0, nsrc_pad - nsrc)))
    elif nsrc > nsrc_pad:
        xs = xs[:, :nsrc_pad]
    xs3 = xs.reshape(S, nsrc_pad // 128, 128)
    idx3 = idx.reshape(1, ntiles * 8, 128)
    sp = _k_bucket(S)
    kb = _k_block(sp, wr)
    if sp != S:
        xs3 = jnp.pad(xs3, ((0, sp - S), (0, 0), (0, 0)))

    wb = _wb(wr)
    x_specs = [pl.BlockSpec((kb, wb, 128),
                            partial(lambda j, t, k, b: (k, b[t] + j, 0), j))
               for j in range(_nblk(wr))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, sp // kb),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, k, b: (0, t, 0)),
            *x_specs,
        ],
        out_specs=pl.BlockSpec((kb, 8, 128), lambda t, k, b: (k, t, 0)),
    )
    out = pl.pallas_call(
        partial(_take_rows_kernel, wr, kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sp, ntiles * 8, 128), xs.dtype),
        interpret=INTERPRET,
    )(base_blk, idx3, *([xs3] * _nblk(wr)))
    return out.reshape(sp, npad)[:S]


def windowed_take_sharded(cols: jnp.ndarray, x: jnp.ndarray,
                          base_blk: jnp.ndarray, wr: int, npr: int,
                          hblk: int, mesh, axis: str) -> jnp.ndarray:
    """Row-sharded ``windowed_take``: halo exchange + per-shard kernel.

    Multi-chip analogue of the reference's single-GPU neighbour gathers
    and the moral equivalent of AGMG's lstout/lstin halo lists
    (dagtwolev_mex.f90:119-123): each shard ppermutes fixed-width boundary
    slabs from its mesh neighbours (2·hblk·wr·128 elements over ICI — not
    an all-gather of x), then runs the single-chip Pallas windowed gather
    on its local rows against the halo-extended source.

    ``cols`` (K, npad) sharded P(None, axis); ``x`` (≥npad,) P(axis);
    ``base_blk`` (ntiles,) P(axis) holding GLOBAL window bases.  ``npr``:
    rows per shard (multiple of w = wr·128); ``hblk``: halo width in
    w-units, ≤ npr/w (single-hop).  Every tile's global window must lie in
    [shard_start − hblk·w, shard_end + hblk·w) — validated by
    ``parallel.dist_setup.shard_ell_planned`` when it sets ``ELL.shard``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    w = wr * 128
    wbl = _wb(wr) * 128
    # the global→local base rebase divides the shard shift by the base
    # granularity; both npr and the halo width must be multiples of it
    # (shard_ell_planned only emits conforming wr/hblk)
    assert w % wbl == 0 and npr % wbl == 0, (wr, npr)
    h = hblk * w
    nsrc_loc = npr + 2 * h
    ndev = int(np.prod([mesh.shape[a] for a in (axis,)]))
    if x.shape[0] != npr * ndev:          # halo slab slicing needs exact n
        x = (jnp.pad(x, (0, npr * ndev - x.shape[0]))
             if x.shape[0] < npr * ndev else x[: npr * ndev])

    def local(cols_l, x_l, base_l):
        i = jax.lax.axis_index(axis).astype(jnp.int32)
        fwd = [(d, d + 1) for d in range(ndev - 1)]
        bwd = [(d, d - 1) for d in range(1, ndev)]
        lo = jax.lax.ppermute(x_l[-h:], axis, fwd)    # left neighbour tail
        hi = jax.lax.ppermute(x_l[:h], axis, bwd)     # right neighbour head
        x_ext = jnp.concatenate([lo, x_l, hi])
        shift = i * npr - h                  # global → halo-local offset
        base_rel = base_l - shift // wbl
        cols_rel = cols_l - shift
        return windowed_take(cols_rel, x_ext, base_rel, wr, nsrc_loc)

    specs = dict(mesh=mesh, in_specs=(P(None, axis), P(axis), P(axis)),
                 out_specs=P(None, axis))
    try:                                  # JAX <0.9 spells it check_rep
        mapped = shard_map(local, check_rep=False, **specs)
    except TypeError:                     # JAX >=0.9 renamed it check_vma
        try:
            mapped = shard_map(local, check_vma=False, **specs)
        except TypeError:
            mapped = shard_map(local, **specs)
    return mapped(cols, x, base_blk)


def plan_windows(cols: np.ndarray, rownnz: np.ndarray, ncols: int,
                 include_identity: bool = False
                 ) -> tuple[np.ndarray, int, int] | None:
    """Pick per-tile window bases and the window half-size ``wr``.

    ``cols``: (K, npad) host array (npad % 1024 == 0); ``rownnz``: (npad,).
    ``include_identity`` additionally covers each tile's own row range —
    needed when callers gather at indices like "my own row" or "my
    proposed partner" that may not be stored columns.
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
    if include_identity:
        tstart = np.arange(ntiles) * T
        cmin = np.minimum(cmin, tstart)
        cmax = np.maximum(cmax, tstart + T - 1)
    return plan_from_minmax(cmin, cmax, ncols)


@partial(jax.jit, static_argnames=("ntiles", "include_identity"))
def plan_windows_device(cols: jnp.ndarray, rownnz: jnp.ndarray,
                        ntiles: int, include_identity: bool = False):
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
    cmin = jnp.where(empty, 0, cmin)
    cmax = jnp.where(empty, 0, cmax)
    if include_identity:
        tstart = jnp.arange(ntiles, dtype=jnp.int32) * T
        cmin = jnp.minimum(cmin, tstart)
        cmax = jnp.maximum(cmax, tstart + T - 1)
    return cmin, cmax


@partial(jax.jit, static_argnames=("ntiles",))
def plan_minmax_masked(cols: jnp.ndarray, mask: jnp.ndarray, ntiles: int):
    """Per-tile min/max column over an explicit validity mask (used where
    slot validity is not prefix-shaped, e.g. weighted transfer arrays
    reloaded from a checkpoint, whose invalid slots carry val = 0)."""
    big = jnp.where(mask, cols, jnp.iinfo(jnp.int32).max)
    small = jnp.where(mask, cols, -1)
    K = cols.shape[0]
    cmin = big.reshape(K, ntiles, T).min(axis=(0, 2))
    cmax = small.reshape(K, ntiles, T).max(axis=(0, 2))
    empty = cmax < 0
    return jnp.where(empty, 0, cmin), jnp.where(empty, 0, cmax)


def plan_from_minmax(cmin: np.ndarray, cmax: np.ndarray,
                     ncols: int) -> tuple[np.ndarray, int, int] | None:
    """Host-side tail of the planner given per-tile (cmin, cmax).
    Bases are in wb·128-lane units (wb = _wb(wr)); each tile's window is
    [base·wb·128, base·wb·128 + 2·wr·128)."""
    for wr in _WRS:
        wbl = _wb(wr) * 128
        base = cmin // wbl
        nb = _nblk(wr)
        if np.all(cmax < (base + nb) * wbl):
            nsrc_pad = _round_up(
                max(int((base.max() + nb) * wbl), ncols, 128), 128)
            return base.astype(np.int32), wr, int(nsrc_pad)
    return None


def anchored_base(ntiles: int, wr: int, ncols: int,
                  stretch: float = 1.0) -> tuple[np.ndarray, int]:
    """Diagonal-anchored window bases: tile t's window is centred on
    ``stretch ×`` its own row range.  ``stretch`` maps between index
    spaces (1 for square operators; the fine/coarse ratio for member
    gathers, whose sources live near coarse_index × ratio).  Used by the
    split planner when a handful of outlier columns defeat the exact
    (cover-everything) planner — e.g. skyscraper tower boundaries after
    aggregation.  Returns ``(base, nsrc_pad)`` — the per-tile window
    bases plus the padded source length the windows index into."""
    w = wr * 128
    wbl = _wb(wr) * 128
    nsrc_pad = _round_up(max(ncols, 2 * w, 128), 128)
    max_base = max((nsrc_pad - 2 * w) // wbl, 0)
    centre = ((np.arange(ntiles, dtype=np.int64) * T + T // 2)
              * stretch).astype(np.int64)
    # centred window [b·wbl, b·wbl + 2w) on the wb grid: round the ideal
    # start (centre − w) to the NEAREST wbl multiple so both sides keep
    # ≥ w − wbl/2 coverage — plain floor loses up to wbl on the right,
    # which at wb == wr (pow2 rungs) can shrink right coverage to ~0
    base = np.clip((centre - w + wbl // 2) // wbl, 0, max_base)
    return base.astype(np.int32), int(nsrc_pad)


@partial(jax.jit, static_argnames=("wrs",))
def overflow_fracs_device(cols, rownnz, bases, wrs: tuple):
    """Out-of-window nnz fraction for EVERY anchored-plan candidate in one
    program: ``bases``: (len(wrs), ntiles) stacked per-candidate window
    bases.  Replaces one blocking readback per candidate (~50 ms each
    over the tunnel) with a single readback of len(wrs) floats."""
    sl = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 0)
    valid = sl < rownnz[None, :]
    tile = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1) // T
    nval = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    fr = []
    for i, wr in enumerate(wrs):
        lo = (jnp.take(bases[i], tile, axis=0).astype(jnp.int64)
              * (_wb(wr) * 128))
        inwin = valid & (cols >= lo) & (cols < lo + 2 * wr * 128)
        fr.append(jnp.sum((valid & ~inwin).astype(jnp.int32)) / nval)
    return jnp.stack(fr)


@partial(jax.jit, static_argnames=("wr",))
def split_overflow_device(cols, vals, rownnz, base_blk, wr: int):
    """Split stored entries by window membership under an anchored plan.

    Returns (main_cols, main_vals, ov_frac, ov_rows_flat, ov_cols_flat,
    ov_vals_flat, nov): the main arrays have vals = 0 (and cols = 0) at
    out-of-window slots — exactly the invariant the SpMV kernel needs;
    the overflow entries are globally compacted to the FRONT of flat
    (K·npad,) arrays (a padded COO — its SpMV cost is ~14 ns · nnz_ov,
    independent of which rows the stragglers cluster in)."""
    K, npad = cols.shape
    sl = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 0)
    valid = sl < rownnz[None, :]
    tile = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1) // T
    lo = (jnp.take(base_blk, tile, axis=0).astype(jnp.int64)
          * (_wb(wr) * 128))
    inwin = valid & (cols >= lo) & (cols < lo + 2 * wr * 128)
    over = valid & ~inwin
    main_cols = jnp.where(inwin, cols, 0)
    main_vals = jnp.where(inwin, vals, 0.0)
    nov = jnp.sum(over.astype(jnp.int32))
    nval = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    # global compaction: overflow entries to the front of flat arrays
    rows = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)
    key = jnp.where(over, 0, 1).astype(jnp.int32).ravel()
    _, ov_r, ov_c, ov_v = jax.lax.sort(
        (key, rows.ravel(), cols.ravel(), vals.ravel()), dimension=0,
        num_keys=1, is_stable=True)
    return main_cols, main_vals, nov / nval, ov_r, ov_c, ov_v, nov
