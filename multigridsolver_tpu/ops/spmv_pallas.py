"""Pallas TPU kernel: fused DIA SpMV.

The XLA lowering of the roll-based DIA SpMV (sparse/hybrid.py) reads the
x vector once per diagonal — D+1 HBM passes over x plus D passes over the
value lanes.  This kernel tiles the output rows, DMAs each tile's x
*window* (tile + halo of the largest |offset|) into VMEM **once**, and
applies all D shifted multiply-accumulates from VMEM — HBM traffic drops
from ~2D·n to (D+2)·n words, i.e. up to ~2x for the dominant finest-level
smoothing/matvec ops.

x must be pre-padded with ``halo`` zeros on each side (the caller wraps
this) so every window DMA is in-bounds; out-of-range diagonal slots carry
dval = 0 (the HYB invariant), so no masking is needed.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.hybrid import HYB


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dia_kernel(offsets, halo, tile, x_hbm, dvals_ref, o_ref, scratch, sem):
    t = pl.program_id(0)
    window = tile + 2 * halo
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(t * tile, window)], scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((tile,), jnp.float32)
    for d, o in enumerate(offsets):
        acc = acc + dvals_ref[d, :] * scratch[pl.ds(halo + o, tile)]
    o_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "tile"))
def dia_spmv_pallas(dvals: jnp.ndarray, x: jnp.ndarray, offsets: tuple,
                    tile: int = 32768) -> jnp.ndarray:
    """y[i] = Σ_d dvals[d, i] · x[i + offsets[d]].

    ``x``: (npad,) with npad == dvals.shape[1]; returns (npad,).
    """
    d_count, npad = dvals.shape
    npad_t = _round_up(npad, tile)
    if npad_t != npad:
        # grow to a tile multiple; extra rows carry dval = 0
        dvals = jnp.pad(dvals, ((0, 0), (0, npad_t - npad)))
        x = jnp.pad(x, (0, npad_t - npad))
    halo = _round_up(max((abs(o) for o in offsets), default=0), 128)
    # pad x with halo zeros on both sides so window DMAs stay in-bounds
    xp = jnp.concatenate([jnp.zeros((halo,), x.dtype), x,
                          jnp.zeros((halo,), x.dtype)])
    grid = (npad_t // tile,)
    out = pl.pallas_call(
        partial(_dia_kernel, offsets, halo, tile),
        out_shape=jax.ShapeDtypeStruct((npad_t,), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x stays in HBM
            pl.BlockSpec((d_count, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda t: (t,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, dvals)
    return out[:npad]


def hyb_spmv_pallas(a: HYB, x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in HYB SpMV using the fused DIA kernel (ELL remainder falls
    back to the XLA gather path)."""
    from ..sparse import ops as ell_ops
    y = dia_spmv_pallas(a.dvals, x, a.offsets)
    if a.ell is not None:
        y = y + ell_ops.spmv(a.ell, x)
    return y
