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
    return dataclasses.replace(a, base_blk=None, wr=None, nsrc=None)


def build_amg_setup_sharded(a: ELL, cfg: HierarchyConfig, mesh: Mesh,
                            timer=None):
    """Run the full multilevel aggregation setup with every level's
    arrays row-sharded over ``mesh``.

    Returns the same SetupResult as the single-chip
    ``build_amg_setup`` — coarse operators come out sharded (their
    shardings propagate from the inputs through GSPMD); labels are
    bit-identical to the single-chip result.
    """
    from ..setup.aggregation import build_amg_setup
    a_sh = shard_ell(strip_plan(a), mesh)
    return build_amg_setup(a_sh, cfg, timer=timer)
