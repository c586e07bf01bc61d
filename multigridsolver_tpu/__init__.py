"""multigridsolver_tpu — TPU-native aggregation-based algebraic multigrid.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU/CUDA AGMG solver (mishraiiit/MultiGridSolver): pairwise-aggregation
setup, Galerkin coarse operators, multigrid-preconditioned Krylov solve, and
multi-chip scaling via jax.sharding meshes.
"""
from .sparse.formats import COO, CSR, ELL
from .utils.config import (AggregationConfig, HierarchyConfig, SmootherConfig,
                           SolveConfig)

__version__ = "0.1.0"
