"""Multi-host (multi-process) backend.

SURVEY §2.5/§5 requires the distribution layer to span *hosts*, not just
the chips of one process: the moral equivalent of the Fortran ground
truth's vestigial MPI scaffolding (``dagtwolev_mex.f90:119-123``
lstout/lstin neighbour lists) re-imagined the JAX way — one
``jax.distributed`` coordination service, a ``Mesh`` over the union of
every process's devices, and the exact same GSPMD-sharded programs the
single-process mesh runs (``parallel/sharded.py``, ``dist_setup.py``).
Collectives ride ICI within a host and DCN across hosts; the program
text does not change.

Wiring:

* each process calls :func:`init_multihost` (or sets
  ``MGS_COORDINATOR`` / ``MGS_NUM_PROCESSES`` / ``MGS_PROCESS_ID`` and
  calls it with no args) before touching any device,
* :func:`global_row_mesh` builds the 1-D row-partition mesh over ALL
  processes' devices,
* host↔device traffic goes through :func:`put_global` /
  :func:`host_read`: ``put_global`` is collective (every process passes
  the same host array and receives the globally-sharded jax.Array);
  ``host_read`` is the multihost-safe replacement for ``np.asarray`` on
  arrays whose shards live on other processes.

CI validation: ``tests/test_multihost.py`` launches 2 processes × 4
virtual CPU devices each and asserts the sharded setup's labels are
bit-identical to the single-process run and the sharded solve converges
with the same iteration count — the same contract ``tests/test_parallel.py``
asserts in-process.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   **kw) -> None:
    """Start (or join) the jax.distributed coordination service.

    Arguments default to the ``MGS_COORDINATOR`` / ``MGS_NUM_PROCESSES``
    / ``MGS_PROCESS_ID`` environment variables, so launchers only need to
    export three variables per rank.  Safe to call once per process,
    before any jax device use.  On managed TPU pods (GKE/Borg-style
    metadata available) plain ``jax.distributed.initialize()`` with no
    arguments auto-detects everything; we preserve that by passing None
    through."""
    coordinator = coordinator or os.environ.get("MGS_COORDINATOR")
    if num_processes is None and os.environ.get("MGS_NUM_PROCESSES"):
        num_processes = int(os.environ["MGS_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MGS_PROCESS_ID"):
        process_id = int(os.environ["MGS_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_row_mesh() -> Mesh:
    """1-D ``("rows",)`` mesh over every device of every process.

    ``jax.devices()`` in a multi-process program already returns the
    global device list ordered by process, so consecutive row blocks land
    on one host's chips first — the layout that keeps halo exchanges on
    ICI and only the process-boundary rows on DCN."""
    return Mesh(np.asarray(jax.devices()), axis_names=("rows",))


def put_global(x: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Collectively place the same host array on a cross-process mesh.

    Every process passes the identical full array; each transfers only
    its addressable shards (``jax.device_put`` multihost semantics)."""
    return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))


def host_read(x) -> np.ndarray:
    """``np.asarray`` that also works for cross-process global arrays.

    Single-process / fully-addressable arrays read directly.  Fully
    replicated global arrays read their local copy.  Sharded global
    arrays are re-laid-out to replicated by a tiny jitted identity (an
    all-gather over the mesh) and then read locally — the collective is
    executed by every process, so this must be called collectively, like
    every other host sync in a multi-process program."""
    if isinstance(x, (np.ndarray, int, float)):
        return np.asarray(x)
    x = jnp.asarray(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    mesh = x.sharding.mesh
    rep = jax.jit(lambda v: v,
                  out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(rep.addressable_data(0))


def is_multiprocess() -> bool:
    return jax.process_count() > 1
