"""Sparse matrix containers for the TPU-native AGMG framework.

Design notes (TPU-first, not a port):

The reference (mishraiiit/MultiGridSolver) keeps matrices in CSR/CSC with
per-row pointer arrays and does per-row *sequential* work inside CUDA threads
(e.g. ``src/GPU_CUDAC++/MatrixIO.cu:32-58`` defines ``MatrixCSR``/``MatrixCSC``
structs with ``int* i/j`` + ``float* val``).  On TPU there are no per-lane
pointers or atomics: the natural layout is a *fixed-width padded ELL* block —
``cols``/``vals`` of shape ``(n_padded, K)`` — so every per-row computation
(row sums, strength-of-connection, neighbour argmin, SpMV) becomes a dense
``(n, K)`` vectorised VPU operation with static shapes that XLA can tile.

Three containers:

* :class:`COO` — host-side interchange (Matrix Market is 1-based COO;
  see ``src/common/MatrixIO.cpp:12-37``).  numpy arrays.
* :class:`CSR` — host-side canonical compressed form used for conversions,
  scipy cross-checks and the native C++ runtime boundary.  numpy arrays.
* :class:`ELL` — the device-resident compute format (JAX pytree).  Rows are
  padded to a static width ``K``; invalid slots have ``col = 0, val = 0`` and
  are masked via the per-row ``rownnz`` counts (explicit stored zeros are
  legal in the inputs — e.g. ``matrices/poisson10000grid.mtx`` stores ``0``
  values — so validity must not be inferred from ``val != 0``).

  The ELL arrays are **slot-major**: ``cols``/``vals`` have shape
  ``(K, n_padded)`` with the *row* index minor.  K is small (5-30); were it
  the minor axis, every (8, 128) TPU tile would be 96+% padding and the
  Mosaic/XLA compiler demonstrably chokes (measured: an identical
  gather+reduce program compiles in ~69 s for a (10⁶, 5) layout vs ~1.1 s
  for (5, 10⁶), with equal runtime).  Slot-major puts the million-row axis
  on the 128-lane dimension, which is the layout every per-row vectorised
  op wants.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def plans_enabled() -> bool:
    """Windowed-gather plans are attached on the TPU backend (or under the
    Pallas interpreter for tests); other backends keep XLA gathers."""
    from ..ops import gather_pallas as gp
    return gp.INTERPRET or jax.default_backend() == "tpu"


def with_host_plan(ell: "ELL", cols_np: np.ndarray,
                   rownnz_np: np.ndarray) -> "ELL":
    """Attach a windowed-gather plan computed from host-side arrays (used
    at .mtx / CSR ingestion, before the device transfer)."""
    if ell.npad % 1024 != 0 or not plans_enabled():
        return ell
    from ..ops import gather_pallas as gp
    plan = gp.plan_windows(np.asarray(cols_np), np.asarray(rownnz_np),
                           ell.ncols, include_identity=True)
    if plan is None:
        return ell
    base, wr, nsrc = plan
    roll = _roll_plan(np.asarray(cols_np), np.asarray(rownnz_np))
    if roll is not None:
        offs, ov = roll
        return dataclasses.replace(
            ell, base_blk=jnp.asarray(base), wr=wr, nsrc=nsrc,
            roll_offsets=offs,
            roll_ov=(tuple(jnp.asarray(v) for v in ov)
                     if ov is not None else None))
    return dataclasses.replace(ell, base_blk=jnp.asarray(base), wr=wr,
                               nsrc=nsrc)


def _roll_plan(cols_np: np.ndarray, rownnz_np: np.ndarray,
               scatter_cap: int = 8192, max_deltas: int = 8):
    """Detect the multi-delta roll structure of a stencil-like pattern.

    Per-slot dominant column offsets d_s (cols[s, i] == i + d_s) plus
    the SET D = {d_s} of distinct deltas.  An entry CONFORMS when its
    delta is ANY member of D, not just its own slot's mode: stencil
    boundary rows pack the same offsets at shifted slot positions, so
    per-slot mismatches are overwhelmingly other slots' modes —
    csky3d(80) has 3.2 % of entries off their own slot's mode but ZERO
    off the set (same for every poisson size).  take_neighbor then
    reads neighbour fields as |D| shifted loads + a K × |D| fused
    compare-select chain — ~10x cheaper than the windowed gather, whose
    unrolled in-window select chain costs ∝ wr (the 3D stencils force
    wr ≥ 64: the ±n² z-neighbour IS the window spread).

    Residual entries (delta ∉ D) get the (ov_slot, ov_row, ov_col)
    scatter patch; TPU scatters serialise (~12 ns/update), so plans with
    more than ``scatter_cap`` residuals are rejected (windowed path).
    Returns (offsets tuple, patch arrays | None) — patch None when the
    delta set covers everything.
    """
    K, npad = cols_np.shape
    valid = np.arange(K)[:, None] < rownnz_np[None, :]
    nval = int(valid.sum())
    if nval == 0 or npad % 1024:
        return None
    offs = cols_np - np.arange(npad)[None, :]
    ds = np.zeros(K, np.int64)
    for s in range(K):
        v = valid[s]
        if not v.any():
            continue
        o = offs[s][v]
        vals, counts = np.unique(o, return_counts=True)
        ds[s] = vals[np.argmax(counts)]
    uniq = sorted({int(d) for d in ds})
    if len(uniq) > max_deltas:
        return None
    match = np.zeros_like(valid)
    for d in uniq:
        match |= offs == d
    res = valid & ~match
    n_res = int(res.sum())
    # absolute cap bounds the serialised TPU scatter; the relative cap
    # rejects patterns that aren't actually stencil-like (a random
    # matrix's "modes" cover almost nothing)
    if n_res > min(scatter_cap, 0.05 * nval):
        return None
    offs_t = tuple(int(d) for d in ds)
    if n_res == 0:
        return offs_t, None
    sl, rw = np.nonzero(res)
    cap = max(-(-n_res // 1024) * 1024, 1024)
    ov_s = np.zeros(cap, np.int32)
    ov_r = np.zeros(cap, np.int32)
    ov_c = np.full(cap, int(cols_np[0, 0]), np.int32)
    ov_s[:n_res] = sl
    ov_r[:n_res] = rw
    ov_c[:n_res] = cols_np[sl, rw]
    return offs_t, (ov_s, ov_r, ov_c)


def with_device_plan(ell: "ELL") -> "ELL":
    """Attach a windowed-gather plan from the device arrays (one tiny
    min/max readback; used where the ELL is born on device)."""
    if ell.npad % 1024 != 0 or not plans_enabled():
        return ell
    from ..ops import gather_pallas as gp
    ntiles = ell.npad // 1024
    cmin, cmax = gp.plan_windows_device(ell.cols, ell.rownnz, ntiles,
                                        include_identity=True)
    plan = gp.plan_from_minmax(np.asarray(cmin), np.asarray(cmax),
                               ell.ncols)
    if plan is None:
        return ell
    base, wr, nsrc = plan
    return dataclasses.replace(ell, base_blk=jnp.asarray(base), wr=wr,
                               nsrc=nsrc)


@dataclass
class COO:
    """Host-side coordinate format (0-based)."""

    row: np.ndarray  # (nnz,) int
    col: np.ndarray  # (nnz,) int
    val: np.ndarray  # (nnz,) float
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return int(self.row.shape[0])

    def to_csr(self) -> "CSR":
        """Sort by (row, col), merge duplicates by summation (MM semantics)."""
        n, m = self.shape
        order = np.lexsort((self.col, self.row))
        r, c, v = self.row[order], self.col[order], self.val[order]
        if len(r) > 0:
            # merge duplicate (r, c) entries by summing, keeping first position
            key_changed = np.empty(len(r), dtype=bool)
            key_changed[0] = True
            key_changed[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
            group = np.cumsum(key_changed) - 1
            nv = np.zeros(group[-1] + 1, dtype=v.dtype)
            np.add.at(nv, group, v)
            keep = np.flatnonzero(key_changed)
            r, c, v = r[keep], c[keep], nv
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, r + 1, 1)
        indptr = np.cumsum(indptr)
        return CSR(indptr=indptr.astype(np.int64), indices=c.astype(np.int64),
                   data=v, shape=(n, m))


@dataclass
class CSR:
    """Host-side CSR with rows sorted by column (canonical)."""

    indptr: np.ndarray   # (n+1,)
    indices: np.ndarray  # (nnz,)
    data: np.ndarray     # (nnz,)
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    @property
    def nrows(self) -> int:
        return self.shape[0]

    @property
    def ncols(self) -> int:
        return self.shape[1]

    def rownnz(self) -> np.ndarray:
        return np.diff(self.indptr)

    def to_coo(self) -> COO:
        row = np.repeat(np.arange(self.nrows, dtype=np.int64), self.rownnz())
        return COO(row=row, col=self.indices.copy(), val=self.data.copy(),
                   shape=self.shape)

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        coo = self.to_coo()
        np.add.at(out, (coo.row, coo.col), coo.val)
        return out

    def transpose(self) -> "CSR":
        coo = self.to_coo()
        return COO(row=coo.col, col=coo.row, val=coo.val,
                   shape=(self.shape[1], self.shape[0])).to_csr()

    def to_scipy(self):
        import scipy.sparse as sp
        return sp.csr_matrix((self.data, self.indices, self.indptr),
                             shape=self.shape)

    @staticmethod
    def from_scipy(m) -> "CSR":
        m = m.tocsr()
        m.sort_indices()
        return CSR(indptr=m.indptr.astype(np.int64),
                   indices=m.indices.astype(np.int64),
                   data=np.asarray(m.data), shape=m.shape)

    def to_ell(self, k: int | None = None, row_pad: int = 1024,
               dtype=jnp.float32, with_transpose: bool = False) -> "ELL":
        """Pack into the padded ELL device format.

        ``k`` defaults to the max row degree; rows are padded to a multiple
        of ``row_pad`` so all device shapes stay aligned.  The default 1024
        (8 sublanes × 128 lanes, one f32 vreg) makes every ELL eligible for
        the windowed-gather kernel, whose plan is attached here when the
        column pattern admits one (TPU backend only).

        ``with_transpose``: union-symmetrize the PATTERN (explicit zeros
        where only the transposed entry exists) and attach the aligned
        transposed-value field ``vals_t`` — the nonsymmetric setup path
        then never runs a transpose-matching pass (see ELL.vals_t).  On
        structurally symmetric inputs (every reference benchmark) the
        pattern is unchanged.
        """
        if with_transpose:
            import scipy.sparse as sps
            a_sp = self.to_scipy().tocsr()
            a_sp.sort_indices()
            at_sp = a_sp.T.tocsr()
            at_sp.sort_indices()
            # union of STORED patterns (explicit zeros are legal stored
            # entries — e.g. the shipped poisson grid files — and must
            # stay aligned between the two fields).  Built with ones data
            # so scipy's binop never prunes, then both value fields are
            # scattered onto the union positions by sorted-key lookup.
            pat = a_sp.copy()
            pat.data = np.ones_like(pat.data)
            patt = at_sp.copy()
            patt.data = np.ones_like(patt.data)
            u = (pat + patt).tocsr()
            u.sort_indices()
            n, m = u.shape
            key_u = (np.repeat(np.arange(n, dtype=np.int64),
                               np.diff(u.indptr)) * m
                     + u.indices.astype(np.int64))

            def fill(mtx):
                rows = np.repeat(np.arange(n, dtype=np.int64),
                                 np.diff(mtx.indptr))
                key = rows * m + mtx.indices.astype(np.int64)
                out = np.zeros(u.nnz, dtype=mtx.data.dtype)
                out[np.searchsorted(key_u, key)] = mtx.data
                return out

            fwd = sps.csr_matrix((fill(a_sp), u.indices, u.indptr),
                                 shape=u.shape)
            bwd = sps.csr_matrix((fill(at_sp), u.indices, u.indptr),
                                 shape=u.shape)
            fell = CSR.from_scipy(fwd).to_ell(k=k, row_pad=row_pad,
                                              dtype=dtype)
            tell = CSR.from_scipy(bwd).to_ell(k=fell.k, row_pad=row_pad,
                                              dtype=dtype)
            return dataclasses.replace(fell, vals_t=tell.vals)
        n, m = self.shape
        counts = self.rownnz()
        kmax = int(counts.max()) if n > 0 and self.nnz > 0 else 1
        if k is None:
            k = max(kmax, 1)
        if kmax > k:
            raise ValueError(f"row degree {kmax} exceeds requested width {k}")
        n_pad = max(_round_up(n, row_pad), row_pad)
        cols = np.zeros((k, n_pad), dtype=np.int32)
        vals = np.zeros((k, n_pad), dtype=np.float64)
        # slot index of each nnz within its row
        slot = np.arange(self.nnz, dtype=np.int64) - np.repeat(
            self.indptr[:-1], counts)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        cols[slot, rows] = self.indices
        vals[slot, rows] = self.data
        rownnz = np.zeros((n_pad,), dtype=np.int32)
        rownnz[:n] = counts
        ell = ELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals, dtype=dtype),
                  rownnz=jnp.asarray(rownnz), nrows=n, ncols=m)
        return with_host_plan(ell, cols, rownnz)


@partial(jax.tree_util.register_dataclass,
         data_fields=["cols", "vals", "rownnz", "base_blk", "vals_t",
                      "roll_ov"],
         meta_fields=["nrows", "ncols", "wr", "nsrc", "shard",
                      "roll_offsets"])
@dataclass
class ELL:
    """Device-resident padded ELL sparse matrix (JAX pytree), slot-major.

    ``cols``/``vals``: ``(K, n_padded)`` — axis 0 is the slot within a row,
    axis 1 the row (minor/lane axis; see module docstring for why).  Slot
    ``s`` of row ``i`` is valid iff ``s < rownnz[i]``.  Invalid slots hold
    ``col=0, val=0`` so SpMV needs no masking.  ``nrows``/``ncols`` are the
    *logical* (unpadded) dimensions and are static metadata.

    ``base_blk``/``wr``/``nsrc`` (optional) hold a windowed-gather plan
    over the column pattern (ops/gather_pallas.py): per-1024-row-tile
    window bases covering every stored column *and* the tile's own row
    range.  When present, every neighbour-field gather in SpMV, strength,
    matching and Galerkin rides the Pallas kernel (~0.09 ns/element)
    instead of the XLA scalar-loop gather (~7 ns/element on v5e).
    """

    cols: jnp.ndarray    # (K, n_pad) int32
    vals: jnp.ndarray    # (K, n_pad) float
    rownnz: jnp.ndarray  # (n_pad,) int32
    nrows: int
    ncols: int
    base_blk: jnp.ndarray | None = None
    wr: int | None = None
    nsrc: int | None = None
    # Transposed-value field (setup path): vals_t[s, i] = A[cols[s, i], i]
    # maintained as an invariant on a UNION-symmetric pattern (every (i,j)
    # stored ⇒ (j,i) stored, explicit zeros where A has no entry).  Makes
    # every aᵢⱼ/aⱼᵢ pair a local field read — the reference pays a binary
    # search per μ evaluation (MatrixAccess.cu:28-47) and the previous TPU
    # design an O(K²·n) transpose-matching pass per strength evaluation.
    # Built at ingestion (to_ell(with_transpose=True)); the pairwise
    # Galerkin merge carries it to every coarse level exactly, because
    # merging the transposed field over slot (I,J)'s contributors yields
    # Σ_{q∈I,p∈J} A[p,q] = Ac[J,I] (union-symmetry is inductive through
    # the product).  None outside the nonsymmetric setup path.
    vals_t: jnp.ndarray | None = None
    # Uniform-slot roll plan (attached at ingestion by with_host_plan):
    # ``roll_offsets`` is a per-slot tuple of dominant column offsets
    # (cols[s, i] == i + d_s for ≥ 98 % of valid entries — true of every
    # stencil family's finest level), ``roll_ov`` the (slot, row, col)
    # patch lists for the mismatching entries.  take_neighbor then reads
    # neighbour fields as K contiguous shifted loads + a tiny scatter
    # instead of K·n windowed gathers (sparse/ops.py).
    roll_ov: tuple | None = None
    # Row-shard metadata (parallel/dist_setup.shard_ell_planned):
    # (mesh, axis_name, npr, hblk) — npr rows per shard, hblk the halo
    # width in w = wr·128 units.  When set alongside a window plan, every
    # take_neighbor gather rides the shard_map halo-exchange Pallas kernel
    # (ops/gather_pallas.windowed_take_sharded) instead of a GSPMD
    # all-gather.  Static/meta: participates in jit cache keys.
    shard: tuple | None = None
    # per-slot dominant offsets for the roll fast path (see roll_ov)
    roll_offsets: tuple | None = None

    @property
    def has_plan(self) -> bool:
        return self.base_blk is not None

    @property
    def k(self) -> int:
        return self.cols.shape[0]

    @property
    def npad(self) -> int:
        return self.cols.shape[1]

    @property
    def nnz(self) -> int:
        s = jnp.sum(self.rownnz)
        if not getattr(s, "is_fully_addressable", True):
            from ..parallel.multihost import host_read
            return int(host_read(s))
        return int(s)

    def slot_mask(self) -> jnp.ndarray:
        """(K, n_pad) bool — True for valid (stored) slots."""
        sl = jax.lax.broadcasted_iota(jnp.int32, self.cols.shape, 0)
        return sl < self.rownnz[None, :]

    def row_iota(self) -> jnp.ndarray:
        """(K, n_pad) int32 — the row index of every slot."""
        return jax.lax.broadcasted_iota(jnp.int32, self.cols.shape, 1)

    def row_mask(self) -> jnp.ndarray:
        """(n_pad,) bool — True for logical (unpadded) rows."""
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, self.npad), 1)[0]
        return ri < self.nrows

    def to_csr(self) -> CSR:
        """Host-side conversion back to CSR (drops padding)."""
        cols = np.asarray(self.cols)[:, : self.nrows]
        vals = np.asarray(self.vals, dtype=np.float64)[:, : self.nrows]
        counts = np.asarray(self.rownnz)[: self.nrows].astype(np.int64)
        k = cols.shape[0]
        valid = np.arange(k)[:, None] < counts[None, :]   # (K, n)
        # emit in row-major order with ascending slot per row
        rows = np.repeat(np.arange(self.nrows, dtype=np.int64), counts)
        valid_t = valid.T                                  # (n, K)
        return COO(row=rows, col=cols.T[valid_t].astype(np.int64),
                   val=vals.T[valid_t], shape=(self.nrows, self.ncols)).to_csr()

    def astype(self, dtype) -> "ELL":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))
