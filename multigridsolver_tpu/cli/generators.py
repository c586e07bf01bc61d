"""Problem generators: Poisson and the CSky convection-diffusion suites.

``poisson2d`` reproduces ``src/common/poisson.cpp:7-41`` exactly (5-point
−1/4/−1 stencil, n²×n², row-major grid, integer values).

``csky2d``/``csky3d`` reproduce the reference's shipped "CSky" skyscraper
convection-diffusion matrices (``matrices/CSky2d{3,10,20,100}.mtx``,
``CSky3d{3,10,20,30}.mtx``), reverse-engineered from the files (no
generator ships with the reference).  The model is a cell-centred finite
volume discretisation on the unit square/cube with n cells per side:

* diffusion coefficient field ("skyscrapers", the classic Notay AGMG test
  family):  a(x) = 10³ · (⌊10·x_last⌋ + 1)  when every ⌊10·x_d⌋ is even,
  else 1  (x_last = the fastest-varying coordinate);
* interior faces use the harmonic mean of the adjacent cell values;
  Dirichlet boundary faces evaluate the coefficient field *at the face
  centre* (so ghost "towers" appear on the x_d = 1 boundaries);
* upwind convection with velocity v = 1000 along every axis: the inflow
  (smaller-coordinate) faces carry an extra v·h^(d−1) term (v·h in 2D,
  v·h² in 3D), including inflow boundary faces;
* matrix rows are scaled like the reference: 2D entries are the face
  coefficients themselves, 3D entries carry one factor h (face area h² /
  distance h).

Validated entry-for-entry against all shipped CSky files (tests).
"""
from __future__ import annotations

import numpy as np

from ..sparse.formats import COO, CSR


def poisson2d(n: int) -> CSR:
    """5-point Laplacian on an n×n grid (n² unknowns), poisson.cpp parity."""
    import scipy.sparse as sp
    lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
    eye = sp.identity(n)
    return CSR.from_scipy((sp.kron(lap1, eye) + sp.kron(eye, lap1)).tocsr())


def _sky_field(coords: np.ndarray, tower: float = 1000.0,
               bands: int = 10) -> np.ndarray:
    """Coefficient field a(x) for points given as (..., dim) coordinates.

    Tower height is set by the block index of coordinate 1 (the second
    coordinate) — fitted against the shipped files: 2D heights follow the
    fast axis (y), 3D heights follow the middle axis.
    """
    b = np.floor(bands * coords).astype(np.int64)
    all_even = np.all(b % 2 == 0, axis=-1)
    height = tower * (b[..., 1] + 1)
    return np.where(all_even, height, 1.0)


def csky2d(n: int, v: float = 1000.0, tower: float = 1000.0,
           legacy_first_edge: bool | None = None) -> CSR:
    """``legacy_first_edge`` reproduces a floating-point artifact of the
    reference's (lost) generator visible in the shipped CSky2d100.mtx:
    the slow-axis faces on the FIRST tower edge (x = 0.1, between cell
    rows n/10−1 and n/10) carry the *left cell's* coefficient instead of
    the harmonic mean — every other tower edge in the same file is
    harmonic.  Auto-enabled for n = 100 (the shipped file); the other
    shipped 2D sizes match the canonical harmonic discretisation."""
    if legacy_first_edge is None:
        legacy_first_edge = (n == 100)
    h = 1.0 / n
    vh = v * h
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    centers = np.stack([(ii + 0.5) * h, (jj + 0.5) * h], axis=-1)
    a = _sky_field(centers, tower)

    def harm(x, y):
        return 2.0 * x * y / (x + y)

    rows, cols, vals = [], [], []
    diag = np.zeros((n, n))

    def add(i, j, i2, j2, f):
        rows.append(i * n + j)
        cols.append(i2 * n + j2)
        vals.append(-f)
        diag[i, j] += f

    # slow-axis faces (neighbour at k ± n)
    f_i = harm(a[:-1, :], a[1:, :])               # between (i,·) and (i+1,·)
    if legacy_first_edge and n >= 20 and n % 10 == 0:
        edge = n // 10 - 1                        # face at x = 0.1
        f_i[edge, :] = a[edge, :]
    for i in range(n - 1):
        for j in range(n):
            add(i, j, i + 1, j, f_i[i, j])            # outflow (no vh)
            add(i + 1, j, i, j, f_i[i, j] + vh)       # inflow (+vh)
    # fast-axis faces (neighbour at k ± 1)
    f_j = harm(a[:, :-1], a[:, 1:])
    for i in range(n):
        for j in range(n - 1):
            add(i, j, i, j + 1, f_j[i, j])
            add(i, j + 1, i, j, f_j[i, j] + vh)
    # boundary faces: coefficient field evaluated at the face centre
    for j in range(n):
        y = (j + 0.5) * h
        diag[0, j] += _sky_field(np.array([0.0, y]), tower) + vh   # inflow
        diag[n - 1, j] += _sky_field(np.array([1.0, y]), tower)    # outflow
    for i in range(n):
        x = (i + 0.5) * h
        diag[i, 0] += _sky_field(np.array([x, 0.0]), tower) + vh
        diag[i, n - 1] += _sky_field(np.array([x, 1.0]), tower)
    for i in range(n):
        for j in range(n):
            rows.append(i * n + j)
            cols.append(i * n + j)
            vals.append(diag[i, j])
    return COO(row=np.array(rows), col=np.array(cols),
               val=np.array(vals), shape=(n * n, n * n)).to_csr()


def csky3d(n: int, v: float = 1000.0, tower: float = 1000.0,
           legacy_mid_shift: bool | None = None) -> CSR:
    """``legacy_mid_shift`` reproduces the shipped CSky3d10.mtx, whose
    interior slow-axis (axis 0) face coefficients sample the field one
    cell over along the MID axis — an off-by-one in the (lost) reference
    generator, visible as e.g. harm(a(0,2,k), a(1,2,k)) on the face
    between (0,1,k) and (1,1,k).  The shipped n = 30 / 80 files use the
    canonical harmonic on every axis.  Auto-enabled for n = 10."""
    if legacy_mid_shift is None:
        legacy_mid_shift = (n == 10)
    h = 1.0 / n
    conv = v * h * h          # v·h² (3D upwind term, matrix scaled by h)
    dif = h                   # diffusion faces carry a·h
    idx = np.arange(n)
    ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
    centers = np.stack([(ii + 0.5) * h, (jj + 0.5) * h, (kk + 0.5) * h],
                       axis=-1)
    a = _sky_field(centers, tower)

    def harm(x, y):
        return 2.0 * x * y / (x + y)

    def node(i, j, k):
        return (i * n + j) * n + k

    rows, cols, vals = [], [], []
    diag = np.zeros((n, n, n))

    def add(src, dst, f):
        rows.append(src)
        cols.append(dst)
        vals.append(-f)

    for axis, stride in ((0, n * n), (1, n), (2, 1)):
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[axis] = slice(0, n - 1)
        sl_hi[axis] = slice(1, n)
        a_ax = a
        if legacy_mid_shift and axis == 0:
            # sample the field one cell over along the mid axis,
            # unclamped: j = n-1 reads y = (n+0.5)h > 1 (block 10, height
            # 11000 for n = 10) exactly as the reference generator did
            shifted = np.stack([centers[..., 0],
                                centers[..., 1] + h,
                                centers[..., 2]], axis=-1)
            a_ax = _sky_field(shifted, tower)
        f = harm(a_ax[tuple(sl_lo)], a_ax[tuple(sl_hi)]) * dif
        for p in range(n - 1):
            for q in range(n):
                for r in range(n):
                    coords = [q, r]
                    coords.insert(axis, p)
                    i, j, k = coords
                    src = node(i, j, k)
                    dst = src + stride
                    fpqr = f[tuple(coords)]
                    add(src, dst, fpqr)
                    diag[i, j, k] += fpqr
                    add(dst, src, fpqr + conv)
                    coords2 = list(coords)
                    coords2[axis] += 1
                    diag[tuple(coords2)] += fpqr + conv
        # boundary faces on this axis
        for q in range(n):
            for r in range(n):
                coords0 = [q, r]
                coords0.insert(axis, 0)
                coords1 = [q, r]
                coords1.insert(axis, n - 1)
                pt0 = [(q + 0.5) * h, (r + 0.5) * h]
                pt0.insert(axis, 0.0)
                pt1 = [(q + 0.5) * h, (r + 0.5) * h]
                pt1.insert(axis, 1.0)
                diag[tuple(coords0)] += _sky_field(np.array(pt0),
                                                   tower) * dif + conv
                diag[tuple(coords1)] += _sky_field(np.array(pt1),
                                                   tower) * dif
    for i in range(n):
        for j in range(n):
            for k in range(n):
                rows.append(node(i, j, k))
                cols.append(node(i, j, k))
                vals.append(diag[i, j, k])
    return COO(row=np.array(rows), col=np.array(cols),
               val=np.array(vals), shape=(n ** 3, n ** 3)).to_csr()
