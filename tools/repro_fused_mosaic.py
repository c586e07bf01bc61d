"""Repro harness for the round-3 Mosaic miscompile (VERDICT r4 #1).

Round 3 observed that fusing the matching and Galerkin programs of one
aggregation pass into ONE XLA program silently dropped ≈19 % of coarse
rows at csky3d(80) scale, so ``setup/aggregation.py`` keeps them split
(`_match_pass` then `_galerkin_bound`, dispatched back-to-back).  This
script re-tests the fusion on the current toolchain:

  python tools/repro_fused_mosaic.py [sky_n] [poisson_n]

For each test operator it runs
  (a) the split pair of programs (the shipped, exact path), and
  (b) a single jitted program computing match + galerkin together,
then compares labels, coarse cols/vals/rownnz and the packed scalars
bitwise.  Any mismatch is broken down per-tile so a minimal repro can be
cut.  Exit code 1 on mismatch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(
                      os.environ.get("MGS_CACHE_DIR",
                                     "~/.cache/jaxcache_tpu")))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from multigridsolver_tpu.setup import aggregation as agg
from multigridsolver_tpu.setup.aggregation import (_match_pass,
                                                   _galerkin_bound,
                                                   _fused_stat)
from multigridsolver_tpu.utils.config import AggregationConfig


def fused_program(mat, stat, wr_g, ncb, wr_c1):
    """Match + Galerkin of ONE pass in a single XLA program."""
    @jax.jit
    def f(m):
        paired, labels, packed1, si, zerors = _match_pass(
            m, first_pass=True, **stat)
        cols, vals, rownnz, base_c, packed2, vt = _galerkin_bound(
            m, paired, labels, wr_m=wr_g, nc_bound=ncb, wr_c=wr_c1)
        return paired, labels, packed1, cols, vals, rownnz, base_c, packed2
    return f(mat)


def split_programs(mat, stat, wr_g, ncb, wr_c1):
    paired, labels, packed1, si, zerors = _match_pass(
        mat, first_pass=True, **stat)
    cols, vals, rownnz, base_c, packed2, vt = _galerkin_bound(
        mat, paired, labels, wr_m=wr_g, nc_bound=ncb, wr_c=wr_c1)
    return paired, labels, packed1, cols, vals, rownnz, base_c, packed2


def compare(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        print(f"  {name}: SHAPE MISMATCH {a.shape} vs {b.shape}")
        return False
    neq = a != b
    if not neq.any():
        print(f"  {name}: identical")
        return True
    frac = neq.mean()
    idx = np.argwhere(neq)
    print(f"  {name}: {neq.sum()} mismatches ({frac:.2%}); "
          f"first at {idx[0]}, last at {idx[-1]}")
    if a.ndim == 1 and a.shape[0] % 1024 == 0:
        tiles = np.unique(idx[:, 0] // 1024)
        print(f"    tiles affected: {tiles[:20]}{'...' if len(tiles) > 20 else ''}")
    return False


def run_case(label, ell):
    print(f"=== {label}: npad={ell.npad} k={ell.k} wr={ell.wr} ===")
    cfg = AggregationConfig(ktg=10.0, npass=2, tou=8.0)
    stat = _fused_stat(cfg)
    npad = ell.npad
    ncb = min(npad, ((int(0.625 * npad) + 1023) // 1024) * 1024)
    wr_g = min(128, max(32, 2 * (ell.wr or 16)))
    wr_c1 = min(192, 2 * wr_g)
    t0 = time.perf_counter()
    ref = split_programs(ell, stat, wr_g, ncb, wr_c1)
    jax.block_until_ready(ref[3])
    print(f"  split: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    fus = fused_program(ell, stat, wr_g, ncb, wr_c1)
    jax.block_until_ready(fus[3])
    print(f"  fused: {time.perf_counter()-t0:.2f}s")
    names = ("paired", "labels", "packed1", "cols", "vals", "rownnz",
             "base_c", "packed2")
    ok = True
    for n, r, f in zip(names, ref, fus):
        ok &= compare(n, r, f)
    # also: run the fused program a second time (miscompiles have been
    # seen to be schedule-dependent)
    fus2 = fused_program(ell, stat, wr_g, ncb, wr_c1)
    for n, f1, f2 in zip(names, fus, fus2):
        if (np.asarray(f1) != np.asarray(f2)).any():
            print(f"  NONDETERMINISTIC fused output: {n}")
            ok = False
    print(f"  => {'OK' if ok else 'MISMATCH'}")
    return ok


def full_round_program(mat, stat, wr_g, ncb, wr_c1, wr_g2):
    """BOTH passes of a fused round in ONE XLA program (the shipped
    4-program structure of _dispatch_fused_round, inlined)."""
    from multigridsolver_tpu.sparse.formats import ELL
    from multigridsolver_tpu.setup.aggregation import _concat_packed
    wc = wr_c1 * 128
    nsrc_c1 = ((ncb + 2 * wc + 127) // 128) * 128

    @jax.jit
    def f(m):
        paired1, labels1, packed1, si, zerors = _match_pass(
            m, first_pass=True, **stat)
        c1c, c1v, c1r, base_c1, packed2, c1t = _galerkin_bound(
            m, paired1, labels1, wr_m=wr_g, nc_bound=ncb, wr_c=wr_c1)
        c1 = ELL(cols=c1c, vals=c1v, rownnz=c1r, nrows=ncb, ncols=ncb,
                 base_blk=base_c1, wr=wr_c1, nsrc=nsrc_c1, vals_t=c1t)
        paired2, labels2, packed3, _, _ = _match_pass(
            c1, first_pass=False, **stat)
        c2c, c2v, c2r, _, packed4, c2t = _galerkin_bound(
            c1, paired2, labels2, wr_m=wr_g2, nc_bound=ncb)
        packed = _concat_packed(packed1, packed2, packed3, packed4)
        return (labels1, labels2, c1c, c1v, c1r, c2c, c2v, c2r, packed)
    return f(mat)


def split_round(mat, stat, wr_g, ncb, wr_c1, wr_g2):
    from multigridsolver_tpu.sparse.formats import ELL
    from multigridsolver_tpu.setup.aggregation import _concat_packed
    wc = wr_c1 * 128
    nsrc_c1 = ((ncb + 2 * wc + 127) // 128) * 128
    paired1, labels1, packed1, si, zerors = _match_pass(
        mat, first_pass=True, **stat)
    c1c, c1v, c1r, base_c1, packed2, c1t = _galerkin_bound(
        mat, paired1, labels1, wr_m=wr_g, nc_bound=ncb, wr_c=wr_c1)
    c1 = ELL(cols=c1c, vals=c1v, rownnz=c1r, nrows=ncb, ncols=ncb,
             base_blk=base_c1, wr=wr_c1, nsrc=nsrc_c1, vals_t=c1t)
    paired2, labels2, packed3, _, _ = _match_pass(
        c1, first_pass=False, **stat)
    c2c, c2v, c2r, _, packed4, c2t = _galerkin_bound(
        c1, paired2, labels2, wr_m=wr_g2, nc_bound=ncb)
    packed = _concat_packed(packed1, packed2, packed3, packed4)
    return (labels1, labels2, c1c, c1v, c1r, c2c, c2v, c2r, packed)


def run_round_case(label, ell):
    print(f"=== ROUND {label}: npad={ell.npad} k={ell.k} wr={ell.wr} ===")
    cfg = AggregationConfig(ktg=10.0, npass=2, tou=8.0)
    stat = _fused_stat(cfg)
    npad = ell.npad
    ncb = min(npad, ((int(0.625 * npad) + 1023) // 1024) * 1024)
    wr_g = min(128, max(32, 2 * (ell.wr or 16)))
    wr_c1 = min(192, 2 * wr_g)
    wr_g2 = min(192, 2 * wr_g)
    t0 = time.perf_counter()
    ref = split_round(ell, stat, wr_g, ncb, wr_c1, wr_g2)
    jax.block_until_ready(ref[-1])
    print(f"  split round: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    fus = full_round_program(ell, stat, wr_g, ncb, wr_c1, wr_g2)
    jax.block_until_ready(fus[-1])
    print(f"  fused round: {time.perf_counter()-t0:.2f}s")
    names = ("labels1", "labels2", "c1c", "c1v", "c1r", "c2c", "c2v",
             "c2r", "packed")
    ok = True
    for n, r, f in zip(names, ref, fus):
        ok &= compare(n, r, f)
    fus2 = full_round_program(ell, stat, wr_g, ncb, wr_c1, wr_g2)
    for n, f1, f2 in zip(names, fus, fus2):
        if (np.asarray(f1) != np.asarray(f2)).any():
            print(f"  NONDETERMINISTIC fused output: {n}")
            ok = False
    print(f"  => {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    sky_n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    pn = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    import scipy.sparse as sp
    from multigridsolver_tpu.sparse.formats import CSR
    from multigridsolver_tpu.cli.generators import csky3d

    mode = os.environ.get("REPRO_MODE", "round")   # "pass" or "round"
    case = run_round_case if mode == "round" else run_case
    ok = True
    if pn:
        lap = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(pn, pn),
                       format="csr")
        eye = sp.identity(pn, format="csr")
        a = CSR.from_scipy((sp.kron(lap, eye) + sp.kron(eye, lap)).tocsr())
        ok &= case(f"poisson{pn}", a.to_ell(dtype=jnp.float32))
    if sky_n:
        a80 = csky3d(sky_n)
        ok &= case(f"csky3d{sky_n}",
                   a80.to_ell(dtype=jnp.float32, with_transpose=True))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
