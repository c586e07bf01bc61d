"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated against XLA's host-platform device emulation, exactly as the
driver's ``dryrun_multichip`` does.  float64 is enabled so host-precision
parity checks against scipy are meaningful.
"""
import os

# Force the CPU backend.  NOTE: the session environment pre-imports jax via
# sitecustomize with JAX_PLATFORMS=axon (a tunneled real TPU), so plain env
# vars are already consumed — we must go through jax.config.update.  Unit
# tests on the tunnel would crawl (every D2H transfer crosses a relay), and
# the sharding tests need the 8 virtual CPU devices anyway.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: XLA:CPU's compiler has been seen to segfault
# on the suite's largest programs (SpGEMM merge chains) under memory
# pressure; cached binaries skip those compiles on every later run, and
# the suite gets much faster too
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jaxcache_cpu_tests"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

REFERENCE_MATRICES = "/root/reference/matrices"


def reference_matrix_path(name: str) -> str:
    return os.path.join(REFERENCE_MATRICES, name)


@pytest.fixture(scope="session")
def small_test_matrix():
    """The reference's hand-written 9x10 fixture
    (matrices/SmallTestMatrix.mtx, values 1..17)."""
    from multigridsolver_tpu.io import read_mtx
    return read_mtx(reference_matrix_path("SmallTestMatrix.mtx"))


@pytest.fixture(scope="session")
def csky2d10():
    from multigridsolver_tpu.io import read_mtx
    return read_mtx(reference_matrix_path("CSky2d10.mtx"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def poisson2d_csr(n: int):
    """5-point 2D Laplacian (−1/4/−1), n²×n², matching
    src/common/poisson.cpp:7-41."""
    import scipy.sparse as sp
    from multigridsolver_tpu.sparse.formats import CSR
    lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
    eye = sp.identity(n)
    a = sp.kron(lap1, eye) + sp.kron(eye, lap1)
    return CSR.from_scipy(a.tocsr())
