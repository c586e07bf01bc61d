"""Worker for tests/test_multihost.py — one rank of an N-process CPU run.

Asserts, from inside a genuinely multi-process program:
* distributed setup labels are bit-identical to the local single-device
  setup (same contract tests/test_parallel.py proves in-process),
* the sharded multilevel solve converges with the same iteration count
  and the same solution as the local solve.

Prints "MULTIHOST-OK <labels-checksum> <iters>" on success; the parent
test asserts both ranks print identical lines.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax                                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from multigridsolver_tpu.parallel.multihost import (init_multihost,  # noqa
                                                    global_row_mesh,
                                                    host_read)

init_multihost(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc

import numpy as np                                            # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import scipy.sparse as sp                                     # noqa: E402

from multigridsolver_tpu.sparse.formats import CSR            # noqa: E402
from multigridsolver_tpu.setup.aggregation import build_amg_setup  # noqa
from multigridsolver_tpu.parallel import (build_amg_setup_sharded,  # noqa
                                          shard_hierarchy, shard_vector)
from multigridsolver_tpu.solve.hierarchy import build_hierarchy  # noqa
from multigridsolver_tpu.solve import solve_hierarchy         # noqa: E402
from multigridsolver_tpu.solve.api import pad_vector          # noqa: E402
from multigridsolver_tpu.utils.config import (AggregationConfig,  # noqa
                                              HierarchyConfig)

n = 24
lap1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n))
eye = sp.identity(n)
a = CSR.from_scipy((sp.kron(lap1, eye) + sp.kron(eye, lap1)).tocsr())
cfg = HierarchyConfig(max_coarse_size=64,
                      aggregation=AggregationConfig(npass=2))

mesh = global_row_mesh()
assert mesh.devices.size == 4 * nproc

# --- setup parity: sharded over 2 hosts vs local single-device ----------
ref = build_amg_setup(a.to_ell(dtype=jnp.float64), cfg)
sh = build_amg_setup_sharded(a.to_ell(dtype=jnp.float64), cfg, mesh)
assert len(sh.matrices) == len(ref.matrices), \
    (len(sh.matrices), len(ref.matrices))
checksum = 0
for lr, ls in zip(ref.level_labels, sh.level_labels):
    lr_np, ls_np = np.asarray(lr), host_read(ls)
    m = min(lr_np.shape[0], ls_np.shape[0])
    np.testing.assert_array_equal(lr_np[:m], ls_np[:m])
    assert (ls_np[m:] < 0).all() and (lr_np[m:] < 0).all()
    checksum = (checksum * 1000003 + int(lr_np[:m].sum())) % (1 << 31)

# --- solve parity: sharded finest level over the cross-process mesh -----
hier = build_hierarchy(ref.matrices[0], ref.level_labels, ref.matrices[1:],
                       smoother_kind="chebyshev", cycle="vcycle")
rs = np.random.RandomState(0)
b = rs.rand(a.shape[0])
res_local = solve_hierarchy(hier, b, tol=1e-8)

hier_sh = shard_hierarchy(hier, mesh, shard_levels=1)
npad = hier_sh.levels[0].a.npad
b_sh = shard_vector(pad_vector(b, npad, jnp.float64), mesh)
res_sh = solve_hierarchy(hier_sh, b_sh, tol=1e-8)
it_l, it_s = int(res_local.iterations), int(res_sh.iterations)
assert res_sh.status == 0, res_sh
assert it_l == it_s, (it_l, it_s)
x_l = np.asarray(res_local.x)
x_s = host_read(res_sh.x)[: x_l.shape[0]]
np.testing.assert_allclose(x_s, x_l, rtol=1e-9, atol=1e-12)

print(f"MULTIHOST-OK {checksum} {it_s}", flush=True)
