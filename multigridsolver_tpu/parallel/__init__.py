from .sharded import (make_row_mesh, shard_ell, shard_operator,
                      shard_hierarchy, shard_vector, replicate, repad_ell)
from .halo import make_halo_spmv, halo_width, HaloOp
from .dist_setup import build_amg_setup_sharded
from .multihost import (init_multihost, global_row_mesh, put_global,
                        host_read, is_multiprocess)
