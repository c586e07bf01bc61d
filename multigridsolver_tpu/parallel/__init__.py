from .sharded import (make_row_mesh, shard_ell, shard_hierarchy,
                      shard_vector, replicate, repad_ell)
