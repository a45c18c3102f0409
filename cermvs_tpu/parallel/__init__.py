from cermvs_tpu.parallel.mesh import (
    batch_sharded, initialize_distributed, make_mesh, replicated, view_sharded,
)
