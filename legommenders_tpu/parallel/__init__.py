from legommenders_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
)
