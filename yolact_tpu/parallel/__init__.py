from yolact_tpu.parallel.mesh import (
    make_mesh, make_mesh_2d, shard_batch, shard_batch_spatial, replicate,
    batch_sharding)
