from ssl_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, get_dist_info, replicate_sharding, shard_batch, batch_sharding,
)
