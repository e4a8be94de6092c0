from .mesh import (BatchSharding, batch_sharding, check_divisible,
                   data_axis_size, data_sharding, make_mesh, put_batch,
                   replicate, shard_batch)

__all__ = ["BatchSharding", "batch_sharding", "check_divisible",
           "data_axis_size", "data_sharding", "make_mesh", "put_batch",
           "replicate", "shard_batch"]
