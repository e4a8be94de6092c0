from .mesh import (BatchSharding, batch_sharding, check_divisible,
                   data_axis_size, data_sharding, make_mesh, model_axis_size,
                   put_batch, replicate, shard_batch, shard_model)

__all__ = ["BatchSharding", "batch_sharding", "check_divisible",
           "data_axis_size", "data_sharding", "make_mesh", "model_axis_size",
           "put_batch", "replicate", "shard_batch", "shard_model"]
