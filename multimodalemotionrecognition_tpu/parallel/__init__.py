from multimodalemotionrecognition_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_sharding_rules",
    "replicate",
    "shard_batch",
    "shard_params",
]
