from .mesh import (
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    fsdp_param_sharding,
    local_device_count,
    device_info,
)

__all__ = [
    "create_mesh", "batch_sharding", "replicated", "shard_batch",
    "fsdp_param_sharding", "local_device_count", "device_info",
]
