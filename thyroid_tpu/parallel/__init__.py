from .mesh import (
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    fsdp_param_sharding,
    local_device_count,
    device_info,
)
from .multislice import (
    multislice_mesh,
    partition_folds,
    merge_slice_summaries,
    stack_pytrees,
    unstack_pytree,
    stacked_step,
)

__all__ = [
    "create_mesh", "batch_sharding", "replicated", "shard_batch",
    "fsdp_param_sharding", "local_device_count", "device_info",
    "multislice_mesh", "partition_folds", "merge_slice_summaries",
    "stack_pytrees", "unstack_pytree", "stacked_step",
]
