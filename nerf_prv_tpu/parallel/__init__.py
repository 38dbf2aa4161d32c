from .mesh import (batch_sharding, make_mesh, pad_to_multiple, replicated, shard_batch, tp_gather_rows, tp_voxel_field)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
    "tp_gather_rows",
    "tp_voxel_field",
]
