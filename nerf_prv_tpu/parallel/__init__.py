from .mesh import batch_sharding, make_mesh, pad_to_multiple, replicated, shard_batch

__all__ = [
    "batch_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
]
