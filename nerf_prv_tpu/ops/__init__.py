from .fused import encode_fused
from .hash_encode import hash_encode_pallas
from .sorted_grad import encode_sorted, segmented_scatter_add

__all__ = [
    "encode_fused",
    "hash_encode_pallas",
    "encode_sorted",
    "segmented_scatter_add",
]
