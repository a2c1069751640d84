from corrifnet_tpu.data.crossval import cross_val, load_permutation, write_permutation
from corrifnet_tpu.data.dataset import (
    Batch,
    batch_iterator,
    device_prefetch,
    num_batches,
)
from corrifnet_tpu.data.dstl import (
    DstlArrays,
    load_dstl,
    load_pack,
    normalize_per_fold,
    pack_mat_directory,
    synthetic_dstl,
)

__all__ = [
    "cross_val",
    "load_permutation",
    "write_permutation",
    "Batch",
    "batch_iterator",
    "device_prefetch",
    "num_batches",
    "DstlArrays",
    "load_dstl",
    "load_pack",
    "normalize_per_fold",
    "pack_mat_directory",
    "synthetic_dstl",
]
