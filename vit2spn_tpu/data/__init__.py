from vit2spn_tpu.data.augment import augment_batch, dual_view_batch
from vit2spn_tpu.data.datasets import (
    Dataset,
    load_dataset,
    register_dataset,
)

__all__ = [
    "augment_batch",
    "dual_view_batch",
    "Dataset",
    "load_dataset",
    "register_dataset",
]
