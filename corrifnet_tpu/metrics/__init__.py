from corrifnet_tpu.metrics.jaccard import (
    jaccard,
    jaccard2,
    jaccard2_masked,
    jaccard_and_f1,
    jaccard_f1_pair,
)
from corrifnet_tpu.metrics.losses import bce_with_logits, reference_bce_loss

__all__ = [
    "jaccard",
    "jaccard2",
    "jaccard2_masked",
    "jaccard_and_f1",
    "jaccard_f1_pair",
    "bce_with_logits",
    "reference_bce_loss",
]
