from corrifnet_tpu.nn.conv import (
    Conv,
    Dense,
    EarlyFusionBlock,
    FusionPrenorm,
    GeneralConv3d,
)
from corrifnet_tpu.nn.norm import BatchNorm, GroupNorm, InstanceNorm, LayerNorm
from corrifnet_tpu.nn.resize import (
    avg_pool,
    max_pool,
    resize_linear,
    resize_nearest,
    upsample_bilinear_2d,
)
from corrifnet_tpu.nn.transformer import FeedForward, SelfAttention, Transformer

__all__ = [
    "Conv",
    "Dense",
    "EarlyFusionBlock",
    "FusionPrenorm",
    "GeneralConv3d",
    "BatchNorm",
    "GroupNorm",
    "InstanceNorm",
    "LayerNorm",
    "avg_pool",
    "max_pool",
    "resize_linear",
    "resize_nearest",
    "upsample_bilinear_2d",
    "FeedForward",
    "SelfAttention",
    "Transformer",
]
