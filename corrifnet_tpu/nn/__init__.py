from corrifnet_tpu.nn.conv import (
    Conv,
    ConvTranspose,
    Dense,
    EarlyFusionBlock,
    FusionPrenorm,
    GeneralConv3d,
    PReLU,
)
from corrifnet_tpu.nn.resize import max_pool_argmax, max_unpool
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
    "ConvTranspose",
    "PReLU",
    "max_pool_argmax",
    "max_unpool",
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
