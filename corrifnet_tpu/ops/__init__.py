from corrifnet_tpu.ops.attention import attention_xla, fused_attention
from corrifnet_tpu.ops.correlation import correlation_fusion, correlation_fusion_xla
from corrifnet_tpu.ops.instancenorm import relu_instancenorm, relu_instancenorm_xla

__all__ = [
    "attention_xla",
    "fused_attention",
    "correlation_fusion",
    "correlation_fusion_xla",
    "relu_instancenorm",
    "relu_instancenorm_xla",
]
