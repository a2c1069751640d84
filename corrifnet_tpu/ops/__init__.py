from corrifnet_tpu.ops.attention import attention_xla, fused_attention
from corrifnet_tpu.ops.correlation import correlation_fusion, correlation_fusion_xla

__all__ = [
    "attention_xla",
    "fused_attention",
    "correlation_fusion",
    "correlation_fusion_xla",
]
