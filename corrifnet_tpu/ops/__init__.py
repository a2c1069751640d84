from corrifnet_tpu.ops.correlation import correlation_fusion, correlation_fusion_xla

__all__ = ["correlation_fusion", "correlation_fusion_xla"]
