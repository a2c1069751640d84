from corrifnet_tpu.utils.logfiles import RunLogs

__all__ = ["RunLogs"]
