"""mmformer baseline — re-exported from models.mmvit2 (the reference files
mmformer.py and mmmvit2.py are byte-identical apart from the correlation
stage; see models/mmvit2.py)."""

from corrifnet_tpu.models.mmvit2 import MMFormer

__all__ = ["MMFormer"]
