"""corrifnet_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of CorrIFNet.

A from-scratch framework with the capabilities of
`iremulku/CorrIFNet-Correlation-Aware-Interactive-Fusion-Multimodal-Learning-
for-Multispectral-Images`: multispectral (RGB/NIR/SWIR) binary segmentation of
DSTL satellite patches, a ~12-architecture model zoo behind a string registry,
5-fold cross-validation training with soft-Jaccard evaluation, checkpointing,
profiling and visualization — all redesigned TPU-first.

Reference layout mapping (reference file -> this package):
  F2_MAIN.py                  -> corrifnet_tpu.run.main
  F4_TRAIN.py                 -> corrifnet_tpu.train.loop
  F7_TEST2.py                 -> corrifnet_tpu.train.loop (test_model)
  F8_IMAGES4.py               -> corrifnet_tpu.data.dstl
  F3_DATASET.py               -> corrifnet_tpu.data.dataset
  F6_CROSSVAL.py              -> corrifnet_tpu.data.crossval
  F5_JACCARD*.py              -> corrifnet_tpu.metrics
  F11_SEGPLOT*.py             -> corrifnet_tpu.run.segplot
  mmvit4.py (CorrIFNet)       -> corrifnet_tpu.models.mmvit4
  mmmvit2.py / mmformer.py    -> corrifnet_tpu.models.{mmvit2,mmformer}
  model zoo (F9/F14/F28-F32,
  RFNet, RobustSeg,
  MultiSenseSeg, segformer)   -> corrifnet_tpu.models.*
  calculate*.py               -> corrifnet_tpu.run.profile
  allJaccardResults_*.py      -> corrifnet_tpu.run.evaluate
"""

__version__ = "0.1.0"
