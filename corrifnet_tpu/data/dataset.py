"""Batch iteration over preloaded arrays (reference: F3_DATASET.py + DataLoader).

The reference wraps preloaded tensors in a trivial ``Dataset``
(F3_DATASET.py:6-26) and iterates with ``DataLoader(batch_size, shuffle=False)``
(F2_MAIN.py:90, 104-111) — all randomization lives in the committed
permutation file, so iteration order is deterministic by construction.

TPU-first design: XLA compiles one program per input shape, so ragged final
batches would trigger recompilation. Batches are therefore *padded to a
static batch size* and carry a per-sample validity mask; the jitted
train/eval steps weight losses and metrics by that mask, which reproduces
the reference's ``batchLoad``-weighted accumulation (F4_TRAIN.py:65-71)
exactly, including the final partial batch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import numpy as np

__all__ = [
    "Batch",
    "DeviceDataset",
    "batch_iterator",
    "make_batches",
    "num_batches",
    "device_prefetch",
    "wire_cast_batch",
]


@dataclasses.dataclass
class Batch:
    images: np.ndarray  # (B, 3, 3, H, W) float32 (padded)
    masks: np.ndarray   # (B, 3, 1, H, W) float32 (padded)
    valid: np.ndarray   # (B,) float32 — 1.0 for real samples, 0.0 for padding


def num_batches(n: int, batch_size: int) -> int:
    return -(-n // batch_size)


def batch_iterator(
    images: np.ndarray,
    masks: np.ndarray,
    indices: np.ndarray,
    batch_size: int,
) -> Iterator[Batch]:
    """Yield fixed-shape padded batches over ``images[indices]`` in order."""
    n = len(indices)
    for start in range(0, n, batch_size):
        idx = indices[start : start + batch_size]
        b = len(idx)
        im = images[idx]
        ma = masks[idx]
        valid = np.ones((batch_size,), dtype=np.float32)
        if b < batch_size:
            pad = batch_size - b
            im = np.concatenate([im, np.zeros((pad, *im.shape[1:]), im.dtype)])
            ma = np.concatenate([ma, np.zeros((pad, *ma.shape[1:]), ma.dtype)])
            valid[b:] = 0.0
        yield Batch(im, ma, valid)


def make_batches(
    images: np.ndarray,
    masks: np.ndarray,
    indices: np.ndarray,
    batch_size: int,
    use_native: bool = None,
) -> Iterator[Batch]:
    """Preferred batch source for the training/eval loops.

    The C++ threaded double-buffered batcher (native/corrifnet_native.cc)
    sits behind ``use_native=True`` / CORRIFNET_NATIVE_BATCHER=1; measured
    on the target box (1 host core, 64-sample 224 set, batch 4) it is
    3.3x SLOWER per epoch than the vectorized numpy gather (89.9 vs
    27.4 ms) and hides LESS behind an overlapped consumer (+108.8 vs
    +46.8 ms across 16 x 10 ms steps) — per-batch ctypes/thread overhead
    exceeds the memcpy it offloads — so the DEFAULT is the Python path
    (identical output, golden-tested in tests/test_native.py). The C++
    MAT reader (data/native.py ``load_mat``) keeps its role: it replaces
    the scipy parse, the reference's actual disk hot spot
    (F8_IMAGES4.py:20-34). ``use_native``: None = env-controlled default,
    False = force Python, True = require native (raises if unavailable).
    """
    import os

    if use_native is None:
        if os.environ.get("CORRIFNET_NATIVE_BATCHER", "0") != "1":
            use_native = False
    if use_native is not False:
        try:
            from corrifnet_tpu.data.native import NativeBatcher

            return iter(NativeBatcher(images, masks, indices, batch_size))
        except Exception:
            if use_native:
                raise
    return batch_iterator(images, masks, indices, batch_size)


def wire_cast_batch(b: Batch) -> Batch:
    """Shrink a batch's host->device WIRE bytes without changing what the
    device computes. Through a tunneled/remote TPU attach the transfer is
    the training-epoch bottleneck (measured ~18 GB/epoch at f32 for the
    reference's 5,985-patch protocol, ~41 MB/s effective — NOTES round 4):

    * images: f32 -> bf16 on the host. Bit-identical to the status quo
      when the model computes in bf16 (MMVit4 casts its input first thing,
      models/mmvit4.py ``.astype(cdtype)``) — the same round-to-nearest-
      even cast just happens before the wire instead of after. Callers
      must gate on the model compute dtype (see train_model).
    * masks: f32 -> uint8 when exactly representable (the reference's
      masks are binary building masks, F8_IMAGES4.py:30-34); the jitted
      steps cast back to f32 on device — exact for 0/1. Non-binary masks
      pass through untouched.
    * valid: (B,) — too small to matter, untouched.
    """
    import ml_dtypes

    im, ma = b.images, b.masks
    if im.dtype == np.float32:
        im = im.astype(ml_dtypes.bfloat16)
    if ma.dtype == np.float32:
        ma8 = ma.astype(np.uint8)
        if (ma8 == ma).all():
            ma = ma8
    return Batch(im, ma, b.valid)


class DeviceDataset:
    """Device-RESIDENT dataset: upload images/masks to the accelerator once,
    build every batch with a jitted on-device gather.

    TPU-first rationale: the reference streams each batch from host RAM
    every epoch (DataLoader over preloaded tensors, F2_MAIN.py:104-111) —
    on a local GPU that's a PCIe round trip; through a tunneled/remote TPU
    attach it is THE epoch bottleneck (~30-36 MB/s effective, ~18 GB/epoch
    at f32 for the 5,985-patch protocol — NOTES round 4). The protocol's
    batch sequence is identical every epoch (all randomness lives in the
    committed permutation file), so the data belongs in HBM: in bf16+u8
    the full reference-scale set is ~8 GB of the chip's 16.

    Bit-identity with the streaming path: the gather zeroes padded rows
    (``jnp.where`` on the validity mask), exactly like the host batcher's
    zero padding, so batch-stats contributions match; the bf16/u8 wire
    casts are the same RTNE casts the bf16 models apply on device (see
    ``wire_cast_batch``). Verified in tests/test_data.py.

    Use ``batches(indices, batch_size)`` wherever ``make_batches`` +
    ``device_prefetch`` would stream; single-device only (under a mesh the
    sharding layer owns batch placement — keep streaming there).
    """

    def __init__(self, images: np.ndarray, masks: np.ndarray,
                 wire_cast: bool = False, indices=None):
        """``indices``: restrict residency to a SUBSET of samples (e.g. the
        validation fold, re-streamed every epoch by the reference protocol
        while train batches change — F4_TRAIN.py:96-180). ``batches()``
        then only accepts indices inside the subset (see ``covers``);
        global indices are remapped host-side to resident rows."""
        import jax
        import jax.numpy as jnp

        self._local = None
        if indices is not None:
            indices = np.asarray(indices)
            images, masks = images[indices], masks[indices]
            self._local = {int(g): i for i, g in enumerate(indices)}
        if wire_cast:
            b = wire_cast_batch(
                Batch(images, masks, np.ones((1,), np.float32)))
            images, masks = b.images, b.masks
        self.images = jax.device_put(images)
        self.masks = jax.device_put(masks)
        self.nbytes = images.nbytes + masks.nbytes

        def gather(im, ma, idx, valid):
            vi = valid.reshape((-1,) + (1,) * (im.ndim - 1))
            vm = valid.reshape((-1,) + (1,) * (ma.ndim - 1))
            gi = jnp.where(vi > 0, im[idx], jnp.zeros((), im.dtype))
            gm = jnp.where(vm > 0, ma[idx], jnp.zeros((), ma.dtype))
            return gi, gm

        self._gather = jax.jit(gather)

    @staticmethod
    def _masks_compressible(masks: np.ndarray) -> bool:
        """Whether ``wire_cast_batch`` will actually shrink these masks
        (f32 holding exactly-uint8 values -> u8). Mirrors its test,
        chunked so the check never allocates a full-set uint8 copy."""
        if masks.dtype != np.float32:
            return False
        flat = masks.reshape(-1)
        step = 1 << 24
        for i in range(0, flat.size, step):
            c = flat[i:i + step]
            if not (c.astype(np.uint8) == c).all():
                return False
        return True

    @staticmethod
    def fits(images: np.ndarray, masks: np.ndarray, wire_cast: bool,
             budget_bytes: float = None) -> bool:
        """Conservative placement check: the resident set must leave room
        for params/optimizer/ACTIVATIONS — and the full-depth MMVit4
        decoder's backward holds f32 gradients of (B,128,128,128,C)
        volumes, a multi-GB working set (measured: 6.3 GB resident +
        B=4 full-depth train step OOMs a 16 GB v5e; the tunnel backend
        reports no memory_stats to do better). Default budget 4 GB;
        raise via CORRIFNET_DEVICE_DATA_BUDGET_GB for lean models."""
        return DeviceDataset.fits_bytes(
            images.nbytes, masks.nbytes, wire_cast, budget_bytes,
            mask_compressible=(
                wire_cast and DeviceDataset._masks_compressible(masks)),
        )

    @staticmethod
    def fits_bytes(image_bytes: int, mask_bytes: int, wire_cast: bool,
                   budget_bytes: float = None,
                   mask_compressible: bool = False) -> bool:
        """``mask_compressible``: only count the 4x mask shrink when the
        caller has verified the masks really wire-cast to u8 — non-binary
        masks stay f32 and assuming compression would under-count the
        resident bytes (conservative default: no compression)."""
        if budget_bytes is None:
            # 5 GB: resident bytes + the B=4 full-depth step peak
            # (6.07 GB std / 5.16 lean — NOTES r4/r5 ladders) must stay
            # under the ~12 GB usable; 5 admits the reference protocol's
            # val+test folds (4.6 GB wire-cast), which the r4 default of 4
            # wrongly excluded. Raise for full-set residency experiments.
            budget_bytes = 1e9 * float(
                os.environ.get("CORRIFNET_DEVICE_DATA_BUDGET_GB", "5"))
        n = image_bytes + mask_bytes
        if wire_cast:
            n = image_bytes // 2 + (
                mask_bytes // 4 if mask_compressible else mask_bytes)
        return n <= budget_bytes

    def covers(self, indices) -> bool:
        """Whether every global index is resident (always True for a
        full-set dataset)."""
        if self._local is None:
            return True
        return all(int(i) in self._local for i in np.asarray(indices))

    def batches(self, indices, batch_size: int) -> Iterator[Batch]:
        """Fixed-shape padded device batches over ``indices`` in order —
        the `batch_iterator` contract, with the gather on device."""
        import jax.numpy as jnp

        indices = np.asarray(indices)
        if self._local is not None:
            indices = np.asarray(
                [self._local[int(i)] for i in indices], dtype=np.int64)
        n = len(indices)
        for start in range(0, n, batch_size):
            idx = indices[start : start + batch_size]
            b = len(idx)
            valid = np.ones((batch_size,), dtype=np.float32)
            if b < batch_size:
                idx = np.concatenate([idx, np.zeros((batch_size - b,), idx.dtype)])
                valid[b:] = 0.0
            im, ma = self._gather(
                self.images, self.masks, jnp.asarray(idx), jnp.asarray(valid)
            )
            yield Batch(im, ma, valid)


def device_prefetch(batches: Iterator[Batch], size: int = 2, sharding=None,
                    wire_cast: bool = False):
    """Overlap host->device transfer with compute: keep ``size`` batches
    in flight on device ahead of the consumer (the standard TPU input
    pipeline; jax transfers are async so enqueueing ahead suffices).

    ``sharding`` (e.g. ``parallel.batch_sharding(mesh)``) places each batch
    array across the mesh's data axis. ``wire_cast`` applies
    ``wire_cast_batch`` before the transfer (only when the consumer
    computes in bf16 — see that function's contract).
    """
    import collections

    import jax

    def put(b: Batch) -> Batch:
        if wire_cast:
            b = wire_cast_batch(b)
        if sharding is not None:
            return Batch(
                jax.device_put(b.images, sharding),
                jax.device_put(b.masks, sharding),
                jax.device_put(b.valid, sharding),
            )
        return Batch(
            jax.device_put(b.images), jax.device_put(b.masks), jax.device_put(b.valid)
        )

    queue = collections.deque()
    for b in batches:
        queue.append(put(b))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
