"""DSTL multispectral data pipeline (reference: F8_IMAGES4.py).

The reference loads per-patch MATLAB ``.mat`` files from three hard-coded
Windows directories (F8_IMAGES4.py:20-32): ``RGBs`` (224x224x3 patches under
key ``inputPatch``), ``all20Ch`` (224x224x20 cubes) and ``class06_mats``
(building-class masks). It slices the 20-channel cube into NIR (ch 9-11) and
SWIR (ch 12-14) 3-channel modalities (F8_IMAGES4.py:41-50), moves channels
to NCHW, subtracts per-channel means computed on the *training fold only*
(F8_IMAGES4.py:60-79), stacks the three modalities into a 5-D tensor
``(N, 3, 3, 224, 224)`` and replicates masks x3 along the modality axis
(F8_IMAGES4.py:87-88).

This module reimplements that contract with a TPU-friendly shape:

  * host arrays are float32 numpy, images ``(N, M=3, C=3, H, W)`` and masks
    ``(N, M=3, 1, H, W)`` — identical to the reference so split/metric
    parity holds;
  * an on-disk ``.npz`` pack (one mmap-able file instead of ~18k tiny .mat
    reads) produced once by :func:`pack_mat_directory`;
  * a synthetic generator with the same shapes/dtypes so the full stack is
    testable without the DSTL files (whose paths are absent here).

NIR/SWIR channel indices: F8_IMAGES4.py:41-47 takes channels 9,10,11 and
12,13,14 of the 20-channel cube.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "DstlArrays",
    "load_dstl",
    "synthetic_dstl",
    "normalize_per_fold",
    "pack_mat_directory",
    "load_pack",
]

LIM = 224  # patch side (F8_IMAGES4.py:39)
NIR_CHANNELS = (9, 10, 11)  # F8_IMAGES4.py:41-43
SWIR_CHANNELS = (12, 13, 14)  # F8_IMAGES4.py:45-47


@dataclasses.dataclass
class DstlArrays:
    """Preloaded host-side dataset, reference-shaped.

    images: (N, 3 modalities, 3 channels, H, W) float32, mean-subtracted
    masks:  (N, 3, 1, H, W) float32 in {0, 1}
    tr_mean_r/g/b: training-fold RGB means (returned by the reference for
        un-normalization in segplot, F8_IMAGES4.py:95)
    """

    images: np.ndarray
    masks: np.ndarray
    tr_mean_r: float
    tr_mean_g: float
    tr_mean_b: float


def normalize_per_fold(
    rgb: np.ndarray, nir: np.ndarray, swir: np.ndarray, masks: np.ndarray,
    trind: np.ndarray,
) -> DstlArrays:
    """Apply the reference's train-fold mean subtraction + stacking.

    Inputs are NCHW per modality: (N, 3, H, W); masks (N, 1, H, W).
    Mirrors F8_IMAGES4.py:60-88.
    """
    rgb = np.ascontiguousarray(rgb, dtype=np.float32)
    nir = np.ascontiguousarray(nir, dtype=np.float32)
    swir = np.ascontiguousarray(swir, dtype=np.float32)
    masks = np.ascontiguousarray(masks, dtype=np.float32)

    means = []
    for arr in (rgb, nir, swir):
        for c in range(3):
            m = arr[trind, c, :, :].mean()
            arr[:, c, :, :] -= m
            means.append(float(m))

    images = np.stack([rgb, nir, swir], axis=1)  # (N, 3, 3, H, W)
    masks5 = np.repeat(masks[:, None], 3, axis=1)  # (N, 3, 1, H, W)
    return DstlArrays(images, masks5, means[0], means[1], means[2])


def synthetic_dstl(
    n: int,
    trind: Optional[np.ndarray] = None,
    lim: int = LIM,
    seed: int = 0,
) -> DstlArrays:
    """Synthetic data with DSTL shapes/dtypes and spatially-correlated masks.

    Masks are unions of random rectangles (so soft-Jaccard is a meaningful
    target) and some patches are all-background (exercising the Jaccard2
    inversion, F5_JACCARD2.py:12-14). Images correlate with the masks so a
    model can actually fit them in integration tests.
    """
    rng = np.random.default_rng(seed)
    if trind is None:
        trind = np.arange(n)

    masks = np.zeros((n, 1, lim, lim), dtype=np.float32)
    for i in range(n):
        for _ in range(int(rng.integers(0, 4))):  # 0 rects => all-background
            h = int(rng.integers(lim // 8, lim // 2))
            w = int(rng.integers(lim // 8, lim // 2))
            y0 = int(rng.integers(0, lim - h))
            x0 = int(rng.integers(0, lim - w))
            masks[i, 0, y0 : y0 + h, x0 : x0 + w] = 1.0

    def modality(scale):
        base = rng.normal(0.0, 1.0, size=(n, 3, lim, lim)).astype(np.float32)
        return base + scale * masks  # signal correlated with the mask

    rgb, nir, swir = modality(2.0), modality(1.5), modality(1.0)
    return normalize_per_fold(rgb, nir, swir, masks, trind)


def _load_one_mat(path: str, key: str = "inputPatch"):
    """Read one .mat array, preferring the native C++ MAT v5 reader
    (corrifnet_tpu.data.native, the reference's disk hot spot
    F8_IMAGES4.py:20-34); falls back to scipy."""
    try:
        from corrifnet_tpu.data.native import load_mat, native_available

        use_native = native_available()
    except Exception:
        use_native = False
    arr = load_mat(path, key) if use_native else None
    if arr is None:
        import scipy.io as sio

        arr = sio.loadmat(path, verify_compressed_data_integrity=False)[key]
    return arr


def _load_mat_dir(directory: str, limit: int, key: str = "inputPatch",
                  names=None):
    """Read up to ``limit`` .mat files from a dir.

    When ``names`` is given, exactly those files are loaded (missing
    counterparts raise) — the reference pairs masks with RGB patches by
    filename (``class06_mats/{rgb_name}``, F8_IMAGES4.py:26), so pairing by
    independent sorted listings would silently misalign the dataset if one
    directory had an extra or missing file."""
    if names is None:
        names = sorted(os.listdir(directory))[:limit]
    arrays = []
    for name in names:
        path = os.path.join(directory, name)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"counterpart file {name!r} missing from {directory} — "
                "RGB/cube/mask directories must share filenames"
            )
        arrays.append(_load_one_mat(path, key))
    return names, np.asarray(arrays, dtype=np.float32)


def pack_mat_directory(
    rgb_dir: str, all20_dir: str, mask_dir: str, out_path: str, limit: int
) -> Path:
    """One-time conversion of the reference's .mat layout into a single .npz.

    Replaces the per-run ~3x``trainSetSize`` scipy loads (the disk-I/O hot
    spot at F8_IMAGES4.py:20-34) with one compressed pack.
    """
    names, rgb_hwc = _load_mat_dir(rgb_dir, limit)
    _, cube = _load_mat_dir(all20_dir, limit, names=names)
    _, mask_hw = _load_mat_dir(mask_dir, limit, names=names)

    nir = cube[..., list(NIR_CHANNELS)]
    swir = cube[..., list(SWIR_CHANNELS)]
    out = Path(out_path)
    np.savez_compressed(
        out,
        rgb=np.moveaxis(rgb_hwc, 3, 1),
        nir=np.moveaxis(nir, 3, 1),
        swir=np.moveaxis(swir, 3, 1),
        masks=mask_hw.reshape(len(names), 1, LIM, LIM),
        names=np.asarray(names),
    )
    return out


def load_pack(pack_path: str, trind: np.ndarray, limit: Optional[int] = None) -> DstlArrays:
    """Load a pack produced by :func:`pack_mat_directory` and normalize."""
    z = np.load(pack_path, allow_pickle=False)
    sl = slice(None, limit)
    return normalize_per_fold(z["rgb"][sl], z["nir"][sl], z["swir"][sl], z["masks"][sl], trind)


def load_dstl(
    train_set_size: int,
    trind: np.ndarray,
    rgb_dir: Optional[str] = None,
    all20_dir: Optional[str] = None,
    mask_dir: Optional[str] = None,
    pack_path: Optional[str] = None,
    synthetic_seed: Optional[int] = None,
) -> DstlArrays:
    """``get_images4`` equivalent (F8_IMAGES4.py:11-95).

    Resolution order: explicit pack file -> raw .mat directories ->
    synthetic fallback (when ``synthetic_seed`` is given). The reference's
    hard-coded ``C:/Users/Public/Server/data/DSTL`` paths become arguments.
    """
    if pack_path and Path(pack_path).exists():
        return load_pack(pack_path, trind, limit=train_set_size)
    if rgb_dir and os.path.isdir(rgb_dir):
        names, rgb = _load_mat_dir(rgb_dir, train_set_size)
        _, cube = _load_mat_dir(all20_dir, train_set_size, names=names)
        _, mask = _load_mat_dir(mask_dir, train_set_size, names=names)
        nir = cube[..., list(NIR_CHANNELS)]
        swir = cube[..., list(SWIR_CHANNELS)]
        return normalize_per_fold(
            np.moveaxis(rgb, 3, 1),
            np.moveaxis(nir, 3, 1),
            np.moveaxis(swir, 3, 1),
            mask.reshape(train_set_size, 1, LIM, LIM),
            trind,
        )
    if synthetic_seed is not None:
        return synthetic_dstl(train_set_size, trind, seed=synthetic_seed)
    raise FileNotFoundError(
        "No DSTL source found: pass pack_path, .mat directories, or "
        "synthetic_seed for generated data."
    )
