"""ctypes bindings for the C++ data runtime (native/corrifnet_native.cc).

Provides drop-in accelerated variants of the Python data path:
  * :func:`load_mat` — MAT v5 reader (replaces scipy.io.loadmat for the
    DSTL 'inputPatch' arrays, the reference's disk hot spot
    F8_IMAGES4.py:20-34);
  * :class:`NativeBatcher` — double-buffered threaded batch assembly
    (gather + pad), overlapping host batch prep with device compute.

The shared library is built on demand (``make -C native``); every entry
point degrades gracefully to the pure-Python implementation when the
library is unavailable, so nothing here is a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["native_available", "build_native", "load_mat", "NativeBatcher"]

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "libcorrifnet_native.so"
_lib = None


def build_native(quiet: bool = True) -> bool:
    """Compile the shared library if a toolchain is available."""
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.cif_load_mat.restype = ctypes.c_int
    lib.cif_load_mat.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
    ]
    lib.cif_free.argtypes = [ctypes.c_void_p]
    lib.cif_batcher_create.restype = ctypes.c_void_p
    lib.cif_batcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
    ]
    lib.cif_batcher_next.restype = ctypes.c_int64
    lib.cif_batcher_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.cif_batcher_num_batches.restype = ctypes.c_int64
    lib.cif_batcher_num_batches.argtypes = [ctypes.c_void_p]
    lib.cif_batcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_mat(path: str, varname: str = "inputPatch") -> Optional[np.ndarray]:
    """Load a MAT v5 numeric array as float32; None if unavailable/failed."""
    lib = _load_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    dims = (ctypes.c_int64 * 8)()
    ndims = ctypes.c_int()
    rc = lib.cif_load_mat(
        str(path).encode(), varname.encode(), ctypes.byref(out), dims,
        ctypes.byref(ndims),
    )
    if rc != 0:
        return None
    shape = tuple(dims[i] for i in range(ndims.value))
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(out, shape=(n,)).reshape(shape).copy()
    lib.cif_free(out)
    return arr


class NativeBatcher:
    """Threaded batch assembly over preloaded arrays, reference iteration
    order (shuffle=False), padded final batch + validity mask."""

    def __init__(self, images: np.ndarray, masks: np.ndarray,
                 indices: np.ndarray, batch_size: int, n_buffers: int = 2):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.images = np.ascontiguousarray(images, np.float32)
        self.masks = np.ascontiguousarray(masks, np.float32)
        self.indices = np.ascontiguousarray(indices, np.int64)
        self.batch_size = batch_size
        self.img_shape = (batch_size, *images.shape[1:])
        self.msk_shape = (batch_size, *masks.shape[1:])
        spf_img = int(np.prod(images.shape[1:]))
        spf_msk = int(np.prod(masks.shape[1:]))
        self._handle = lib.cif_batcher_create(
            self.images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.masks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self.indices), spf_img, spf_msk, batch_size, n_buffers,
        )
        self.n_batches = lib.cif_batcher_num_batches(self._handle)

    def __iter__(self):
        from corrifnet_tpu.data.dataset import Batch

        img = np.empty(self.img_shape, np.float32)
        msk = np.empty(self.msk_shape, np.float32)
        valid = np.empty((self.batch_size,), np.float32)
        while True:
            rc = self._lib.cif_batcher_next(
                self._handle,
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                msk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc < 0:
                break
            yield Batch(img.copy(), msk.copy(), valid.copy())

    def close(self):
        if self._handle:
            self._lib.cif_batcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
