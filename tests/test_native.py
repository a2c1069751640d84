"""Native C++ data runtime: MAT v5 reader vs scipy, batcher vs Python path."""

import numpy as np
import pytest

from corrifnet_tpu.data import batch_iterator, synthetic_dstl
from corrifnet_tpu.data.native import NativeBatcher, load_mat, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no toolchain)"
)


def test_load_mat_matches_scipy(tmp_path):
    sio = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(0)
    arr = rng.normal(0, 1, (7, 5, 3)).astype(np.float64)
    path = tmp_path / "patch.mat"
    sio.savemat(path, {"inputPatch": arr})
    got = load_mat(path, "inputPatch")
    assert got is not None
    np.testing.assert_allclose(got, arr.astype(np.float32), rtol=1e-6)


def test_load_mat_uncompressed(tmp_path):
    sio = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(1)
    arr = (rng.random((4, 4)) * 255).astype(np.uint8)
    path = tmp_path / "u.mat"
    sio.savemat(path, {"inputPatch": arr}, do_compression=False)
    got = load_mat(path, "inputPatch")
    np.testing.assert_array_equal(got, arr.astype(np.float32))


def test_load_mat_compressed(tmp_path):
    sio = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(2)
    arr = rng.normal(0, 1, (16, 16, 20)).astype(np.float32)
    path = tmp_path / "c.mat"
    sio.savemat(path, {"inputPatch": arr}, do_compression=True)
    got = load_mat(path, "inputPatch")
    np.testing.assert_allclose(got, arr, rtol=1e-6)


def test_native_batcher_matches_python():
    d = synthetic_dstl(10, lim=16, seed=0)
    idx = np.arange(10)
    want = list(batch_iterator(d.images, d.masks, idx, 4))
    nb = NativeBatcher(d.images, d.masks, idx, 4)
    got = list(nb)
    nb.close()
    assert len(got) == len(want) == nb.n_batches
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.images, w.images)
        np.testing.assert_array_equal(g.masks, w.masks)
        np.testing.assert_array_equal(g.valid, w.valid)


def test_make_batches_uses_native_in_train_path():
    """make_batches (the train/eval loop batch source, train/loop.py) routes
    through the C++ batcher when the library is built, and its output is
    bit-identical to the Python fallback."""
    from corrifnet_tpu.data.dataset import make_batches
    from corrifnet_tpu.data.native import NativeBatcher as NB, native_available

    if not native_available():
        import pytest

        pytest.skip("native library not built")
    d = synthetic_dstl(7, lim=16, seed=1)
    idx = np.arange(7)  # ragged final batch (7 % 4 != 0)
    native = list(make_batches(d.images, d.masks, idx, 4, use_native=True))
    python = list(make_batches(d.images, d.masks, idx, 4, use_native=False))
    assert len(native) == len(python) == 2
    for g, w in zip(native, python):
        np.testing.assert_array_equal(g.images, w.images)
        np.testing.assert_array_equal(g.masks, w.masks)
        np.testing.assert_array_equal(g.valid, w.valid)
