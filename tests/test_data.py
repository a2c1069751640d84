"""Data pipeline tests: CrossVal determinism vs committed split files,
normalization semantics, batching with padded final batch."""

from pathlib import Path

import numpy as np

from corrifnet_tpu.data import (
    batch_iterator,
    cross_val,
    load_permutation,
    normalize_per_fold,
    num_batches,
    synthetic_dstl,
    write_permutation,
)

SPLITS = Path(__file__).resolve().parent.parent / "corrifnet_tpu" / "data" / "splits"


def test_crossval_matches_committed_split():
    """cross_val must reproduce the committed trind/tsind/vlind.txt exactly.

    The committed split corresponds to fold number 2 (1-based), verified by
    exhaustive search over (fno, valsize) combinations.
    """
    tsind, trind, vlind = cross_val(5985, 2, 5)
    want_tr = np.loadtxt(SPLITS / "trind.txt", dtype=np.int64)
    want_ts = np.loadtxt(SPLITS / "tsind.txt", dtype=np.int64)
    want_vl = np.loadtxt(SPLITS / "vlind.txt", dtype=np.int64)
    np.testing.assert_array_equal(trind, want_tr)
    np.testing.assert_array_equal(tsind, want_ts)
    np.testing.assert_array_equal(vlind, want_vl)


def test_crossval_sizes_and_disjointness():
    tsind, trind, vlind = cross_val(5985, 2, 5)
    assert len(trind) == 4310 and len(tsind) == 1197 and len(vlind) == 478
    all_idx = np.concatenate([tsind, trind, vlind])
    assert len(np.unique(all_idx)) == 5985


def test_crossval_folds_cover_everything():
    perm = load_permutation(5985)
    covered = []
    for fno in range(1, 6):
        tsind, _, _ = cross_val(5985, fno, 5)
        covered.append(tsind)
    covered = np.concatenate(covered)
    np.testing.assert_array_equal(np.sort(covered), np.arange(5985))
    assert set(perm.tolist()) == set(range(5985))


def test_write_permutation_roundtrip(tmp_path):
    write_permutation(100, tmp_path, seed=7)
    perm = load_permutation(100, search_dirs=[tmp_path])
    assert sorted(perm.tolist()) == list(range(100))


def test_normalize_per_fold_means():
    """Train-fold channel means must be subtracted from ALL samples
    (F8_IMAGES4.py:60-79) and the RGB means returned."""
    rng = np.random.default_rng(0)
    n, lim = 8, 16
    rgb = rng.normal(5.0, 1.0, (n, 3, lim, lim)).astype(np.float32)
    nir = rng.normal(-2.0, 1.0, (n, 3, lim, lim)).astype(np.float32)
    swir = rng.normal(1.0, 1.0, (n, 3, lim, lim)).astype(np.float32)
    masks = (rng.random((n, 1, lim, lim)) > 0.5).astype(np.float32)
    trind = np.array([0, 2, 4])
    want_mean_r = rgb[trind, 0].mean()
    d = normalize_per_fold(rgb.copy(), nir, swir, masks, trind)
    assert d.images.shape == (n, 3, 3, lim, lim)
    assert d.masks.shape == (n, 3, 1, lim, lim)
    np.testing.assert_allclose(d.tr_mean_r, want_mean_r, rtol=1e-6)
    # train-fold mean of normalized channel ~ 0
    np.testing.assert_allclose(d.images[trind, 0, 0].mean(), 0.0, atol=1e-5)
    # masks replicated along modality axis
    np.testing.assert_array_equal(d.masks[:, 0], d.masks[:, 2])


def test_synthetic_shapes_and_allbackground_cases():
    d = synthetic_dstl(12, lim=32, seed=0)
    assert d.images.shape == (12, 3, 3, 32, 32)
    assert d.masks.shape == (12, 3, 1, 32, 32)
    per_patch = d.masks[:, 0, 0].reshape(12, -1).sum(1)
    assert (per_patch == 0).any(), "need all-background patches for Jaccard2"


def test_batch_iterator_padding():
    d = synthetic_dstl(10, lim=16, seed=1)
    idx = np.arange(10)
    batches = list(batch_iterator(d.images, d.masks, idx, batch_size=4))
    assert len(batches) == num_batches(10, 4) == 3
    assert all(b.images.shape[0] == 4 for b in batches)
    np.testing.assert_array_equal(batches[-1].valid, [1, 1, 0, 0])
    # padded region is zeros
    assert batches[-1].images[2:].sum() == 0.0
    # order is deterministic (shuffle=False semantics)
    np.testing.assert_array_equal(batches[0].images[0], d.images[0])
