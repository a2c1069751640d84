"""Segplot HSV composite math vs the reference formulas (F11_SEGPLOT.py:40-54)."""

import numpy as np

from corrifnet_tpu.run.segplot import hsv_to_rgb, segplot, segplot_blackwhite


def test_hsv_to_rgb_matches_colorsys():
    import colorsys

    rng = np.random.default_rng(0)
    hsv = rng.random((50, 3))
    got = hsv_to_rgb(hsv[:, 0], hsv[:, 1], hsv[:, 2])
    for i in range(50):
        want = colorsys.hsv_to_rgb(*hsv[i])
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_segplot_writes_all_files(tmp_path):
    rng = np.random.default_rng(1)
    lim = 32
    image = rng.normal(0, 1, (lim, lim, 3)).astype(np.float32)
    pred = rng.random((lim, lim)).astype(np.float32)
    gt = (rng.random((lim, lim)) > 0.5).astype(np.float32)
    segplot(tmp_path, lim, image, pred, gt, 0.5, 0.4, 0.3)
    for name in [
        "segmentation_image.png", "test_image.png", "test_image_R.png",
        "test_image_G.png", "test_image_B.png", "test_pred_mask.png",
        "ground_truth_mask.png",
    ]:
        p = tmp_path / name
        assert p.exists() and p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n", name


def test_segplot_blackwhite(tmp_path):
    rng = np.random.default_rng(2)
    lim = 16
    image = rng.normal(0, 1, (lim, lim, 3)).astype(np.float32)
    pred = rng.random((lim, lim)).astype(np.float32)
    gt = (rng.random((lim, lim)) > 0.5).astype(np.float32)
    segplot_blackwhite(tmp_path, lim, image, pred, gt, 0, 0, 0, indx=3)
    assert (tmp_path / "segmentation_bw_3.png").exists()


def test_composite_formula():
    """value = img/4 + pred/2 + gt/4; saturation = min(gt+pred, 1);
    hue = 0.75 - gt/2 (F11_SEGPLOT.py:40-48)."""
    from corrifnet_tpu.run.segplot import _composite

    img_r = np.full((4, 4), 0.8, np.float32)
    pred = np.full((4, 4), 1.0, np.float32)
    gt = np.zeros((4, 4), np.float32)
    rgb = _composite(img_r, pred, gt)
    want = hsv_to_rgb(
        np.full((4, 4), 0.75), np.ones((4, 4)), np.full((4, 4), 0.8 / 4 + 0.5)
    )
    np.testing.assert_allclose(rgb, want, atol=1e-6)
