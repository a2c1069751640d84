"""Resize parity vs torch F.interpolate (the reference's two flavours)."""

import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.nn.resize import (
    adaptive_avg_pool,
    adaptive_max_pool,
    avg_pool,
    max_pool,
    resize_linear,
    resize_linear_depth_prefix,
    resize_nearest,
    resize_nearest_depth_prefix,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _t(x_ndhwc):
    """channels-last -> torch NCDHW"""
    return torch.from_numpy(np.moveaxis(x_ndhwc, -1, 1).copy())


def _j(t_ncdhw):
    return np.moveaxis(t_ncdhw.numpy(), 1, -1)


@pytest.fixture
def vol():
    rng = np.random.default_rng(0)
    return rng.normal(0, 1, (2, 3, 14, 14, 5)).astype(np.float32)


def test_trilinear_align_corners_matches_torch(vol):
    want = _j(F.interpolate(_t(vol), size=(8, 8, 8), mode="trilinear",
                            align_corners=True))
    got = np.asarray(resize_linear(jnp.asarray(vol), (8, 8, 8), True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_upscale_matches_torch(vol):
    want = _j(F.interpolate(_t(vol), scale_factor=2, mode="trilinear",
                            align_corners=True))
    got = np.asarray(resize_linear(jnp.asarray(vol), (6, 28, 28), True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_up_to_224_style_depth1(vol):
    """Output depth 1 with align_corners=True keeps source slice 0
    (mmvit4.py:263 up_to_224 quirk)."""
    want = _j(F.interpolate(_t(vol), size=(1, 20, 20), mode="trilinear",
                            align_corners=True))
    got = np.asarray(resize_linear(jnp.asarray(vol), (1, 20, 20), True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_matches_torch_default(vol):
    """Bare F.interpolate(x, size) defaults to nearest (mmvit4.py:271 etc.)."""
    want = _j(F.interpolate(_t(vol), size=(16, 16, 16)))
    got = np.asarray(resize_nearest(jnp.asarray(vol), (16, 16, 16)))
    np.testing.assert_array_equal(got, want)


def test_bilinear_2d_matches_torch():
    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (2, 10, 12, 3)).astype(np.float32)
    t = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    want = np.moveaxis(
        F.interpolate(t, size=(20, 24), mode="bilinear", align_corners=True).numpy(),
        1, -1,
    )
    got = np.asarray(resize_linear(jnp.asarray(img), (20, 24), True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_maxpool_matches_torch(vol):
    """The MMVit4 stem pool: MaxPool3d((1,3,3),(1,2,2),(0,1,1))."""
    want = _j(F.max_pool3d(_t(vol), (1, 3, 3), (1, 2, 2), (0, 1, 1)))
    got = np.asarray(max_pool(jnp.asarray(vol), (1, 3, 3), (1, 2, 2), (0, 1, 1)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_avgpool_matches_torch():
    rng = np.random.default_rng(2)
    img = rng.normal(0, 1, (2, 12, 12, 4)).astype(np.float32)
    t = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    want = np.moveaxis(F.avg_pool2d(t, 2, 2).numpy(), 1, -1)
    got = np.asarray(avg_pool(jnp.asarray(img), (2, 2), (2, 2)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_adaptive_pools_match_torch():
    """AdaptiveMax/AvgPool2d parity incl. output larger than input (the
    MultiSenseSeg PPM runs 7x7 -> 6x6 at 224 input)."""
    rng = np.random.default_rng(7)
    for (h, w), out in [((7, 7), (6, 6)), ((2, 2), (3, 3)), ((14, 10), (3, 6))]:
        x = rng.normal(0, 1, (2, h, w, 4)).astype(np.float32)
        t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        want_m = np.moveaxis(torch.nn.AdaptiveMaxPool2d(out)(t).numpy(), 1, -1)
        want_a = np.moveaxis(torch.nn.AdaptiveAvgPool2d(out)(t).numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(adaptive_max_pool(jnp.asarray(x), out)), want_m, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(adaptive_avg_pool(jnp.asarray(x), out)), want_a, atol=1e-6
        )


def test_depth_prefix_linear_is_exact():
    """Pruned-decoder depth-prefix trilinear == full resize, leading slices."""
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, (2, 14, 10, 10, 5)).astype(np.float32)
    full = np.asarray(resize_linear(jnp.asarray(v), (28, 20, 20), True))
    pre = np.asarray(
        resize_linear_depth_prefix(jnp.asarray(v), 14, 28, 5, (20, 20))
    )
    np.testing.assert_allclose(pre, full[:, :5], atol=1e-6)


def test_depth_prefix_linear_works_on_prefix_input():
    """The prefix op also accepts an already-pruned depth prefix as input
    when the requested rows only touch those slices."""
    rng = np.random.default_rng(4)
    v = rng.normal(0, 1, (1, 8, 6, 6, 2)).astype(np.float32)
    full = np.asarray(resize_linear(jnp.asarray(v), (16, 6, 6), True))
    pre = np.asarray(
        resize_linear_depth_prefix(jnp.asarray(v[:, :3]), 8, 16, 5, (6, 6))
    )
    np.testing.assert_allclose(pre, full[:, :5], atol=1e-6)


def test_depth_prefix_nearest_is_exact(vol):
    full = np.asarray(resize_nearest(jnp.asarray(vol), (64, 20, 20)))
    pre = np.asarray(
        resize_nearest_depth_prefix(jnp.asarray(vol), 64, 4, (20, 20))
    )
    np.testing.assert_array_equal(pre, full[:, :4])
