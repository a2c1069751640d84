"""Fused ReLU+InstanceNorm kernel (interpret mode) vs XLA path + torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import corrifnet_tpu.ops.instancenorm as in_mod
from corrifnet_tpu.ops import relu_instancenorm, relu_instancenorm_xla


def _vol(shape, seed=0):
    return np.random.default_rng(seed).normal(0, 1, shape).astype(np.float32)


def test_xla_path_matches_torch():
    torch = pytest.importorskip("torch")
    x = _vol((2, 3, 5, 5, 6))
    got = np.asarray(relu_instancenorm_xla(jnp.asarray(x)))
    t = torch.relu(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    want = torch.nn.InstanceNorm3d(6)(t).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_kernel_matches_xla_interpret():
    x = jnp.asarray(_vol((2, 2, 8, 8, 128), seed=1))
    in_mod.INTERPRET = True
    try:
        got = relu_instancenorm(x)
    finally:
        in_mod.INTERPRET = False
    want = relu_instancenorm_xla(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kernel_grads_match_xla():
    x = jnp.asarray(_vol((1, 2, 4, 4, 128), seed=2))

    def loss_k(x):
        return (relu_instancenorm(x) ** 3).sum()

    def loss_x(x):
        return (relu_instancenorm_xla(x) ** 3).sum()

    in_mod.INTERPRET = True
    try:
        gk = jax.grad(loss_k)(x)
    finally:
        in_mod.INTERPRET = False
    gx = jax.grad(loss_x)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-4)


def test_general_conv3d_epilogue_flag_matches_default():
    """On CPU the flag transparently routes to XLA — identical outputs."""
    from corrifnet_tpu.nn import GeneralConv3d

    x = jnp.asarray(_vol((1, 3, 6, 6, 4), seed=3))
    m1 = GeneralConv3d(8, 3, 1, 1)
    m2 = GeneralConv3d(8, 3, 1, 1, use_pallas_epilogue=True)
    v = m1.init(jax.random.PRNGKey(0), x)
    out1 = m1.apply(v, x)
    out2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_kernel_multi_channel_tile_partial_final():
    """Force the (B, n_tiles>1) grid with a PARTIAL final channel tile —
    the production pruned-decoder slab shape class that single-tile tests
    never reach (c=24 at n=65536 -> ct=16, 2 tiles, rows 16..23 + pad)."""
    c, spatial = 24, (256, 256)
    n = spatial[0] * spatial[1]
    ct = in_mod._channel_tile(c, n)
    assert 0 < ct < c, f"shape must exercise multi-tile, got ct={ct}"
    x = jnp.asarray(_vol((1, 1) + spatial + (c,), seed=5))
    in_mod.INTERPRET = True
    try:
        got = relu_instancenorm(x)
    finally:
        in_mod.INTERPRET = False
    want = relu_instancenorm_xla(x)
    # atol 1e-4: f32 reduction-order noise over 65536-element spatial sums
    # (measured max ~2.3e-5, uniform across channels/tiles)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
