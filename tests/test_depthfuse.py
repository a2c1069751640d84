"""Depth-fusion fast path (nn/depthfuse.py): exactness vs the naive
resize-then-conv computation, at the nn level (always) and for the whole
full-depth decoder (slow, gated).

The fused path is the full-mode decoder default (DecoderFuse.fuse_depth);
these tests pin that it is the SAME function as resize+conv — forward and
gradients — so the torch-parity suites (which compare against the actual
reference) transfer to it unchanged.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.nn.conv import Conv
from corrifnet_tpu.nn.resize import resize_linear, resize_nearest


@pytest.mark.parametrize("pad_mode", ["replicate", "zeros"])
def test_fused_linear_up_matches_resize_conv(pad_mode):
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(0, 1, (2, 8, 10, 11, 6)).astype(np.float32))
    m = Conv(4, (3, 3, 3), 1, (1, 1, 1), pad_mode=pad_mode)
    zfine = resize_linear(z, (16, 10, 11), align_corners=True)
    v = m.init(jax.random.PRNGKey(0), zfine)

    def fused(v, z):
        return m.apply(v, z, depth_fuse=("linear", 16))

    def naive(v, z):
        return m.apply(v, resize_linear(z, (16, 10, 11), align_corners=True))

    got, want = fused(v, z), naive(v, z)
    assert got.shape == want.shape == (2, 16, 10, 11, 4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
    )
    # gradients (params AND input) must match too
    gf = jax.grad(lambda v, z: (fused(v, z) ** 2).mean(), argnums=(0, 1))(v, z)
    gn = jax.grad(lambda v, z: (naive(v, z) ** 2).mean(), argnums=(0, 1))(v, z)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-3
        ),
        gf, gn,
    )


@pytest.mark.parametrize("pad_mode", ["replicate", "zeros"])
def test_fused_nearest_skip_concat_matches_resize_concat_conv(pad_mode):
    rng = np.random.default_rng(5)
    skip = jnp.asarray(rng.normal(0, 1, (2, 3, 10, 11, 5)).astype(np.float32))
    run = jnp.asarray(rng.normal(0, 1, (2, 16, 10, 11, 7)).astype(np.float32))
    m = Conv(4, (3, 3, 3), 1, (1, 1, 1), pad_mode=pad_mode)

    def naive(v, skip, run):
        x = jnp.concatenate(
            [resize_nearest(skip, (16, 10, 11)), run], axis=-1
        )
        return m.apply(v, x)

    def fused(v, skip, run):
        return m.apply(v, (skip, run), depth_fuse=("nearest", 16))

    xcat = jnp.concatenate([resize_nearest(skip, (16, 10, 11)), run], axis=-1)
    v = m.init(jax.random.PRNGKey(1), xcat)
    got, want = fused(v, skip, run), naive(v, skip, run)
    assert got.shape == want.shape == (2, 16, 10, 11, 4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
    )
    gf = jax.grad(
        lambda v, s, r: (fused(v, s, r) ** 2).mean(), argnums=(0, 1, 2)
    )(v, skip, run)
    gn = jax.grad(
        lambda v, s, r: (naive(v, s, r) ** 2).mean(), argnums=(0, 1, 2)
    )(v, skip, run)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-3
        ),
        gf, gn,
    )


def test_tap_expand_tables_match_resize_semantics():
    """Every (src, dst) pair the decoder uses must reproduce the resize
    matrices row-for-row under the tap index clamp."""
    from corrifnet_tpu.nn.depthfuse import tap_expand_table
    from corrifnet_tpu.nn.resize import _linear_matrix, _nearest_matrix

    for src, dst in [(8, 16), (16, 32), (32, 64), (64, 128)]:
        m = tap_expand_table("linear", src, dst)
        a = _linear_matrix(src, dst, True)
        for t in range(3):
            rows = np.clip(np.arange(dst) + t - 1, 0, dst - 1)
            np.testing.assert_array_equal(m[:, t, :], a[rows])
    for dst in (16, 32, 64, 128):
        m = tap_expand_table("nearest", 3, dst)
        a = _nearest_matrix(3, dst)
        for t in range(3):
            rows = np.clip(np.arange(dst) + t - 1, 0, dst - 1)
            np.testing.assert_array_equal(m[:, t, :], a[rows])


@pytest.mark.skipif(
    os.environ.get("CORRIFNET_SLOW_TESTS", "0") != "1",
    reason="full-depth decoder on 1 CPU core is slow; set CORRIFNET_SLOW_TESTS=1",
)
def test_decoder_fused_matches_naive_full_depth():
    """Whole-decoder wiring check at the real cascade sizes: fuse_depth
    on/off are the same function of the same params."""
    from corrifnet_tpu.models.decoder import DecoderFuse

    rng = np.random.default_rng(0)
    b = 1
    args = [
        jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
        for s in [(b, 3, 56, 56, 24), (b, 3, 56, 56, 48), (b, 3, 28, 28, 96),
                  (b, 3, 14, 14, 192), (b, 8, 8, 8, 192)]
    ]
    fused = DecoderFuse(depth_mode="full", fuse_depth=True)
    naive = DecoderFuse(depth_mode="full", fuse_depth=False)
    v = fused.init(jax.random.PRNGKey(0), *args, False)
    out_f = np.asarray(fused.apply(v, *args, False))
    out_n = np.asarray(naive.apply(v, *args, False))
    np.testing.assert_allclose(out_f, out_n, atol=1e-4, rtol=1e-3)
