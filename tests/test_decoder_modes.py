"""Decoder depth modes: structural equivalence of the pruned fast path.

The pruned decoder's convolutions and interpolations are EXACT restrictions
of the full computation (tested op-level in test_resize); the only
divergence is InstanceNorm statistics (full depth vs prefix). This test
quantifies that: with the normalization removed from the comparison (same
params, slice-0 outputs), pruned and full must track closely — and both
must produce valid probability maps.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.models.decoder import DecoderFuse


@pytest.mark.skipif(
    os.environ.get("CORRIFNET_SLOW_TESTS", "0") != "1",
    reason="full-depth decoder on 1 CPU core is slow; set CORRIFNET_SLOW_TESTS=1",
)
def test_pruned_vs_full_decoder_divergence_bounded():
    rng = np.random.default_rng(0)
    b = 1
    x1 = jnp.asarray(rng.normal(0, 1, (b, 3, 56, 56, 24)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(0, 1, (b, 3, 56, 56, 48)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(0, 1, (b, 3, 28, 28, 96)).astype(np.float32))
    x4 = jnp.asarray(rng.normal(0, 1, (b, 3, 14, 14, 192)).astype(np.float32))
    x5 = jnp.asarray(rng.normal(0, 1, (b, 8, 8, 8, 192)).astype(np.float32))

    full = DecoderFuse(depth_mode="full")
    pruned = DecoderFuse(depth_mode="pruned")
    v = full.init(jax.random.PRNGKey(0), x1, x2, x3, x4, x5, False)
    out_full = np.asarray(full.apply(v, x1, x2, x3, x4, x5, False))
    out_pruned = np.asarray(pruned.apply(v, x1, x2, x3, x4, x5, False))
    assert out_full.shape == out_pruned.shape == (b, 3, 1, 224, 224)
    assert np.isfinite(out_full).all() and np.isfinite(out_pruned).all()
    assert 0 <= out_pruned.min() and out_pruned.max() <= 1
    # the IN-statistics divergence is bounded: outputs correlate strongly
    corr = np.corrcoef(out_full.ravel(), out_pruned.ravel())[0, 1]
    assert corr > 0.8, corr


def test_pruned_decoder_shapes_small():
    """Cheap CPU check: pruned decoder produces the reference output layout."""
    rng = np.random.default_rng(1)
    b = 1
    args = [
        jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
        for s in [(b, 3, 16, 16, 24), (b, 3, 16, 16, 48), (b, 3, 8, 8, 96),
                  (b, 3, 4, 4, 192), (b, 8, 8, 8, 192)]
    ]
    dec = DecoderFuse(depth_mode="pruned")
    v = dec.init(jax.random.PRNGKey(0), *args, False)
    out = dec.apply(v, *args, False)
    assert out.shape == (b, 3, 1, 224, 224)


def test_remat_convs_is_transparent_small():
    """fnn.remat(GeneralConv3d) (DecoderFuse.remat_convs) must be invisible:
    same param tree, bit-equal forward and gradients (small-shape probe of
    the exact wrapping used in the decoder, incl. a depth-fuse call)."""
    from flax import linen as fnn

    from corrifnet_tpu.nn.conv import GeneralConv3d

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 8, 8, 6)).astype(np.float32)
    )

    class Chain(fnn.Module):
        remat: bool = False

        @fnn.compact
        def __call__(self, x, train=True):
            cls = (
                fnn.remat(GeneralConv3d, static_argnums=(2, 3))
                if self.remat else GeneralConv3d
            )
            x = cls(8, 3, 1, 1, pad_mode="replicate", name="c1")(x, train, None)
            x = cls(8, 3, 1, 1, pad_mode="replicate", name="c2")(
                x, train, ("linear", 8)
            )
            return x

    p0 = Chain(False).init(jax.random.PRNGKey(0), x)
    p1 = Chain(True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_array_equal(
        np.asarray(Chain(False).apply(p0, x)), np.asarray(Chain(True).apply(p1, x))
    )
    g0 = jax.jit(jax.grad(lambda p: Chain(False).apply(p, x).sum()))(p0)
    g1 = jax.jit(jax.grad(lambda p: Chain(True).apply(p, x).sum()))(p1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_convs_param_tree_stable_full_scale():
    """remat_convs must not move a single decoder param path (checkpoint
    compatibility) — checked shape-level via eval_shape (no compute)."""
    rng = np.random.default_rng(0)
    b = 1
    args = [
        jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
        for s in [(b, 3, 56, 56, 24), (b, 3, 56, 56, 48), (b, 3, 28, 28, 96),
                  (b, 3, 14, 14, 192), (b, 8, 8, 8, 192)]
    ]
    key = jax.random.PRNGKey(0)
    base = jax.eval_shape(
        DecoderFuse(depth_mode="full").init, key, *args, False)
    remat = jax.eval_shape(
        DecoderFuse(depth_mode="full", remat_convs=True).init, key, *args, False)
    assert jax.tree_util.tree_structure(base) == jax.tree_util.tree_structure(remat)
    assert [(l.shape, l.dtype) for l in jax.tree.leaves(base)] == [
        (l.shape, l.dtype) for l in jax.tree.leaves(remat)
    ]


@pytest.mark.skipif(
    os.environ.get("CORRIFNET_SLOW_TESTS", "0") != "1",
    reason="full-depth decoder grads on 1 CPU core are slow",
)
def test_remat_convs_grads_bit_equal_full_scale():
    rng = np.random.default_rng(0)
    b = 1
    args = [
        jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
        for s in [(b, 3, 56, 56, 24), (b, 3, 56, 56, 48), (b, 3, 28, 28, 96),
                  (b, 3, 14, 14, 192), (b, 8, 8, 8, 192)]
    ]
    base = DecoderFuse(depth_mode="full")
    remat = DecoderFuse(depth_mode="full", remat_convs=True)
    v = base.init(jax.random.PRNGKey(0), *args, False)
    g0 = jax.grad(lambda p: base.apply(p, *args, False).sum())(v)
    g1 = jax.grad(lambda p: remat.apply(p, *args, False).sum())(v)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
