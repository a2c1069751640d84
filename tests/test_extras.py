"""Orphan-library blocks (extras): shape contracts + basic semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from corrifnet_tpu.models.extras import (
    Bag,
    BasicBlock2d,
    Bottleneck2d,
    CrossAttention,
    CrossAttentionBlock,
    DAPPM,
    PagFM,
    SegmentHead,
)


def _init_apply(mod, *args, **kw):
    variables = mod.init({"params": jax.random.PRNGKey(0)}, *args, **kw)
    return mod.apply(variables, *args, **kw)


def test_basicblock_and_bottleneck():
    x = jnp.ones((2, 8, 8, 16))
    out = _init_apply(BasicBlock2d(planes=32, stride=2), x, False)
    assert out.shape == (2, 4, 4, 32)
    out = _init_apply(Bottleneck2d(planes=16), x, False)
    assert out.shape == (2, 8, 8, 32)  # expansion 2


def test_segmenthead_scaleup():
    x = jnp.ones((1, 8, 8, 32))
    out = _init_apply(SegmentHead(interplanes=16, outplanes=2, scale_factor=4), x, False)
    assert out.shape == (1, 32, 32, 2)


def test_dappm():
    x = jnp.ones((1, 32, 32, 64))
    out = _init_apply(DAPPM(branch_planes=24, outplanes=64), x, False)
    assert out.shape == (1, 32, 32, 64)


def test_pagfm_blends_between_inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
    out = _init_apply(PagFM(mid_channels=4), x, y, False)
    assert out.shape == x.shape
    # output is a convex blend of x and upsampled y -> bounded by their range
    assert float(jnp.abs(out).max()) < float(jnp.abs(x).max() + jnp.abs(y).max())


def test_bag():
    x = jnp.ones((1, 8, 8, 16))
    out = _init_apply(Bag(out_channels=16), x, x * 2, x * 0.5, False)
    assert out.shape == (1, 8, 8, 16)


def test_cross_attention_outputs_cls_token():
    x = jnp.ones((2, 10, 32))
    out = _init_apply(CrossAttention(dim=32, num_heads=4), x)
    assert out.shape == (2, 1, 32)
    out = _init_apply(CrossAttentionBlock(dim=32, num_heads=4), x)
    assert out.shape == (2, 1, 32)
