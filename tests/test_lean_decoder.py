"""Lean-residual decoder chaining (nn/leandec.py, VERDICT r4 #2).

Contract: the lean cascade is a pure backward-memory restructure —
  * parameter tree identical to the standard chain (checkpoints
    interchangeable);
  * forward BIT-IDENTICAL to the standard fused chain (same ops, same cast
    placement — only residual bookkeeping differs);
  * gradients equal standard autodiff to f32 reassociation (the relu/IN
    backward is hand-derived from (y, mean, var, a); the consumer conv's
    input is a remat-time recompute).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.models.decoder import DecoderFuse


def _decoder_args(rng, b=1, small=True):
    shapes = (
        [(b, 3, 16, 16, 24), (b, 3, 16, 16, 48), (b, 3, 8, 8, 96),
         (b, 3, 4, 4, 192), (b, 8, 8, 8, 192)]
        if small else
        [(b, 3, 56, 56, 24), (b, 3, 56, 56, 48), (b, 3, 28, 28, 96),
         (b, 3, 14, 14, 192), (b, 8, 8, 8, 192)]
    )
    return [jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
            for s in shapes]


def _grad_worst_rel(g0, g1):
    rel = jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()
                           / (jnp.abs(a).max() + 1e-12)), g0, g1)
    return max(jax.tree.leaves(rel))


def test_lean_matches_standard_small():
    rng = np.random.default_rng(0)
    args = _decoder_args(rng)
    std = DecoderFuse(depth_mode="full", lean=False)
    lean = DecoderFuse(depth_mode="full", lean=True)
    chunk = DecoderFuse(depth_mode="full", lean=True, c2_chunks=8)
    v = std.init(jax.random.PRNGKey(0), *args, False)
    for mod in (lean, chunk):
        v_other = mod.init(jax.random.PRNGKey(0), *args, False)
        assert (jax.tree.map(lambda a: a.shape, v)
                == jax.tree.map(lambda a: a.shape, v_other))

    o0 = std.apply(v, *args, False)
    o1 = lean.apply(v, *args, False)
    assert float(jnp.abs(o0 - o1).max()) == 0.0  # operation-identical fwd
    # chunked: conv batches change blocking — f32 reassociation only
    o2 = chunk.apply(v, *args, False)
    assert float(jnp.abs(o0 - o2).max()) < 2e-6

    def loss(params, mod):
        out = mod.apply(params, *args, True)
        return (out * out).mean()

    g0 = jax.grad(lambda p: loss(p, std))(v)
    g1 = jax.grad(lambda p: loss(p, lean))(v)
    assert _grad_worst_rel(g0, g1) < 2e-5
    g2 = jax.grad(lambda p: loss(p, chunk))(v)
    # init-time InstanceNorm amplification of reassociation noise
    # (calibrated against the fuse_expand_bn precedent, NOTES round-2)
    assert _grad_worst_rel(g0, g2) < 1e-3


@pytest.mark.skipif(
    os.environ.get("CORRIFNET_SLOW_TESTS", "0") != "1",
    reason="extra full-cascade compiles are slow on 1 CPU core; "
           "set CORRIFNET_SLOW_TESTS=1",
)
def test_lean_matches_standard_bf16():
    """The TPU compute dtype. (Note: the cascade's internal H/W and depth
    targets are HARDCODED (16..128^3) — even the small-skip test above
    exercises the full-scale volumes, so no separate full-scale leg is
    needed; this slow leg covers the bf16 dtype instead.)"""
    rng = np.random.default_rng(1)
    args = _decoder_args(rng)
    std = DecoderFuse(depth_mode="full", lean=False, dtype=jnp.bfloat16)
    lean = DecoderFuse(depth_mode="full", lean=True, dtype=jnp.bfloat16)
    v = std.init(jax.random.PRNGKey(0), *args, False)
    o0 = std.apply(v, *args, False)
    o1 = lean.apply(v, *args, False)
    assert float(jnp.abs(o0 - o1).max()) == 0.0

    def loss(params, mod):
        out = mod.apply(params, *args, True)
        return (out * out).mean()

    g0 = jax.grad(lambda p: loss(p, std))(v)
    g1 = jax.grad(lambda p: loss(p, lean))(v)
    # bf16 compute: reassociation differences are amplified by the low
    # mantissa; bound loosely but meaningfully
    assert _grad_worst_rel(g0, g1) < 5e-2


def test_relu_in_stats_grads_match_autodiff():
    """Op-level: hand-derived backward vs autodiff of the identical
    composition, including the fma applied by the consumer."""
    from corrifnet_tpu.ops.instancenorm import (
        relu_in_stats, relu_instancenorm_xla,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 8, 8, 6)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (2, 4, 8, 8, 6)).astype(np.float32))

    def lean_fn(t):
        y, a, b = relu_in_stats(t)
        return y * a + b

    o0, pb0 = jax.vjp(relu_instancenorm_xla, x)
    o1, pb1 = jax.vjp(lean_fn, x)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    (dx0,), (dx1,) = pb0(g), pb1(g)
    np.testing.assert_allclose(np.asarray(dx0), np.asarray(dx1),
                               rtol=1e-5, atol=1e-6)


def test_relu_in_stats_mask_at_zero():
    """The relu mask recovered from y must treat non-positive inputs as
    dead exactly like autodiff (x <= 0 -> zero gradient)."""
    from corrifnet_tpu.ops.instancenorm import relu_in_stats

    x = jnp.asarray(
        np.array([[-1.0, 0.0, 0.5, 2.0, -3.0, 1.0]], np.float32)
    ).reshape(1, 1, 1, 6, 1)

    def f(t):
        y, a, b = relu_in_stats(t)
        return (y * a + b).sum()

    dx = jax.grad(f)(x).reshape(-1)
    assert float(dx[0]) == 0.0 and float(dx[4]) == 0.0  # x < 0
    assert float(dx[1]) == 0.0  # x == 0: relu grad convention


def test_relu_in_stats_bf16_fwd_bitwise():
    """bf16 (the TPU compute dtype): lean epilogue forward + consumer fma
    must reproduce relu_instancenorm_xla bit-for-bit at op level."""
    from corrifnet_tpu.ops.instancenorm import (
        relu_in_stats, relu_instancenorm_xla,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.normal(0, 1, (2, 4, 8, 8, 6)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def lean_fn(t):
        y, a, b = relu_in_stats(t)
        return y * a + b

    o0 = relu_instancenorm_xla(x)
    o1 = lean_fn(x)
    np.testing.assert_array_equal(
        np.asarray(o0, np.float32), np.asarray(o1, np.float32))
