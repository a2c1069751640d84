"""Fused attention kernel (interpret mode) vs the XLA path, incl. grads."""

import jax
import jax.numpy as jnp
import numpy as np

import corrifnet_tpu.ops.attention as attn_mod
from corrifnet_tpu.ops import attention_xla, fused_attention


def _qkv(shape, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)) for _ in range(3)
    )


def test_fused_forward_matches_xla_interpret():
    q, k, v = _qkv((2, 4, 64, 128))
    scale = 128 ** -0.5
    attn_mod.INTERPRET = True
    try:
        got = fused_attention(q, k, v, scale)
    finally:
        attn_mod.INTERPRET = False
    want = attention_xla(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_grads_match_xla():
    q, k, v = _qkv((1, 2, 16, 128), seed=1)
    scale = 0.125

    def loss_fused(q, k, v):
        return (fused_attention(q, k, v, scale) ** 2).sum()

    def loss_xla(q, k, v):
        return (attention_xla(q, k, v, scale) ** 2).sum()

    attn_mod.INTERPRET = True
    try:
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    finally:
        attn_mod.INTERPRET = False
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_transformer_flag_same_output_off_tpu():
    """On CPU the flag transparently falls back to XLA — outputs identical."""
    from corrifnet_tpu.nn import Transformer

    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 8, 32)).astype(np.float32))
    pos = jnp.zeros((1, 8, 32), jnp.float32)
    m1 = Transformer(32, depth=1, heads=4, mlp_dim=32, dropout_rate=0.0)
    v1 = m1.init({"params": jax.random.PRNGKey(0)}, x, pos)
    m2 = Transformer(32, depth=1, heads=4, mlp_dim=32, dropout_rate=0.0)
    out1 = m1.apply(v1, x, pos)
    out2 = m2.apply(v1, x, pos)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
