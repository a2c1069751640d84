"""Transformer blocks for the Intra/Inter/Multimodal formers
(reference: mmvit4.py:295-388; identical copies live in mmmvit2.py and
mmformer.py).

Structure per depth step (Transformer.forward, mmvit4.py:383-388):
    x = x + pos
    x = x + Dropout(SelfAttention(LayerNorm(x)))     # Residual(PreNormDrop)
    x = x + FeedForward(LayerNorm(x))                # Residual(PreNorm)

SelfAttention (mmvit4.py:295-315): qkv Linear without bias, scale
head_dim**-0.5, softmax, attention dropout, output projection with bias.

TPU notes: sequence lengths are tiny and fixed (512 or 2048 tokens), so the
whole attention fits in VMEM — XLA fuses the softmax chain; matmuls run on
the MXU with float32 accumulation. A Pallas fused-attention path can be
swapped in via ``corrifnet_tpu.ops`` (same math, opt-in).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn.conv import Dense
from corrifnet_tpu.nn.norm import LayerNorm

__all__ = ["SelfAttention", "FeedForward", "Transformer"]

Dtype = Any


class SelfAttention(fnn.Module):
    dim: int
    heads: int = 8
    qkv_bias: bool = False
    dropout_rate: float = 0.0
    use_pallas_attn: bool = False  # fused kernel incl. in-kernel attn dropout
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        h = self.heads
        head_dim = c // h
        scale = head_dim ** -0.5

        qkv = Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.use_pallas_attn:
            from corrifnet_tpu.ops import fused_attention

            rate = 0.0 if deterministic else self.dropout_rate
            rng = self.make_rng("dropout") if rate > 0.0 else None
            out = fused_attention(q, k, v, scale, dropout_rate=rate, rng=rng)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            attn = fnn.Dropout(self.dropout_rate, name="attn_drop")(
                attn, deterministic=deterministic
            )
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = Dense(c, dtype=self.dtype, name="proj")(out)
        out = fnn.Dropout(self.dropout_rate, name="proj_drop")(
            out, deterministic=deterministic
        )
        return out


class FeedForward(fnn.Module):
    dim: int
    hidden_dim: int
    dropout_rate: float = 0.0
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)  # torch F.gelu is exact
        x = fnn.Dropout(self.dropout_rate, name="drop1")(x, deterministic=deterministic)
        x = Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = fnn.Dropout(self.dropout_rate, name="drop2")(x, deterministic=deterministic)
        return x


class Transformer(fnn.Module):
    """Pre-norm transformer with positional embedding re-added per depth
    step (mmvit4.py:360-388)."""

    embedding_dim: int
    depth: int = 1
    heads: int = 8
    mlp_dim: int = 512
    dropout_rate: float = 0.1
    use_pallas_attn: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        for j in range(self.depth):
            x = x + pos
            attn_in = LayerNorm(dtype=self.dtype, name=f"attn_norm_{j}")(x)
            attn_out = SelfAttention(
                self.embedding_dim,
                heads=self.heads,
                dropout_rate=self.dropout_rate,
                use_pallas_attn=self.use_pallas_attn,
                dtype=self.dtype,
                name=f"attn_{j}",
            )(attn_in, deterministic=deterministic)
            attn_out = fnn.Dropout(self.dropout_rate, name=f"attn_out_drop_{j}")(
                attn_out, deterministic=deterministic
            )
            x = x + attn_out
            ffn_in = LayerNorm(dtype=self.dtype, name=f"ffn_norm_{j}")(x)
            x = x + FeedForward(
                self.embedding_dim,
                self.mlp_dim,
                self.dropout_rate,
                dtype=self.dtype,
                name=f"ffn_{j}",
            )(ffn_in, deterministic=deterministic)
        return x
