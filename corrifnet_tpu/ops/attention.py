"""Fused multi-head self-attention Pallas kernel for the token transformers.

CorrIFNet's attention shapes are tiny and fixed — 512 tokens (IntraFormer,
mmvit4.py:408-411) or 2048 tokens (multimodal transformer, :515-521) at
head_dim 64 — so an entire (N, N) score tile fits in VMEM and the whole
softmax(QK^T)V chain runs as ONE kernel per (batch, head): no HBM round
trips for the N^2 attention matrix. Numerics match the XLA path (softmax in
f32 with max-subtraction).

Backward uses recompute-through-XLA (custom VJP): the forward saves only
q/k/v and the backward re-derives gradients with the XLA composition — the
same memory win flash-attention's bwd gets, without a hand-written bwd
kernel for these tiny shapes.

Opt-in via ``corrifnet_tpu.nn.Transformer(use_pallas_attn=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention", "attention_xla"]

# Set True to run in the Pallas interpreter (CPU testing).
INTERPRET = False


def attention_xla(q, k, v, scale):
    """Reference path: (B, H, N, D) heads-major attention."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _attn_kernel(scale, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / e.sum(axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_fwd(q, k, v, scale):
    b, h, n, d = q.shape
    flat = lambda t: t.reshape(b * h, n, d)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, float(scale)),
        grid=(b * h,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=INTERPRET,
    )(flat(q), flat(k), flat(v))
    return out.reshape(b, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale):
    """(B, H, N, D) fused attention; falls back to XLA off-TPU."""
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not on_tpu and not INTERPRET:
        return attention_xla(q, k, v, scale)
    return _fused_fwd(q, k, v, scale)


def _vjp_fwd(q, k, v, scale):
    return fused_attention(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, res, g):
    q, k, v = res
    # recompute probabilities; standard attention gradients
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
    ds = ds * scale
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)
