"""Fused ReLU + InstanceNorm Pallas kernel.

Every decoder/fusion conv in the 5-D zoo ends in the
``conv -> ReLU -> InstanceNorm3d`` epilogue (general_conv3d_prenorm,
mmvit4.py:41-45). InstanceNorm needs per-(sample, channel) statistics over
(D, H, W), which XLA computes as separate reduction + normalization passes
over the activation; this kernel does ReLU, both statistics and the
normalization in ONE VMEM residency per sample — the model is
bandwidth-bound, so fewer HBM passes is the win.

Shapes: channels-last volumes (B, D, H, W, C); grid over B; the full
(D*H*W, C) slab for one sample must fit VMEM (largest corrifnet slab:
the pruned decoder's (4, 128, 128, 32) ~= 8 MB f32 — fits).

Backward: custom VJP recomputing through the XLA composition (exact same
math), so gradients are standard-autodiff correct.

Opt-in via ``GeneralConv3d(use_pallas_epilogue=True)``; default off until
profiled on a trustworthy TPU attach (see NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["relu_instancenorm", "relu_instancenorm_xla"]

# Set True to run in the Pallas interpreter (CPU testing).
INTERPRET = False


def relu_instancenorm_xla(x, eps=1e-5):
    """Reference path: ReLU then InstanceNorm over spatial axes (torch
    InstanceNorm3d defaults: no affine, biased variance, batch stats)."""
    y = jax.nn.relu(x.astype(jnp.float32))
    axes = tuple(range(1, x.ndim - 1))
    mean = y.mean(axis=axes, keepdims=True)
    var = ((y - mean) ** 2).mean(axis=axes, keepdims=True)
    out = (y - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype)


def _kernel(eps, x_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    y = jnp.maximum(x, 0.0)
    n = y.shape[0]
    mean = y.sum(axis=0, keepdims=True) / n
    d = y - mean
    var = (d * d).sum(axis=0, keepdims=True) / n
    o_ref[0] = (d * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)


def _fused_fwd(x, eps):
    b = x.shape[0]
    c = x.shape[-1]
    n = 1
    for s in x.shape[1:-1]:
        n *= s
    flat = x.reshape(b, n, c)
    # channel blocking: per-channel stats are independent, so tile C when a
    # full (N, C) slab won't fit VMEM. Mosaic requires the last block dim to
    # be the full axis or a multiple of 128; slabs that can't tile legally
    # fall back to the XLA path.
    budget = 3 * 1024 * 1024  # bytes per buffer
    cb = c
    while n * cb * 4 > budget:
        if cb % 2 or (cb // 2) % 128:
            break
        cb //= 2
    if n * cb * 4 > budget:
        return relu_instancenorm_xla(x, eps)
    spec = pl.BlockSpec((1, n, cb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps),
        grid=(b, pl.cdiv(c, cb)),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        interpret=INTERPRET,
    )(flat)
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def relu_instancenorm(x, eps=1e-5):
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not on_tpu and not INTERPRET:
        return relu_instancenorm_xla(x, eps)
    return _fused_fwd(x, eps)


def _vjp_fwd(x, eps):
    return relu_instancenorm(x, eps), x


def _vjp_bwd(eps, x, g):
    _, pullback = jax.vjp(lambda t: relu_instancenorm_xla(t, eps), x)
    return pullback(g)


relu_instancenorm.defvjp(_vjp_fwd, _vjp_bwd)
