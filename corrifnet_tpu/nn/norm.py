"""Normalization layers with PyTorch-matching semantics, channels-last.

All activations in this framework are channels-last (``(B, D, H, W, C)`` for
volumes, ``(B, H, W, C)`` for images) — the TPU-native layout: the channel
axis maps onto the 128-wide lane dimension so elementwise/norm ops vectorize
on the VPU and convs tile onto the MXU without transposes.

Torch-parity notes:
  * BatchNorm: eps 1e-5, momentum 0.1 (i.e. ``ra = 0.9*ra + 0.1*batch``),
    running_var updated with the *unbiased* batch variance but normalization
    uses the biased one — both quirks reproduced.
  * InstanceNorm (torch default ``affine=False, track_running_stats=False``):
    per-(sample, channel) stats over spatial dims, used in BOTH train and
    eval mode.
  * Stats are always computed in float32 regardless of compute dtype.

Application strategy (TPU): stats/affine fold into per-channel ``a = scale *
rsqrt(var+eps)`` and ``b = bias - mean*a`` in f32, then ``y = x*a + b`` is
evaluated with x upcast to f32 INSIDE the elementwise chain and the result
cast back to the compute dtype. The fold keeps the apply a single
convert->fma->convert chain that XLA fuses into one pass (the old
(x-mean)*rsqrt(...)*scale+bias form shared a materialized f32 copy of x
between the stat reductions and the apply — standalone HBM copies worth
~13% of device step time at batch 16). Doing the fma in f32 (not bf16)
matters: for a channel with |mean| >> std, the x*a ~ -b cancellation needs
f32 mantissa bits; the per-element relative error is ~6e-8 * |mean|/std,
vs ~4e-3 * |mean|/std had it run in bf16.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn
from jax.ad_checkpoint import checkpoint_name

__all__ = ["BatchNorm", "InstanceNorm", "GroupNorm", "LayerNorm"]

Dtype = Any


class BatchNorm(fnn.Module):
    """BatchNorm over all axes except the last (channel) one.

    Works for both 4-D (NHWC) and 5-D (NDHWC) inputs — torch's BatchNorm2d /
    BatchNorm3d respectively (e.g. mmvit4.py:121, Bottleneck3D BNs).

    ``use_running_average=True`` corresponds to torch ``.eval()`` mode.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, use_running_average: bool = False):
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", fnn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Single pass over x: E[x] and E[x^2] in one fused read, var by
            # the shift formula (clamped - f32 cancellation can dip below
            # zero). Halves the HBM stat traffic vs the two-pass form.
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=reduce_axes)
            sq = (xf * xf).mean(axis=reduce_axes)
            var = jnp.maximum(sq - mean * mean, 0.0)
            if not self.is_initializing():
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        # Named so the encoder remat policy can SAVE these (C,)-sized
        # vectors: the backward then skips recomputing the stat reductions
        # entirely (models/resnet3d.py remat policy).
        a = checkpoint_name(a, "bn_stats")
        b = checkpoint_name(b, "bn_stats")
        dt = self.dtype or x.dtype
        # fma in f32 (see module docstring), single fused convert chain
        return (x.astype(jnp.float32) * a + b).astype(dt)


class InstanceNorm(fnn.Module):
    """InstanceNorm over spatial axes, per sample and channel.

    Torch default: no affine params, no running stats (mmvit4.py:23-24 uses
    ``nn.InstanceNorm3d(planes)`` with defaults).
    """

    epsilon: float = 1e-5
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        reduce_axes = tuple(range(1, x.ndim - 1))  # spatial only
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=reduce_axes, keepdims=True)
        sq = (xf * xf).mean(axis=reduce_axes, keepdims=True)
        var = jnp.maximum(sq - mean * mean, 0.0)
        a = jax.lax.rsqrt(var + self.epsilon)
        b = -mean * a
        dt = self.dtype or x.dtype
        return (x.astype(jnp.float32) * a + b).astype(dt)


class GroupNorm(fnn.Module):
    """GroupNorm (torch eps 1e-5, affine)."""

    num_groups: int = 4
    epsilon: float = 1e-5
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        features = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", fnn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (features,), jnp.float32)
        orig_shape = x.shape
        xf = x.astype(jnp.float32).reshape(orig_shape[0], -1, g, features // g)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        sq = (xf * xf).mean(axis=(1, 3), keepdims=True)
        var = jnp.maximum(sq - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)  # (B, 1, g, 1)
        # fold per-(sample, group) stats to per-(sample, channel) vectors
        invc = jnp.broadcast_to(
            inv, (orig_shape[0], 1, g, features // g)
        ).reshape(orig_shape[0], features)
        meanc = jnp.broadcast_to(
            mean, (orig_shape[0], 1, g, features // g)
        ).reshape(orig_shape[0], features)
        af = scale * invc
        bf = bias - meanc * af
        bc = (orig_shape[0],) + (1,) * (x.ndim - 2) + (features,)
        dt = self.dtype or x.dtype
        return (x.astype(jnp.float32) * af.reshape(bc)
                + bf.reshape(bc)).astype(dt)


class LayerNorm(fnn.Module):
    """LayerNorm over the last axis (torch eps 1e-5, elementwise affine)."""

    epsilon: float = 1e-5
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", fnn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        sq = (xf * xf).mean(axis=-1, keepdims=True)
        var = jnp.maximum(sq - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        dt = self.dtype or x.dtype
        a = scale * inv  # (..., 1) * (C,) -> (..., C), f32
        b = bias - mean * inv * scale
        return (xf * a + b).astype(dt)
