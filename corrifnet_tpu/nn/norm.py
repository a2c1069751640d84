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
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

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
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=reduce_axes)
            var = ((xf - mean) ** 2).mean(axis=reduce_axes)
            if not self.is_initializing():
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


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
        var = ((xf - mean) ** 2).mean(axis=reduce_axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(self.dtype or x.dtype)


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
        var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(orig_shape)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


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
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
