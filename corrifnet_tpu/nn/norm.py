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
rsqrt(var+eps)`` and ``b = bias - mean*a`` in f32, then ``y = x*a + b`` runs
in the COMPUTE dtype — algebraically identical to normalizing in f32, but
the full activation tensor never round-trips through f32 (profiled: the
f32 converts around every encoder BN were standalone HBM copies, ~13% of
device step time at batch 16).

Why the fma is NOT forced to f32: an ``(x.astype(f32) * a + b)`` apply was
measured at +6 ms/step (B=8, ~5%) — XLA CSEs the f32 convert with the stat
reductions' and materializes the f32 activation with a layout copy (trace:
standalone ``copy`` ops at the stem BN). The bf16-fma cancellation error
(~4e-3 * |mean|/std per element when x ~ mean) is on par with bf16 rounding
elsewhere in the compute path, and in f32 training mode (dtype=None) the
two forms are bitwise identical — so precision-critical runs already get
the f32 fma for free.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn
from jax.ad_checkpoint import checkpoint_name

__all__ = ["BatchNorm", "InstanceNorm", "GroupNorm", "LayerNorm",
           "bn_fold", "bn_update_running"]

Dtype = Any


def bn_fold(scale, bias, mean, var, eps):
    """Fold BN stats + affine into per-channel ``y = x*a + b`` vectors,
    named 'bn_stats' so the encoder remat policy saves them (backward
    recompute then skips the stat reductions). Shared by BatchNorm and the
    conv-folded path (nn/fusedbn.py) so the quirks live in one place."""
    a = scale * jax.lax.rsqrt(var + eps)
    b = bias - mean * a
    return checkpoint_name(a, "bn_stats"), checkpoint_name(b, "bn_stats")


def bn_update_running(ra_mean, ra_var, mean, var, n, momentum):
    """Torch-parity running update: running_var takes the UNBIASED batch
    variance while normalization uses the biased one (both quirks)."""
    unbiased = var * (n / max(n - 1, 1))
    ra_mean.value = (1 - momentum) * ra_mean.value + momentum * mean
    ra_var.value = (1 - momentum) * ra_var.value + momentum * unbiased


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
                bn_update_running(ra_mean, ra_var, mean, var, n, self.momentum)

        a, b = bn_fold(scale, bias, mean, var, self.epsilon)
        dt = self.dtype or x.dtype
        # compute-dtype fma (see module docstring for the measured trade-off)
        return x.astype(dt) * a.astype(dt) + b.astype(dt)


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
        return x.astype(dt) * a.astype(dt) + b.astype(dt)


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
        return (x.astype(dt) * af.reshape(bc).astype(dt)
                + bf.reshape(bc).astype(dt))


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
        a = (scale * inv).astype(dt)  # (..., 1) * (C,) -> (..., C)
        b = (bias - mean * inv * scale).astype(dt)
        return x.astype(dt) * a + b
