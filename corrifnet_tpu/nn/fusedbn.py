"""Pointwise conv + BatchNorm fused by folding the norm into the conv
weights, with the batch statistics computed from the conv INPUT.

For a 1x1 conv ``y = x @ W`` the per-channel BatchNorm statistics of ``y``
are linear/bilinear functionals of ``x``:

    mean_c  = (colsum(x) @ W)_c / n
    E[y^2]_c = (W^T (x^T x) W)_cc / n = sum_ij W_ic G_ij W_jc / n

with ``G = x^T x`` the (cin, cin) input Gram matrix. So the normalized
output can be emitted directly as ``x @ (W * a) + b`` (a, b the folded
scale/shift) — the unnormalized ``y`` is never materialized, which deletes
two full passes over the conv output per BN (the stats read and the
normalize read+write) and lets the residual add + ReLU fuse into the
conv's output epilogue.

Cost/benefit: the Gram adds ``n * cin^2`` MXU MACs (+2x that in the
backward through the stats path). This wins exactly when the conv EXPANDS
(cout > cin): for the bottleneck's conv3 / down_conv (cin -> 4*cin, the
two largest BN tensors in the encoder) the Gram is +25% MACs on that conv
while the eliminated passes are over the 4x-wider output. For contracting
convs (bottleneck conv1) the Gram would cost 4x the conv — keep those on
the standard path.

Numerics: statistics accumulate in f32 on the MXU (``preferred_element_
type``); in bf16 compute mode they are taken from the bf16 INPUT rather
than from a bf16-rounded ``y``, and in f32 mode the difference from the
unfused form is pure reassociation (torch-parity tested end-to-end).

The param/stat pytree is IDENTICAL to the unfused ``Conv``+``BatchNorm``
pair (same names, shapes, initializers, rng paths), so checkpoints, the
reference state-dict importer, and ``pack_stage1_variables`` are
unaffected by the flag (tests/test_fusedbn.py asserts bitwise init
equality).

Reference semantics preserved: torch BatchNorm eps 1e-5, momentum 0.1,
running_var from the UNBIASED batch variance while normalization uses the
biased one (mmvit4.py bottleneck bn1-3/downsample, nn/norm.py BatchNorm).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn.norm import bn_fold, bn_update_running

__all__ = ["fused_pointwise_conv_bn"]

Dtype = Any


class _ConvKernel(fnn.Module):
    """Declares exactly the kernel param an unbiased ``Conv`` would:
    (*ks, cin, cout) for modalities=1, per-stream (M, *ks, ci, co) —
    same initializer calls on the same rng path, so the values are
    bitwise identical to the unfused module's."""

    kernel_size: Sequence[int]
    in_ch: int
    features: int
    modalities: int
    kernel_init: Callable

    @fnn.compact
    def __call__(self):
        from corrifnet_tpu.nn.conv import packed_kernel_init

        ks, m = tuple(self.kernel_size), self.modalities
        if m > 1:
            ci, co = self.in_ch // m, self.features // m
            return self.param(
                "kernel", packed_kernel_init(self.kernel_init, ks, ci, co, m),
                None, jnp.float32,
            )
        kshape = (*ks, self.in_ch, self.features)
        return self.param("kernel", self.kernel_init, kshape, jnp.float32)


class _BNParams(fnn.Module):
    """Declares exactly BatchNorm's params/stats and performs the
    stat->affine fold on EXTERNALLY computed batch statistics."""

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @fnn.compact
    def __call__(self, mean, var, n, use_running_average: bool):
        f = self.features
        scale = self.param("scale", fnn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif not self.is_initializing():
            bn_update_running(ra_mean, ra_var, mean, var, n, self.momentum)
        # bn_fold names a/b 'bn_stats': the encoder remat policy saves them,
        # so backward recompute skips the Gram/stat math entirely
        return bn_fold(scale, bias, mean, var, self.epsilon)


def _input_side_stats(x2, wf, m):
    """Batch stats of ``x2 @ blockdiag(wf)`` from the input side.

    x2: (n, m*ci) compute dtype; wf: (m, ci, co) f32. Returns per-channel
    (mean, var) of shape (m*co,), accumulated in f32 on the MXU."""
    n, ci = x2.shape[0], wf.shape[1]
    xs = x2.reshape(n, m, ci)
    colsum = jnp.sum(xs.astype(jnp.float32), axis=0)  # (m, ci)
    gram = jnp.einsum(
        "nmi,nmj->mij", xs, xs, preferred_element_type=jnp.float32
    )
    mean = jnp.einsum("mi,mic->mc", colsum, wf) / n
    ey2 = jnp.einsum("mij,mjc,mic->mc", gram, wf, wf) / n
    var = jnp.maximum(ey2 - mean * mean, 0.0)
    return mean.reshape(-1), var.reshape(-1)


def fused_pointwise_conv_bn(
    x,
    features: int,
    *,
    conv_name: str,
    bn_name: str,
    train: bool,
    strides=1,
    modalities: int = 1,
    kernel_init: Callable,
    dtype: Dtype = None,
):
    """Drop-in replacement for ``Conv(features, (1,1,1), strides=(1,s,s),
    use_bias=False, name=conv_name)`` followed by ``BatchNorm(name=
    bn_name)(y, use_running_average=not train)`` inside a compact module
    (the caller's scope owns the declared children, so the pytree matches
    the unfused pair exactly).

    Stride-s pointwise conv == spatial subsample then matmul; statistics
    are taken on the subsampled input, which IS the conv output's basis.
    """
    nsp = x.ndim - 2
    st = (strides,) * nsp if isinstance(strides, int) else tuple(strides)
    ks = (1,) * nsp
    m = modalities
    in_ch = x.shape[-1]

    kernel = _ConvKernel(
        kernel_size=ks, in_ch=in_ch, features=features, modalities=m,
        kernel_init=kernel_init, name=conv_name,
    )()

    cdtype = dtype or x.dtype
    for axis, s in enumerate(st, start=1):
        if s != 1:
            x = jax.lax.slice_in_dim(x, 0, x.shape[axis], stride=s, axis=axis)
    x = x.astype(cdtype)

    ci, co = in_ch // m, features // m
    wf = kernel.reshape(m, ci, co).astype(jnp.float32)

    x2 = x.reshape(-1, in_ch)
    n = x2.shape[0]
    if train:
        mean, var = _input_side_stats(x2, wf, m)
    else:
        mean = var = jnp.zeros((features,), jnp.float32)  # unused branch
    a, b = _BNParams(features=features, name=bn_name)(
        mean, var, n, use_running_average=not train
    )

    # fold the norm into the weights: y = x @ (W * a) + b, one pass
    wfold = (wf * a.reshape(m, 1, co)).astype(cdtype)
    if m > 1:
        y = jnp.einsum("nmi,mic->nmc", x2.reshape(-1, m, ci), wfold)
        y = y.reshape(*x.shape[:-1], features)
    else:
        y = jnp.dot(x, wfold[0])
        y = y.reshape(*x.shape[:-1], features)
    return y + b.astype(cdtype)
