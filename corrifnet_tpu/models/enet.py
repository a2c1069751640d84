"""ENet (reference: F29_ENet.py:278-438).

Canonical ENet: InitialBlock (conv13ch || maxpool3ch -> BN -> PReLU), three
encoder stages of Regular/Downsampling bottlenecks (dilated up to 16,
asymmetric 5x1/1x5 pairs), two decoder stages of Upsampling bottlenecks
restoring resolution via MaxUnpool with the encoder's pool indices, and a
final 3x3 stride-2 transposed conv + sigmoid.

Reference defaults preserved: ``encoder_relu=False`` / ``decoder_relu=True``
so the encoder uses PReLU and the decoder ReLU; dropout2d probabilities
0.01 (stage 1) and 0.1 elsewhere. Note the reference shares ONE activation
module instance across each bottleneck's sub-blocks — for PReLU that means
a single shared slope parameter per bottleneck, reproduced here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import (
    BatchNorm,
    Conv,
    ConvTranspose,
    PReLU,
    max_pool_argmax,
    max_unpool,
)

__all__ = ["ENet"]

Dtype = Any


class _Act(fnn.Module):
    """Shared activation: ReLU or PReLU with ONE param per bottleneck
    (the reference reuses a single activation instance, F29:48-51)."""

    relu: bool

    @fnn.compact
    def __call__(self, x):
        if self.relu:
            return jax.nn.relu(x)
        return PReLU(name="prelu")(x)


def _drop2d(x, rate, name, det):
    """Dropout2d: drops whole channel maps (broadcast over H, W)."""
    return fnn.Dropout(rate, broadcast_dims=(1, 2), name=name)(x, deterministic=det)


class RegularBottleneck(fnn.Module):
    channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    padding: int = 0
    dilation: int = 1
    asymmetric: bool = False
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        det = not train
        internal = self.channels // self.internal_ratio
        act = _Act(self.relu, name="act")

        def bn(y, name):
            return BatchNorm(dtype=self.dtype, name=name)(
                y, use_running_average=not train
            )

        ext = Conv(internal, 1, use_bias=False, dtype=self.dtype, name="c1")(x)
        ext = act(bn(ext, "bn1"))
        if self.asymmetric:
            k, p = self.kernel_size, self.padding
            ext = Conv(internal, (k, 1), padding=(p, 0), dilation=self.dilation,
                       use_bias=False, dtype=self.dtype, name="c2a")(ext)
            ext = act(bn(ext, "bn2a"))
            ext = Conv(internal, (1, k), padding=(0, p), dilation=self.dilation,
                       use_bias=False, dtype=self.dtype, name="c2b")(ext)
            ext = act(bn(ext, "bn2b"))
        else:
            ext = Conv(internal, self.kernel_size, padding=self.padding,
                       dilation=self.dilation, use_bias=False,
                       dtype=self.dtype, name="c2")(ext)
            ext = act(bn(ext, "bn2"))
        ext = Conv(self.channels, 1, use_bias=False, dtype=self.dtype, name="c3")(ext)
        ext = act(bn(ext, "bn3"))
        ext = _drop2d(ext, self.dropout_prob, "drop", det)
        return act(x + ext)


class DownsamplingBottleneck(fnn.Module):
    out_channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    padding: int = 0
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        det = not train
        in_ch = x.shape[-1]
        internal = in_ch // self.internal_ratio
        act = _Act(self.relu, name="act")

        def bn(y, name):
            return BatchNorm(dtype=self.dtype, name=name)(
                y, use_running_average=not train
            )

        main, indices = max_pool_argmax(x, self.kernel_size, 2, self.padding)

        ext = Conv(internal, 2, strides=2, use_bias=False, dtype=self.dtype,
                   name="c1")(x)
        ext = act(bn(ext, "bn1"))
        ext = Conv(internal, self.kernel_size, padding=self.padding,
                   use_bias=False, dtype=self.dtype, name="c2")(ext)
        ext = act(bn(ext, "bn2"))
        ext = Conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name="c3")(ext)
        ext = act(bn(ext, "bn3"))
        ext = _drop2d(ext, self.dropout_prob, "drop", det)

        # zero-pad main's channels to match (F29:176-187)
        pad_ch = self.out_channels - in_ch
        main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad_ch)))
        return act(main + ext), indices


class UpsamplingBottleneck(fnn.Module):
    out_channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    padding: int = 0
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, indices, out_hw, train: bool = True):
        det = not train
        in_ch = x.shape[-1]
        internal = in_ch // self.internal_ratio
        act = _Act(self.relu, name="act")

        def bn(y, name):
            return BatchNorm(dtype=self.dtype, name=name)(
                y, use_running_average=not train
            )

        main = Conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                    name="main_c1")(x)
        main = bn(main, "main_bn")
        main = max_unpool(main, indices, out_hw)

        ext = Conv(internal, 1, use_bias=False, dtype=self.dtype, name="c1")(x)
        ext = act(bn(ext, "bn1"))
        ext = ConvTranspose(internal, self.kernel_size, strides=2,
                            padding=self.padding, output_padding=1,
                            use_bias=False, dtype=self.dtype, name="c2")(ext)
        ext = act(bn(ext, "bn2"))
        ext = Conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name="c3")(ext)
        ext = act(bn(ext, "bn3"))
        ext = _drop2d(ext, self.dropout_prob, "drop", det)
        return act(main + ext)


class ENet(fnn.Module):
    classes: int = 1
    encoder_relu: bool = False
    decoder_relu: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        cdtype = dt or x.dtype
        y = jnp.moveaxis(x, 1, -1).astype(cdtype)
        er, dr = self.encoder_relu, self.decoder_relu

        # InitialBlock (F29:9-39): conv(3->13)||maxpool(3ch) -> BN -> act
        main = Conv(13, 3, strides=2, padding=1, use_bias=False, dtype=dt,
                    name="init_conv")(y)
        from corrifnet_tpu.nn import max_pool

        ext = max_pool(y, (3, 3), (2, 2), (1, 1))
        y = jnp.concatenate([main, ext], axis=-1)
        y = BatchNorm(dtype=dt, name="init_bn")(y, use_running_average=not train)
        y = _Act(er, name="init_act")(y)
        hw1 = y.shape[1:3]

        y, idx1 = DownsamplingBottleneck(64, padding=1, dropout_prob=0.01,
                                         relu=er, dtype=dt, name="down1_0")(y, train)
        for i in range(1, 5):
            y = RegularBottleneck(64, padding=1, dropout_prob=0.01, relu=er,
                                  dtype=dt, name=f"regular1_{i}")(y, train)
        hw2 = y.shape[1:3]

        y, idx2 = DownsamplingBottleneck(128, padding=1, dropout_prob=0.1,
                                         relu=er, dtype=dt, name="down2_0")(y, train)

        def stage23(y, stage):
            y = RegularBottleneck(128, padding=1, dropout_prob=0.1, relu=er,
                                  dtype=dt, name=f"regular{stage}_a")(y, train)
            y = RegularBottleneck(128, dilation=2, padding=2, dropout_prob=0.1,
                                  relu=er, dtype=dt, name=f"dilated{stage}_b")(y, train)
            y = RegularBottleneck(128, kernel_size=5, padding=2, asymmetric=True,
                                  dropout_prob=0.1, relu=er, dtype=dt,
                                  name=f"asym{stage}_c")(y, train)
            y = RegularBottleneck(128, dilation=4, padding=4, dropout_prob=0.1,
                                  relu=er, dtype=dt, name=f"dilated{stage}_d")(y, train)
            y = RegularBottleneck(128, padding=1, dropout_prob=0.1, relu=er,
                                  dtype=dt, name=f"regular{stage}_e")(y, train)
            y = RegularBottleneck(128, dilation=8, padding=8, dropout_prob=0.1,
                                  relu=er, dtype=dt, name=f"dilated{stage}_f")(y, train)
            y = RegularBottleneck(128, kernel_size=5, padding=2, asymmetric=True,
                                  dropout_prob=0.1, relu=er, dtype=dt,
                                  name=f"asym{stage}_g")(y, train)
            y = RegularBottleneck(128, dilation=16, padding=16, dropout_prob=0.1,
                                  relu=er, dtype=dt, name=f"dilated{stage}_h")(y, train)
            return y

        y = stage23(y, 2)
        y = stage23(y, 3)

        y = UpsamplingBottleneck(64, padding=1, dropout_prob=0.1, relu=dr,
                                 dtype=dt, name="up4_0")(y, idx2, hw2, train)
        y = RegularBottleneck(64, padding=1, dropout_prob=0.1, relu=dr,
                              dtype=dt, name="regular4_1")(y, train)
        y = RegularBottleneck(64, padding=1, dropout_prob=0.1, relu=dr,
                              dtype=dt, name="regular4_2")(y, train)

        y = UpsamplingBottleneck(16, padding=1, dropout_prob=0.1, relu=dr,
                                 dtype=dt, name="up5_0")(y, idx1, hw1, train)
        y = RegularBottleneck(16, padding=1, dropout_prob=0.1, relu=dr,
                              dtype=dt, name="regular5_1")(y, train)
        y = ConvTranspose(self.classes, 3, strides=2, padding=1,
                          output_padding=1, use_bias=False, dtype=dt,
                          name="transposed_conv")(y)
        out = jax.nn.sigmoid(y.astype(jnp.float32))
        return jnp.moveaxis(out, -1, 1)
