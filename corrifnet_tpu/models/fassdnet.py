"""FASSDNet (reference: F28_FASSDNet.py:272-377).

HarDNet encoder (HarDBlock harmonic link topology, F28:182-242) with
stride-2 stem + AvgPool transitions, DAPF dilated asymmetric pyramid
bottleneck (rates 1/12/24/36, F28:48-92), decoder of TransitionUp (bilinear
align_corners=True to the skip's size + concat), 1x1 reduction, MDA
multi-resolution dilated asymmetric blocks (d = 16/8/4 going up, F28:324-329
pops dilation_block in reverse), HarDBlocks up, final 1x1 conv + bilinear
resize to input + sigmoid.

Init parity: DAPF/PyramBranch convs are kaiming-normal (F28:40-46,86-92);
all other convs keep torch defaults.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import BatchNorm, Conv, PReLU
from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.nn.resize import avg_pool, resize_linear

__all__ = ["FASSDNet", "hard_block_link"]

Dtype = Any


def hard_block_link(layer: int, base_ch: int, growth_rate: int, grmul: float):
    """HarDBlock link topology (F28:183-200) — pure static computation."""
    if layer == 0:
        return base_ch, 0, []
    out_channels = growth_rate
    link = []
    for i in range(10):
        dv = 2 ** i
        if layer % dv == 0:
            k = layer - dv
            link.append(k)
            if i > 0:
                out_channels *= grmul
    out_channels = int(int(out_channels + 1) / 2) * 2
    in_channels = 0
    for i in link:
        ch, _, _ = hard_block_link(i, base_ch, growth_rate, grmul)
        in_channels += ch
    return out_channels, in_channels, link


def hard_block_out_ch(in_channels, growth_rate, grmul, n_layers):
    out = 0
    for i in range(n_layers):
        outch, _, _ = hard_block_link(i + 1, in_channels, growth_rate, grmul)
        if (i % 2 == 0) or (i == n_layers - 1):
            out += outch
    return out


class ConvLayer(fnn.Module):
    """conv -> BN -> ReLU (F28:167-178), bias-free, torch default init."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.out_ch, self.kernel, strides=self.stride,
                 padding=self.kernel // 2, use_bias=False, dtype=self.dtype,
                 name="conv")(x)
        x = BatchNorm(dtype=self.dtype, name="norm")(
            x, use_running_average=not train
        )
        return jax.nn.relu(x)


class HarDBlock(fnn.Module):
    in_channels: int
    growth_rate: int
    grmul: float
    n_layers: int
    keep_base: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        layers_ = [x]
        links = []
        for i in range(self.n_layers):
            outch, _, link = hard_block_link(
                i + 1, self.in_channels, self.growth_rate, self.grmul
            )
            links.append(link)
            tin = [layers_[j] for j in link]
            inp = jnp.concatenate(tin, axis=-1) if len(tin) > 1 else tin[0]
            layers_.append(
                ConvLayer(outch, dtype=self.dtype, name=f"layer{i}")(inp, train)
            )
        t = len(layers_)
        outs = [
            layers_[i]
            for i in range(t)
            if (i == 0 and self.keep_base) or (i == t - 1) or (i % 2 == 1)
        ]
        return jnp.concatenate(outs, axis=-1)


class PyramBranch(fnn.Module):
    planes: int
    dilation: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        d = self.dilation
        x = Conv(self.planes, (3, 1), padding=(d, 0), dilation=(d, 1),
                 use_bias=False, kernel_init=tinit.kaiming_normal,
                 dtype=self.dtype, name="conv3x1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn3x1")(x, use_running_average=not train)
        x = jax.nn.relu(x)
        x = Conv(self.planes, (1, 3), padding=(0, d), dilation=(1, d),
                 use_bias=False, kernel_init=tinit.kaiming_normal,
                 dtype=self.dtype, name="conv1x3")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1x3")(x, use_running_average=not train)
        return jax.nn.relu(x)


class DAPF(fnn.Module):
    inplanes: int
    alpha: int = 2
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        mid = self.inplanes // self.alpha
        x1 = Conv(mid, 1, use_bias=False, kernel_init=tinit.kaiming_normal,
                  dtype=self.dtype, name="conv1x1")(x)
        x1 = BatchNorm(dtype=self.dtype, name="bn1x1")(x1, use_running_average=not train)
        x1 = jax.nn.relu(x1)
        branches = [x1] + [
            PyramBranch(mid, d, dtype=self.dtype, name=f"pyBranch{i + 2}")(x, train)
            for i, d in enumerate([12, 24, 36])
        ]
        y = jnp.concatenate(branches, axis=-1)
        y = Conv(self.inplanes, 1, use_bias=False,
                 kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                 name="conv1")(y)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, use_running_average=not train)
        return jax.nn.relu(y)


class _BNPReLU(fnn.Module):
    n: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x = BatchNorm(epsilon=1e-3, dtype=self.dtype, name="bn")(
            x, use_running_average=not train
        )
        return PReLU(channels=self.n, name="act")(x)


class MDA(fnn.Module):
    """Multi-resolution dilated asymmetric block (F28:132-163)."""

    n_in: int
    d: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        half = self.n_in // 2
        dt = self.dtype

        def conv_ba(y, ch, k, pad, dil, name):
            y = Conv(ch, k, padding=pad, dilation=dil, use_bias=False,
                     dtype=dt, name=f"{name}_conv")(y)
            return _BNPReLU(ch, dtype=dt, name=f"{name}_bnp")(y, train)

        y = _BNPReLU(self.n_in, dtype=dt, name="bn_relu_1")(x, train)
        y = conv_ba(y, half, 3, 1, 1, "conv3x3")
        br1 = conv_ba(y, half, 3, 1, 1, "par_conv3x3")
        br2 = conv_ba(y, half, (3, 1), (self.d, 0), (self.d, 1), "par_ddconv3x1")
        br2 = conv_ba(br2, half, (1, 3), (0, self.d), (1, self.d), "par_ddconv1x3")
        y = br1 + br2
        y = _BNPReLU(half, dtype=dt, name="bn_relu_2")(y, train)
        y = Conv(self.n_in, 1, use_bias=False, dtype=dt, name="conv1x1")(y)
        return y + x


class FASSDNet(fnn.Module):
    n_classes: int = 1
    alpha: int = 2
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        cdtype = dt or x.dtype
        y = jnp.moveaxis(x, 1, -1).astype(cdtype)
        in_hw = y.shape[1:3]

        first_ch = [16, 24, 32, 48]
        ch_list = [64, 96, 160, 224, 320]
        grmul = 1.7
        gr = [10, 16, 18, 24, 32]
        n_layers = [4, 4, 8, 8]
        blks = len(n_layers)

        y = ConvLayer(first_ch[0], 3, 2, dtype=dt, name="stem0")(y, train)
        y = ConvLayer(first_ch[1], 3, 1, dtype=dt, name="stem1")(y, train)
        y = ConvLayer(first_ch[2], 3, 2, dtype=dt, name="stem2")(y, train)
        y = ConvLayer(first_ch[3], 3, 1, dtype=dt, name="stem3")(y, train)

        skips: List = []
        skip_ch = []
        ch = first_ch[3]
        for i in range(blks):
            y = HarDBlock(ch, gr[i], grmul, n_layers[i], dtype=dt,
                          name=f"hard{i}")(y, train)
            ch = hard_block_out_ch(ch, gr[i], grmul, n_layers[i])
            skip_ch.append(ch)
            if i < blks - 1:
                skips.append(y)
            y = ConvLayer(ch_list[i], 1, dtype=dt, name=f"trans{i}")(y, train)
            ch = ch_list[i]
            if i < blks - 1:
                y = avg_pool(y, (2, 2), (2, 2))

        y = DAPF(ch, self.alpha, dtype=dt, name="DAPF")(y, train)

        dilation_block = [2, 4, 8, 16]
        prev_ch = ch
        for di, i in enumerate(range(blks - 2, -1, -1)):
            skip = skips.pop()
            y = resize_linear(y, skip.shape[1:3], align_corners=True)
            y = jnp.concatenate([y, skip], axis=-1)
            cur = prev_ch + skip_ch[i]
            y = ConvLayer(cur // 2, 1, dtype=dt, name=f"up_conv{di}")(y, train)
            y = MDA(cur // 2, d=dilation_block[i], dtype=dt, name=f"mda{di}")(y, train)
            y = HarDBlock(cur // 2, gr[i], grmul, n_layers[i], dtype=dt,
                          name=f"hard_up{di}")(y, train)
            prev_ch = hard_block_out_ch(cur // 2, gr[i], grmul, n_layers[i])

        y = Conv(self.n_classes, 1, dtype=dt, name="finalConv")(y)
        y = resize_linear(y, in_hw, align_corners=True)
        out = jax.nn.sigmoid(y.astype(jnp.float32))
        return jnp.moveaxis(out, -1, 1)
