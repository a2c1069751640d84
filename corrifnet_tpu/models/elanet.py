"""ELANet — efficient lightweight attention network
(reference: F30_ELANet.py:252-342).

Structure: stride-2 stem (3x ConvBNPReLU, F30:258-260), stage 2 = ECG_D
downsampler + M=2 ECG_R blocks (dilated + channelwise convs with CCA
channel attention, F30:77-147), stage 3 = ECG_D + 9 ECG_R with dilation
schedule [4x5, 8x4] (F30:276-278), RFF multi-scale fusion decoder with
CCA/SCA dual attention (F30:201-240), 1x1 classifier, bilinear
(align_corners=False) resize to input, sigmoid.

Quirks preserved: BatchNorm eps 1e-3 (F30:15); per-channel PReLU; the CCA
channel attention is a 1-D conv over the pooled channel descriptor whose
kernel/stride/padding derive from the channel counts (F30:165-181);
kaiming-normal init on 2-D convs only (F30:290-295 — the CCA Conv1d keeps
torch defaults).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import BatchNorm, Conv, PReLU
from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.nn.resize import resize_linear

__all__ = ["ELANet"]

Dtype = Any


class ConvBNPReLU(fnn.Module):
    n_out: int
    k: int
    stride: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        p = (self.k - 1) // 2
        x = Conv(self.n_out, self.k, strides=self.stride, padding=p,
                 use_bias=False, kernel_init=tinit.kaiming_normal,
                 dtype=self.dtype, name="conv")(x)
        x = BatchNorm(epsilon=1e-3, dtype=self.dtype, name="bn")(
            x, use_running_average=not train
        )
        return PReLU(channels=self.n_out, name="act")(x)


class BNPReLU(fnn.Module):
    n_out: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x = BatchNorm(epsilon=1e-3, dtype=self.dtype, name="bn")(
            x, use_running_average=not train
        )
        return PReLU(channels=self.n_out, name="act")(x)


def _cw_conv(n, k, dilation, dtype, name):
    """channelwise (depthwise) conv, bias-free (F30:52-75)."""
    p = ((k - 1) // 2) * dilation
    return Conv(n, k, padding=p, dilation=dilation, groups=n, use_bias=False,
                kernel_init=tinit.kaiming_normal, dtype=dtype, name=name)


class CCA(fnn.Module):
    """ECA-style channel attention via 1-D conv over pooled descriptor
    (F30:165-181). in/out channel counts set kernel/stride/padding."""

    inchannel: int
    outchannel: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):  # (B, H, W, C)
        k = self.inchannel // 8 - 1
        stride = self.inchannel // self.outchannel
        pad = (self.inchannel // 8 - 2) // 2
        d = x.mean(axis=(1, 2))[..., None]  # (B, C, 1) — channel as length
        w1 = self.param("w1", tinit.torch_default_kernel, (k, 1, 1), jnp.float32)
        w2 = self.param("w2", tinit.torch_default_kernel, (k, 1, 1), jnp.float32)
        dn = jax.lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NWC", "WIO", "NWC"))
        y = jax.lax.conv_general_dilated(
            d.astype(jnp.float32), w1, (stride,), [(pad, pad)], dimension_numbers=dn
        )
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, w2, (1,), [(pad, pad)], dimension_numbers=dn
        )
        y = jax.nn.sigmoid(y)  # (B, C_out, 1)
        return y.transpose(0, 2, 1)[:, None]  # (B, 1, 1, C_out) for NHWC bcast


class SCA(fnn.Module):
    """spatial attention (F30:184-197)."""

    inchannel: int
    outchannel: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        c = self.inchannel // 16
        y = ConvBNPReLU(c, 1, dtype=self.dtype, name="c1")(x, train)
        y = _cw_conv(c, 7, 1, self.dtype, "dw")(y)
        y = BNPReLU(c, dtype=self.dtype, name="bnp")(y, train)
        y = Conv(self.outchannel, 1, kernel_init=tinit.kaiming_normal,
                 dtype=self.dtype, name="out")(y)
        return jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


class ECG_D(fnn.Module):
    """downsampling ECG block (F30:77-108)."""

    n_out: int
    dilation_rate: int = 2
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        y = ConvBNPReLU(self.n_out, 3, 2, dtype=self.dtype, name="conv1x1")(x, train)
        y = ConvBNPReLU(self.n_out, 1, 1, dtype=self.dtype, name="conv1")(y, train)
        loc = _cw_conv(self.n_out, 3, 1, self.dtype, "F_loc")(y)
        sur = _cw_conv(self.n_out, 3, self.dilation_rate, self.dtype, "F_sur")(y)
        j = jnp.concatenate([loc, sur], axis=-1)
        j = BatchNorm(epsilon=1e-3, dtype=self.dtype, name="bn")(
            j, use_running_average=not train
        )
        j = PReLU(channels=2 * self.n_out, name="act")(j)
        j = Conv(self.n_out, 1, use_bias=False,
                 kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                 name="reduce")(j)
        ca = CCA(self.n_out, self.n_out, dtype=self.dtype, name="CA")(j)
        return j * ca


class ECG_R(fnn.Module):
    """residual ECG block (F30:111-147)."""

    n_out: int
    dilation_rate: int = 2
    add: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        n_in = x.shape[-1]
        n = self.n_out // 2
        y = ConvBNPReLU(n, 1, dtype=self.dtype, name="conv1x1")(x, train)
        loc1 = _cw_conv(n, 3, 1, self.dtype, "F_loc1")(y)
        sur1 = _cw_conv(n, 3, self.dilation_rate, self.dtype, "F_sur1")(y)
        x1 = jnp.concatenate([x, loc1 + sur1], axis=-1)
        x1 = BNPReLU(n_in + n, dtype=self.dtype, name="bn_prelu1")(x1, train)
        x1 = x1 * CCA(n_in + n, n_in + n, dtype=self.dtype, name="CA")(x1)
        x2 = ConvBNPReLU(n, 1, dtype=self.dtype, name="conv1")(x1, train)
        loc2 = _cw_conv(n, 3, 1, self.dtype, "F_loc2")(x2)
        sur2 = _cw_conv(n, 3, self.dilation_rate, self.dtype, "F_sur2")(x2)
        x3 = jnp.concatenate([loc2, sur2], axis=-1)
        x4 = BNPReLU(self.n_out, dtype=self.dtype, name="bn_prelu2")(x3, train)
        out = ConvBNPReLU(self.n_out, 1, dtype=self.dtype, name="conv2")(x4, train)
        return x + out if self.add else out


class WDConv(fnn.Module):
    """depthwise conv then BNPReLU (F30:150-162)."""

    n: int
    k: int
    stride: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        p = (self.k - 1) // 2
        y = Conv(self.n, self.k, strides=self.stride, padding=p, groups=self.n,
                 use_bias=False, kernel_init=tinit.kaiming_normal,
                 dtype=self.dtype, name="conv")(x)
        return BNPReLU(self.n, dtype=self.dtype, name="bnpre")(y, train)


class RFF(fnn.Module):
    """multi-scale fusion decoder (F30:201-240). inchann=32, outchann=128."""

    inchann: int = 32
    outchann: int = 128
    k: int = 3
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, xd1, xd2, xb, train: bool = True):
        c = self.inchann
        d1 = WDConv(c, self.k, 2, dtype=self.dtype, name="Xd1_wd")(xd1, train)
        d1 = Conv(c * 2, 1, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                  name="Xd1_pw")(d1)
        d1 = BNPReLU(c * 2, dtype=self.dtype, name="Xd1_bnp")(d1, train)

        d2 = WDConv(c * 2, self.k, 1, dtype=self.dtype, name="Xd2_wd")(xd2, train)
        d2 = d1 + d2
        d2 = WDConv(c * 2, self.k, 1, dtype=self.dtype, name="Xd2_1_wd")(d2, train)
        d2 = Conv(c * 2, 1, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                  name="Xd2_1_pw")(d2)
        d2 = BNPReLU(c * 2, dtype=self.dtype, name="Xd2_1_bnp")(d2, train)

        b = Conv(c * 2, 1, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                 name="Xb_1")(xb)
        b = resize_linear(b, d2.shape[1:3], align_corners=False)

        xcat = jnp.concatenate([b, d2], axis=-1)  # 128 ch
        ca = CCA(128, 64, dtype=self.dtype, name="CA")(xcat)
        sa = SCA(128, 64, dtype=self.dtype, name="SA")(xcat, train)
        out1 = b * (sa + 1)
        out2 = d2 * (ca + 1)
        out = jnp.concatenate([out1, out2], axis=-1)
        return BNPReLU(self.outchann, dtype=self.dtype, name="bnpre")(out, train)


class ELANet(fnn.Module):
    classes: int = 1
    M: int = 2
    N: int = 5
    dropout_flag: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        cdtype = dt or x.dtype
        y = jnp.moveaxis(x, 1, -1).astype(cdtype)
        in_hw = y.shape[1:3]
        det = not train

        y0 = ConvBNPReLU(32, 3, 2, dtype=dt, name="level1_0")(y, train)
        y0 = ConvBNPReLU(32, 3, 1, dtype=dt, name="level1_1")(y0, train)
        y0 = ConvBNPReLU(32, 3, 1, dtype=dt, name="level1_2")(y0, train)
        y0_cat = BNPReLU(32, dtype=dt, name="b1")(y0, train)

        y1_0 = ECG_D(64, 2, dtype=dt, name="level2_0")(y0_cat, train)
        y1 = y1_0
        for i in range(self.M):
            y1 = ECG_R(64, 2, dtype=dt, name=f"level2_r{i}")(y1, train)
        y1_cat = BNPReLU(128, dtype=dt, name="bn_prelu_2")(
            jnp.concatenate([y1, y1_0], axis=-1), train
        )

        y2_0 = ECG_D(128, 4, dtype=dt, name="level3_0")(y1_cat, train)
        y2 = y2_0
        dilation_block = [4, 4, 4, 4, 4, 8, 8, 8, 8]
        for i in range(2 * self.N - 1):
            y2 = ECG_R(128, dilation_block[i], dtype=dt, name=f"level3_r{i}")(y2, train)
        y2_cat = BNPReLU(256, dtype=dt, name="bn_prelu_3")(
            jnp.concatenate([y2_0, y2], axis=-1), train
        )

        out = RFF(32, 128, 3, dtype=dt, name="decode")(y0_cat, y1, y2_cat, train)
        out = fnn.Dropout(0.5, name="drop")(out, deterministic=det)
        if self.dropout_flag:
            out = fnn.Dropout(0.1, broadcast_dims=(1, 2), name="cls_drop")(
                out, deterministic=det
            )
        out = Conv(self.classes, 1, use_bias=False,
                   kernel_init=tinit.kaiming_normal, dtype=dt,
                   name="classifier")(out)
        out = resize_linear(out, in_hw, align_corners=False)
        out = jax.nn.sigmoid(out.astype(jnp.float32))
        return jnp.moveaxis(out, -1, 1)
