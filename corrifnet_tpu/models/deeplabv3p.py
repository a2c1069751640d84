"""DeepLabV3+ with Aligned-Xception backbone
(reference: F14_DEEPLABV3PLUS_V4_xception.py:445-494).

Backbone (F14:111-229): modified aligned Xception at output stride 16 —
entry conv1/conv2, blocks 1-3 (stride 2 each; block1's output is the
low-level feature), 16 middle-flow blocks (728 ch, rate 1), exit block20 +
three dilated (rate 2) separable convs to 2048 ch. Separable convs use
TF-style ``fixed_padding`` (F14:29-35) and are bias-free; backbone convs are
kaiming-normal initialized (F14:231-239).

Head (F14:451-494): 4-rate ASPP (1/6/12/18) + global-max image pool, 1x1
fuse to 256 (+BN/ReLU/Dropout0.5), bilinear x4 (align_corners=False, torch
F.upsample default), concat with reduced (48 ch) low-level features, two
3x3 convs, 1x1 classifier, bilinear x4, sigmoid.

``pretrained=True`` in the reference loads xception weights from a
hard-coded absolute Windows path (F14:244) absent from the snapshot — here
it is accepted and ignored with the same effective init (kaiming-normal).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import BatchNorm, Conv
from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.nn.resize import resize_linear, resize_nearest

__all__ = ["DeepLabV3Plus"]

Dtype = Any


class SeparableConvSame(fnn.Module):
    """Depthwise 3x3 (TF fixed padding) + pointwise 1x1, bias-free
    (F14:38-51)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, r = 3, self.dilation
        eff = k + (k - 1) * (r - 1)
        pad_beg = (eff - 1) // 2
        pad_end = (eff - 1) - pad_beg
        x = jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))
        x = Conv(
            in_ch, 3, strides=self.stride, padding=0, dilation=r,
            groups=in_ch, use_bias=False, kernel_init=tinit.kaiming_normal,
            dtype=self.dtype, name="dw",
        )(x)
        return Conv(
            self.planes, 1, use_bias=False, kernel_init=tinit.kaiming_normal,
            dtype=self.dtype, name="pw",
        )(x)


class XBlock(fnn.Module):
    """Xception block (F14:54-108)."""

    planes: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        inp = x
        in_ch = x.shape[-1]
        # each op: (pre_relu, has_bn, planes, stride, dilation)
        ops = []
        filters = in_ch
        if self.grow_first:
            ops.append([True, True, self.planes, 1, self.dilation])
            filters = self.planes
        for _ in range(self.reps - 1):
            ops.append([True, True, filters, 1, self.dilation])
        if not self.grow_first:
            ops.append([True, True, self.planes, 1, self.dilation])
        if not self.start_with_relu:
            ops[0][0] = False  # drops only the leading ReLU (F14:84-85)
        # trailing convs appended bare — no relu, no bn (F14:87-91)
        if self.stride != 1:
            ops.append([False, False, self.planes, 2, 1])
        if self.stride == 1 and self.is_last:
            ops.append([False, False, self.planes, 1, 1])

        y = x
        for i, (pre_relu, has_bn, planes, stride, dil) in enumerate(ops):
            if pre_relu:
                y = jax.nn.relu(y)
            y = SeparableConvSame(
                planes, stride, dil, dtype=self.dtype, name=f"sep{i}"
            )(y)
            if has_bn:
                y = BatchNorm(dtype=self.dtype, name=f"bn{i}")(
                    y, use_running_average=not train
                )

        # Reference quirk (F14:94-107): ``self.rep``'s leading
        # nn.ReLU(inplace=True) mutates the block INPUT tensor before the
        # skip branch reads it — so whenever the rep starts with a ReLU,
        # both the conv-skip and the identity residual consume relu(inp),
        # not inp. Torch-parity tested.
        if ops[0][0]:
            inp = jax.nn.relu(inp)
        if self.planes != in_ch or self.stride != 1:
            skip = Conv(
                self.planes, 1, strides=self.stride, use_bias=False,
                kernel_init=tinit.kaiming_normal, dtype=self.dtype, name="skip",
            )(inp)
            skip = BatchNorm(dtype=self.dtype, name="skipbn")(
                skip, use_running_average=not train
            )
        else:
            skip = inp
        return y + skip


class Xception(fnn.Module):
    """Aligned Xception, os=16 (F14:111-229). Returns (x, low_level)."""

    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype

        def bn(y, name):
            return BatchNorm(dtype=dt, name=name)(y, use_running_average=not train)

        y = Conv(32, 3, strides=2, padding=1, use_bias=False,
                 kernel_init=tinit.kaiming_normal, dtype=dt, name="conv1")(x)
        y = jax.nn.relu(bn(y, "bn1"))
        y = Conv(64, 3, padding=1, use_bias=False,
                 kernel_init=tinit.kaiming_normal, dtype=dt, name="conv2")(y)
        y = jax.nn.relu(bn(y, "bn2"))

        y = XBlock(128, 2, stride=2, start_with_relu=False, dtype=dt,
                   name="block1")(y, train)
        # The reference aliases low_level_feat to block1's output tensor
        # (F14:188-190) and block2's leading nn.ReLU(inplace=True) then
        # mutates it IN PLACE — so the decoder actually consumes
        # relu(block1_out). Quirk preserved (torch-parity tested).
        low_level = jax.nn.relu(y)
        y = XBlock(256, 2, stride=2, dtype=dt, name="block2")(y, train)
        y = XBlock(728, 2, stride=2, is_last=True, dtype=dt, name="block3")(y, train)
        for i in range(4, 20):
            y = XBlock(728, 3, dtype=dt, name=f"block{i}")(y, train)
        y = XBlock(1024, 2, grow_first=False, is_last=True, dtype=dt,
                   name="block20")(y, train)

        for i, ch in ((3, 1536), (4, 1536), (5, 2048)):
            y = SeparableConvSame(ch, 1, 2, dtype=dt, name=f"conv{i}")(y)
            y = jax.nn.relu(bn(y, f"bn{i}"))
        return y, low_level


class DeepLabV3Plus(fnn.Module):
    num_classes: int = 1
    small: bool = True
    pretrained: bool = False  # accepted for API parity; weights unavailable
    drop_rate: float = 0.5  # head dropout (reference hard-codes 0.5)
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        cdtype = dt or x.dtype
        y = jnp.moveaxis(x, 1, -1).astype(cdtype)
        det = not train

        feat, low = Xception(dtype=dt, name="xception")(y, train)

        def bn(y, name):
            return BatchNorm(dtype=dt, name=name)(y, use_running_average=not train)

        # ASPP (F14:451-457): dilated 3x3 convs + BN, plus global max pool.
        branches = []
        for i, rate in enumerate([1, 6, 12, 18]):
            a = Conv(256, 3, padding=rate, dilation=rate, dtype=dt,
                     name=f"aspp{i + 1}")(feat)
            branches.append(bn(a, f"aspp{i + 1}_bn"))
        pool = feat.max(axis=(1, 2), keepdims=True)
        pool = Conv(256, 1, dtype=dt, name="image_pool")(pool)
        pool = resize_nearest(pool, feat.shape[1:3])
        branches.append(pool)

        f = jnp.concatenate(branches, axis=-1)  # 1280
        f = Conv(256, 1, dtype=dt, name="fc1")(f)
        f = jax.nn.relu(bn(f, "fc1_bn"))
        f = fnn.Dropout(self.drop_rate, name="fc1_drop")(f, deterministic=det)
        f = resize_linear(
            f, (f.shape[1] * 4, f.shape[2] * 4), align_corners=False
        )

        lo = Conv(48, 1, dtype=dt, name="reduce_conv2")(low)
        lo = jax.nn.relu(bn(lo, "reduce_bn"))
        lo = fnn.Dropout(self.drop_rate, name="reduce_drop")(lo, deterministic=det)

        f = jnp.concatenate([f, lo], axis=-1)  # 304
        for i in range(2):
            f = Conv(256, 3, padding=1, dtype=dt, name=f"last_conv{i}")(f)
            f = jax.nn.relu(bn(f, f"last_bn{i}"))
            f = fnn.Dropout(self.drop_rate, name=f"last_drop{i}")(f, deterministic=det)
        f = Conv(self.num_classes, 1, dtype=dt, name="classifier")(f)
        f = resize_linear(
            f, (f.shape[1] * 4, f.shape[2] * 4), align_corners=False
        )
        out = jax.nn.sigmoid(f.astype(jnp.float32))
        return jnp.moveaxis(out, -1, 1)
