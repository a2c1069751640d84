"""UNetV2 — dropout-modified classic UNet (reference: F9_UNET_V2_3.py).

Structure (F9:113-141): inconv(3->64), 4 down paths (maxpool2 + Dropout(0.5)
+ double_conv), 4 up paths (bilinear x2 align_corners=True upsample +
Dropout(0.5) after concat + double_conv), 1x1 outconv, sigmoid. The
ConvTranspose2d branch exists but ``bilinear=True`` default means it is
never used (F9:74-78) — dead params omitted, documented.

Input: 4-D (B, 3, H, W) reference layout -> output (B, classes, H, W)
sigmoid probabilities. Internally channels-last NHWC.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import BatchNorm, Conv, max_pool
from corrifnet_tpu.nn.resize import resize_linear

__all__ = ["UNetV2"]

Dtype = Any


class DoubleConv(fnn.Module):
    """(conv3x3 -> BN -> ReLU) * 2 (F9:19-37)."""

    out_ch: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        for i in range(2):
            x = Conv(self.out_ch, 3, padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"bn{i}")(
                x, use_running_average=not train
            )
            x = jax.nn.relu(x)
        return x


class UNetV2(fnn.Module):
    classes: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        cdtype = self.dtype or x.dtype
        y = jnp.moveaxis(x, 1, -1).astype(cdtype)  # NCHW -> NHWC
        det = not train

        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(y, train)
        feats = [x1]
        for i, ch in enumerate([128, 256, 512, 512]):
            d = max_pool(feats[-1], (2, 2), (2, 2))
            d = fnn.Dropout(0.5, name=f"down{i + 1}_drop")(d, deterministic=det)
            d = DoubleConv(ch, dtype=self.dtype, name=f"down{i + 1}")(d, train)
            feats.append(d)
        x1, x2, x3, x4, x5 = feats

        def up(a, skip, ch, name):
            h, w = a.shape[1] * 2, a.shape[2] * 2
            a = resize_linear(a, (h, w), align_corners=True)
            # torch pads a to skip's size; with power-of-two inputs they match
            dh, dw = skip.shape[1] - a.shape[1], skip.shape[2] - a.shape[2]
            if dh or dw:
                a = jnp.pad(
                    a,
                    ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
                )
            cat = jnp.concatenate([skip, a], axis=-1)
            cat = fnn.Dropout(0.5, name=f"{name}_drop")(cat, deterministic=det)
            return DoubleConv(ch, dtype=self.dtype, name=name)(cat, train)

        u = up(x5, x4, 256, "up1")
        u = up(u, x3, 128, "up2")
        u = up(u, x2, 64, "up3")
        u = up(u, x1, 64, "up4")
        out = Conv(self.classes, 1, dtype=self.dtype, name="outc")(u)
        out = jax.nn.sigmoid(out.astype(jnp.float32))
        return jnp.moveaxis(out, -1, 1)  # NHWC -> NCHW
