"""Segformer — MiT hierarchical encoder + all-MLP decoder
(reference: segformer.py:171-216, lucidrains-style implementation).

Reference structure:
  * 4 stages with (kernel, stride, pad) = (7,4,3),(3,2,1),(3,2,1),(3,2,1);
    the reference's Unfold + 1x1-conv overlap patch embed
    (segformer.py:120-121) is mathematically a plain Conv2d with that
    kernel/stride/pad (unfold orders the patch vector (c, kh, kw), exactly
    conv-kernel layout) — implemented as such;
  * channel-wise LayerNorm with eps OUTSIDE the sqrt and biased variance
    (segformer.py:30-40) — quirk preserved;
  * EfficientSelfAttention with spatial-reduction kv conv (ratios 8/4/2/1)
    and bias-free projections (segformer.py:51-79);
  * MixFeedForward: 1x1 -> depthwise 3x3 -> GELU -> 1x1 (segformer.py:81-98);
  * decoder: per-stage 1x1 conv to 256 ch + bilinear (align_corners=False!)
    to 224, concat, two 1x1 convs, sigmoid (segformer.py:199-216).

``F32_SEGFORMER.py`` is an orphan debug variant of the same model —
nothing in the pipeline imports it. ``debug_variant=True`` rebuilds it:
nearest ``scale_factor=2**i`` fusion upsampling (every stage lands at the
stride-4 grid, so the output is H/4 x W/4, NOT 224 — the reason the
variant cannot train against 224 masks), split ``to_segmentation1/2``
head, raw logits with no sigmoid, and the F32:205-212 shape prints
(emitted at trace time; shapes are static under jit).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import Conv
from corrifnet_tpu.nn.resize import resize_linear, resize_nearest

__all__ = ["Segformer"]

Dtype = Any


class ChannelNorm(fnn.Module):
    """The reference's conv-LayerNorm: per-pixel channel norm with biased
    std and eps outside the sqrt (segformer.py:30-40). Channels-last."""

    epsilon: float = 1e-5
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("g", fnn.initializers.ones, (dim,), jnp.float32)
        b = self.param("b", fnn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) / (jnp.sqrt(var) + self.epsilon) * g + b
        return y.astype(self.dtype or x.dtype)


class EfficientSelfAttention(fnn.Module):
    dim: int
    heads: int
    reduction_ratio: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        heads = self.heads
        hd = c // heads
        scale = hd ** -0.5

        q = Conv(c, 1, use_bias=False, dtype=self.dtype, name="to_q")(x)
        r = self.reduction_ratio
        kv = Conv(
            c * 2, r, strides=r, use_bias=False, dtype=self.dtype, name="to_kv"
        )(x)
        k, v = jnp.split(kv, 2, axis=-1)
        hk, wk = k.shape[1], k.shape[2]

        # 'b (h c) x y -> (b h) (x y) c' on NCHW == head-major channel split;
        # channels-last split gives (c_per_head, head)? No: torch chunks the
        # channel dim head-major, and our channel axis has the same order.
        def to_heads(t, hh, ww):
            t = t.reshape(b, hh * ww, heads, hd)
            return t.transpose(0, 2, 1, 3)  # (B, heads, N, hd)

        qh = to_heads(q, h, w)
        kh = to_heads(k, hk, wk)
        vh = to_heads(v, hk, wk)
        sim = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * scale
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(qh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return Conv(c, 1, use_bias=False, dtype=self.dtype, name="to_out")(out)


class MixFeedForward(fnn.Module):
    dim: int
    expansion_factor: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        hidden = self.dim * self.expansion_factor
        y = Conv(hidden, 1, dtype=self.dtype, name="fc1")(x)
        y = Conv(
            hidden, 3, padding=1, groups=hidden, dtype=self.dtype, name="dw"
        )(y)
        y = Conv(hidden, 1, dtype=self.dtype, name="pw")(y)
        y = jax.nn.gelu(y, approximate=False)
        return Conv(self.dim, 1, dtype=self.dtype, name="fc2")(y)


class Segformer(fnn.Module):
    dims: Tuple[int, ...] = (32, 64, 160, 256)
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    ff_expansion: Tuple[int, ...] = (8, 8, 4, 4)
    reduction_ratio: Tuple[int, ...] = (8, 4, 2, 1)
    num_layers: int = 2
    decoder_dim: int = 256
    num_classes: int = 1
    out_size: Tuple[int, int] = (224, 224)
    debug_variant: bool = False  # the orphan F32_SEGFORMER.py rebuild
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN/dropout in this architecture
        cdtype = self.dtype or x.dtype
        y = jnp.moveaxis(x, 1, -1).astype(cdtype)  # NCHW -> NHWC

        stage_ksp = ((7, 4, 3), (3, 2, 1), (3, 2, 1), (3, 2, 1))
        outputs = []
        for si, (dim, (k, s, p), nh, ffe, rr) in enumerate(
            zip(self.dims, stage_ksp, self.heads, self.ff_expansion,
                self.reduction_ratio)
        ):
            # unfold + 1x1 embed == overlapping-patch conv (see docstring)
            y = Conv(dim, k, strides=s, padding=p, dtype=self.dtype,
                     name=f"s{si}_embed")(y)
            for li in range(self.num_layers):
                a = ChannelNorm(dtype=self.dtype, name=f"s{si}_l{li}_norm1")(y)
                y = EfficientSelfAttention(
                    dim=dim, heads=nh, reduction_ratio=rr, dtype=self.dtype,
                    name=f"s{si}_l{li}_attn",
                )(a) + y
                f = ChannelNorm(dtype=self.dtype, name=f"s{si}_l{li}_norm2")(y)
                y = MixFeedForward(
                    dim=dim, expansion_factor=ffe, dtype=self.dtype,
                    name=f"s{si}_l{li}_ff",
                )(f) + y
            outputs.append(y)

        fused = []
        for si, o in enumerate(outputs):
            f = Conv(self.decoder_dim, 1, dtype=self.dtype, name=f"fuse{si}")(o)
            if self.debug_variant:
                # nn.Upsample(scale_factor=2**i), torch default mode =
                # nearest (F32_SEGFORMER.py:190): everything lands at the
                # stage-0 (stride-4) grid, not out_size.
                f = resize_nearest(
                    f, tuple(s * 2 ** si for s in f.shape[1:-1]))
            else:
                f = resize_linear(f, self.out_size, align_corners=False)
            fused.append(f)
        f = jnp.concatenate(fused, axis=-1)
        if self.debug_variant:
            print(tuple(f.shape))  # F32:207 — trace-time, shapes static
        f = Conv(self.decoder_dim, 1, dtype=self.dtype, name="seg1")(f)
        if self.debug_variant:
            print("Output Size after Conv1:", tuple(f.shape))  # F32:209
        f = Conv(self.num_classes, 1, dtype=self.dtype, name="seg2")(f)
        if self.debug_variant:
            print("Output Size after Conv2:", tuple(f.shape))  # F32:211
            return jnp.moveaxis(f.astype(jnp.float32), -1, 1)  # raw logits
        out = jax.nn.sigmoid(f.astype(jnp.float32))
        return jnp.moveaxis(out, -1, 1)
