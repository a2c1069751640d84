"""Orphan component libraries (reference: utils.py + model_utils.py —
present in the reference repo but imported by nothing in it; SURVEY §2.2).

Rebuilt as a reusable block library for architecture experiments:
  * PIDNet blocks (model_utils.py:12-378): BasicBlock2d / Bottleneck2d /
    SegmentHead / DAPPM / PagFM / Bag — the proportion-attention fusion and
    deep-aggregation pyramid pooling modules;
  * CrossViT blocks (utils.py:415-542): CrossAttention (CLS-token queries
    all tokens) and CrossAttentionBlock.

The Swin blocks that utils.py also carries (WindowAttention /
SwinTransformerBlock / PatchMerging / BasicLayer, utils.py:70-413) live in
``corrifnet_tpu.models.multisenseseg`` (WindowAttention, BasicBlock,
PatchMerging, SwinBackbone) where they are actually exercised — re-exported
here for library completeness.

All channels-last; torch-default inits.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import BatchNorm, Conv, Dense, LayerNorm, avg_pool
from corrifnet_tpu.nn.resize import resize_linear

# Swin family re-exports (exercised implementations)
from corrifnet_tpu.models.multisenseseg import (  # noqa: F401
    BasicBlock as SwinBlock,
    PatchMerging,
    WindowAttention,
)

__all__ = [
    "BasicBlock2d",
    "Bottleneck2d",
    "SegmentHead",
    "DAPPM",
    "PAPPM",
    "PagFM",
    "Bag",
    "CrossAttention",
    "CrossAttentionBlock",
    "Block",
    "MultiScaleBlock",
    "SwinBlock",
    "PatchMerging",
    "WindowAttention",
]

Dtype = Any


class BasicBlock2d(fnn.Module):
    """PIDNet BasicBlock (model_utils.py:12-46)."""

    planes: int
    stride: int = 1
    no_relu: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = Conv(self.planes, 3, strides=self.stride, padding=1,
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = Conv(self.planes, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="conv2")(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = Conv(self.planes, 1, strides=self.stride, use_bias=False,
                            dtype=self.dtype, name="down_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="down_bn")(
                residual, use_running_average=not train
            )
        out = y + residual
        return out if self.no_relu else jax.nn.relu(out)


class Bottleneck2d(fnn.Module):
    """PIDNet Bottleneck, expansion 2 (model_utils.py:48-87)."""

    planes: int
    stride: int = 1
    no_relu: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        out_ch = self.planes * 2
        residual = x

        def bn(y, name):
            return BatchNorm(dtype=self.dtype, name=name)(
                y, use_running_average=not train
            )

        y = jax.nn.relu(bn(Conv(self.planes, 1, use_bias=False,
                                dtype=self.dtype, name="conv1")(x), "bn1"))
        y = jax.nn.relu(bn(Conv(self.planes, 3, strides=self.stride, padding=1,
                                use_bias=False, dtype=self.dtype,
                                name="conv2")(y), "bn2"))
        y = bn(Conv(out_ch, 1, use_bias=False, dtype=self.dtype,
                    name="conv3")(y), "bn3")
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = bn(Conv(out_ch, 1, strides=self.stride, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x), "down_bn")
        out = y + residual
        return out if self.no_relu else jax.nn.relu(out)


class SegmentHead(fnn.Module):
    """segmenthead (model_utils.py:89-112): BN-ReLU-conv3 -> BN-ReLU-conv1
    with optional bilinear scale-up."""

    interplanes: int
    outplanes: int
    scale_factor: Optional[int] = None
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        y = BatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        y = Conv(self.interplanes, 3, padding=1, use_bias=False,
                 dtype=self.dtype, name="conv1")(jax.nn.relu(y))
        z = BatchNorm(dtype=self.dtype, name="bn2")(y, use_running_average=not train)
        out = Conv(self.outplanes, 1, dtype=self.dtype, name="conv2")(jax.nn.relu(z))
        if self.scale_factor is not None:
            h = y.shape[1] * self.scale_factor
            w = y.shape[2] * self.scale_factor
            out = resize_linear(out, (h, w), align_corners=False)
        return out


class DAPPM(fnn.Module):
    """Deep-aggregation pyramid pooling (model_utils.py:114-194)."""

    branch_planes: int
    outplanes: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        h, w = x.shape[1], x.shape[2]
        dt = self.dtype

        def bn_relu_conv(y, ch, k, name):
            y = BatchNorm(dtype=dt, name=f"{name}_bn")(y, use_running_average=not train)
            y = jax.nn.relu(y)
            return Conv(ch, k, padding=k // 2, use_bias=False, dtype=dt,
                        name=f"{name}_conv")(y)

        pools = [
            x,
            avg_pool(x, (5, 5), (2, 2), (2, 2)),
            avg_pool(x, (9, 9), (4, 4), (4, 4)),
            avg_pool(x, (17, 17), (8, 8), (8, 8)),
            x.mean(axis=(1, 2), keepdims=True),
        ]
        outs = [bn_relu_conv(pools[0], self.branch_planes, 1, "scale0")]
        for i in range(1, 5):
            s = bn_relu_conv(pools[i], self.branch_planes, 1, f"scale{i}")
            s = resize_linear(s, (h, w), align_corners=False)
            outs.append(
                bn_relu_conv(s + outs[i - 1], self.branch_planes, 3, f"process{i}")
            )
        comp = bn_relu_conv(
            jnp.concatenate(outs, axis=-1), self.outplanes, 1, "compression"
        )
        short = bn_relu_conv(x, self.outplanes, 1, "shortcut")
        return comp + short


class PAPPM(fnn.Module):
    """Parallel-aggregation pyramid pooling (model_utils.py:196-266).

    Same pooling pyramid as DAPPM, but the four pooled branches are
    upsampled, residually added to the stride-1 branch and then processed
    in PARALLEL by ONE grouped 3x3 conv (groups=4) — PIDNet's faster PPM
    variant. Pool sizes/strides, BN->ReLU->conv ordering, bilinear
    align_corners=False (algc, model_utils.py:10) and the
    compression/shortcut sum match the reference."""

    branch_planes: int
    outplanes: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        h, w = x.shape[1], x.shape[2]
        dt = self.dtype

        def bn_relu_conv(y, ch, k, name, groups=1):
            y = BatchNorm(dtype=dt, name=f"{name}_bn")(
                y, use_running_average=not train
            )
            y = jax.nn.relu(y)
            return Conv(ch, k, padding=k // 2, groups=groups, use_bias=False,
                        dtype=dt, name=f"{name}_conv")(y)

        x_ = bn_relu_conv(x, self.branch_planes, 1, "scale0")
        pools = [
            avg_pool(x, (5, 5), (2, 2), (2, 2)),
            avg_pool(x, (9, 9), (4, 4), (4, 4)),
            avg_pool(x, (17, 17), (8, 8), (8, 8)),
            x.mean(axis=(1, 2), keepdims=True),
        ]
        scales = [
            resize_linear(
                bn_relu_conv(p, self.branch_planes, 1, f"scale{i + 1}"),
                (h, w), align_corners=False,
            ) + x_
            for i, p in enumerate(pools)
        ]
        scale_out = bn_relu_conv(
            jnp.concatenate(scales, axis=-1), self.branch_planes * 4, 3,
            "scale_process", groups=4,
        )
        comp = bn_relu_conv(
            jnp.concatenate([x_, scale_out], axis=-1), self.outplanes, 1,
            "compression",
        )
        return comp + bn_relu_conv(x, self.outplanes, 1, "shortcut")


class PagFM(fnn.Module):
    """Pixel-attention-guided fusion (model_utils.py:268-312)."""

    mid_channels: int
    after_relu: bool = False
    with_channel: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, y, train: bool = True):
        in_ch = x.shape[-1]
        hw = x.shape[1:3]
        if self.after_relu:
            x, y = jax.nn.relu(x), jax.nn.relu(y)

        def conv_bn(t, ch, name):
            t = Conv(ch, 1, use_bias=False, dtype=self.dtype,
                     name=f"{name}_conv")(t)
            return BatchNorm(dtype=self.dtype, name=f"{name}_bn")(
                t, use_running_average=not train
            )

        y_q = resize_linear(conv_bn(y, self.mid_channels, "f_y"), hw,
                            align_corners=False)
        x_k = conv_bn(x, self.mid_channels, "f_x")
        if self.with_channel:
            sim = jax.nn.sigmoid(conv_bn(x_k * y_q, in_ch, "up"))
        else:
            sim = jax.nn.sigmoid((x_k * y_q).sum(axis=-1, keepdims=True))
        y_up = resize_linear(y, hw, align_corners=False)
        return (1 - sim) * x + sim * y_up


class Bag(fnn.Module):
    """Boundary-attention-guided fusion (model_utils.py:363-378)."""

    out_channels: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, p, i, d, train: bool = True):
        edge = jax.nn.sigmoid(d)
        y = edge * p + (1 - edge) * i
        y = BatchNorm(dtype=self.dtype, name="bn")(y, use_running_average=not train)
        return Conv(self.out_channels, 3, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(jax.nn.relu(y))


class CrossAttention(fnn.Module):
    """CrossViT CLS-token attention (utils.py:415-444): the first token
    queries all tokens; output is the updated CLS token."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = hd ** -0.5
        q = Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="wq")(
            x[:, 0:1]
        ).reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="wk")(
            x
        ).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="wv")(
            x
        ).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            (jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale).astype(jnp.float32),
            axis=-1,
        ).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)
        return Dense(c, dtype=self.dtype, name="proj")(out)


class Block(fnn.Module):
    """Standard pre-norm ViT block — timm's ``Block``, which the
    reference's MultiScaleBlock instantiates via
    ``from timm.models.vision_transformer import Block`` (utils.py:8):
    LN -> MHSA (fused qkv, scale head_dim^-0.5, output proj) -> residual,
    LN -> MLP (fc1 -> GELU -> fc2) -> residual."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = hd ** -0.5
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(y)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            (jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale).astype(jnp.float32),
            axis=-1,
        ).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + Dense(c, dtype=self.dtype, name="proj")(out)
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                  name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class CrossAttentionBlock(fnn.Module):
    """utils.py:446-468: pre-norm CLS cross-attention with residual on the
    CLS token (the block's output is the 1-token CLS stream)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    has_mlp: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        normed = LayerNorm(dtype=self.dtype, name="norm1")(x)
        cls = x[:, 0:1] + CrossAttention(
            self.dim, self.num_heads, self.qkv_bias, dtype=self.dtype,
            name="attn",
        )(normed, deterministic)
        if self.has_mlp:
            y = LayerNorm(dtype=self.dtype, name="norm2")(cls)
            y = Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                      name="fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Dense(self.dim, dtype=self.dtype, name="fc2")(y)
            cls = cls + y
        return cls


class MultiScaleBlock(fnn.Module):
    """CrossViT multi-scale token fusion (utils.py:470-542): each branch's
    CLS token is projected into the next branch's width, cross-attends over
    that branch's patch tokens, and is reverted onto its own patch tokens.

    Reference quirks, preserved and documented:
      * the identity shortcut for equal-width projections is disabled by a
        literal ``and False`` (utils.py:493,518) — norm->GELU->linear is
        always built;
      * fusion block i is parameterized by ``mlp_ratio[i]`` (the OUTER
        branch index) while running at branch (i+1)'s width — moot, since
        ``has_mlp=False``;
      * ``depth[-1] == 0`` still builds ONE fusion block ("backward
        capability", utils.py:505-508);
      * the per-branch transformer ``Block``s run AFTER the fusion with
        ``zip`` silently aligning ``outs`` to the branches whose depth is
        nonzero, and their outputs are DISCARDED — forward returns ``outs``
        (utils.py:541-542). The parameters are still created here (and the
        dead compute traced — XLA DCEs it under jit) so the param tree
        matches the reference's state-dict; on a width-mismatched zip
        alignment (some-but-not-all depths zero — where torch itself would
        fault) the dead blocks run on 1-token dummies of the right width.
      * as committed the reference file cannot even import without timm
        (``Block``, utils.py:8 — see ``extras.Block``), and the all-depths-
        zero case crashes on ``zip(outs, None)`` (utils.py:541).
    """

    dims: tuple
    depths: tuple  # per-branch Block depths; depths[-1] = fusion depth
    num_heads: tuple
    mlp_ratios: tuple
    qkv_bias: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, xs, deterministic: bool = True):
        nb = len(self.dims)
        proj_cls = []
        for d in range(nb):
            y = LayerNorm(dtype=self.dtype, name=f"proj{d}_norm")(
                xs[d][:, 0:1]
            )
            y = jax.nn.gelu(y, approximate=False)
            proj_cls.append(
                Dense(self.dims[(d + 1) % nb], dtype=self.dtype,
                      name=f"proj{d}_fc")(y)
            )
        outs = []
        for i in range(nb):
            i1 = (i + 1) % nb
            tmp = jnp.concatenate([proj_cls[i], xs[i1][:, 1:]], axis=1)
            for j in range(max(self.depths[-1], 1)):
                tmp = CrossAttentionBlock(
                    self.dims[i1], self.num_heads[i1],
                    mlp_ratio=self.mlp_ratios[i], qkv_bias=self.qkv_bias,
                    has_mlp=False, dtype=self.dtype, name=f"fusion{i}_{j}",
                )(tmp, deterministic)
            y = LayerNorm(dtype=self.dtype, name=f"revert{i}_norm")(
                tmp[:, 0:1]
            )
            y = jax.nn.gelu(y, approximate=False)
            y = Dense(self.dims[i], dtype=self.dtype,
                      name=f"revert{i}_fc")(y)
            outs.append(jnp.concatenate([y, xs[i][:, 1:]], axis=1))
        # dead per-branch refinement (see docstring): params created for
        # state-dict parity, results discarded like the reference's outs_b
        live = [d for d in range(nb) if self.depths[d] > 0]
        for k, d in enumerate(live):
            z = outs[k]
            if z.shape[-1] != self.dims[d]:
                z = jnp.zeros((z.shape[0], 1, self.dims[d]), z.dtype)
            for i in range(self.depths[d]):
                z = Block(self.dims[d], self.num_heads[d],
                          mlp_ratio=self.mlp_ratios[d],
                          qkv_bias=self.qkv_bias, dtype=self.dtype,
                          name=f"block{d}_{i}")(z, deterministic)
        return outs
