"""Inflated ResNet50 3-D encoder (reference: mmvit4.py:83-212 Encoder /
Bottleneck3D / inflate_conv).

The reference builds a torchvision ResNet50, inflates its 2-D convs to
Conv3d (stem kernel (3,7,7) stride (1,2,2); every bottleneck conv with
time_dim=1) and adds per-level 1x1 ``adapt`` convs plus a multiscale ``x6``
bottleneck. Two load-bearing quirks are preserved:

  * the stem applies conv -> ReLU -> BatchNorm in that order
    (``self.e1_bn(self.e1_relu(x1))``, mmvit4.py:173);
  * although the encoder is built from *pretrained* weights, MMVit4's
    constructor immediately re-initializes every Conv3d with kaiming-normal
    (mmvit4.py:437-439), so the effective init is kaiming-normal — which is
    the default here. A converted-weight loading path can override params
    for experiments that skip the re-init.

TPU-first: all activations are channels-last (B, D, H, W, C); bottleneck
convs have depth-kernel 1 and are automatically folded into big batched 2-D
convs by ``nn.Conv`` (depth folded into batch), which is how a depth-3
volume maps efficiently onto the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn
from jax.ad_checkpoint import checkpoint_name

from corrifnet_tpu.nn import BatchNorm, Conv, max_pool, resize_linear
from corrifnet_tpu.nn.fusedbn import fused_pointwise_conv_bn
from corrifnet_tpu.nn import init as tinit

__all__ = ["ResNet3DEncoder", "PackedStage1", "pack_stage1_variables", "BASIC_DIMS"]

BASIC_DIMS = 8  # mmvit4.py:10
# ResNet50: (blocks, width) per layer, expansion 4 (torchvision resnet50).
_LAYERS = ((3, 64), (4, 128), (6, 256), (3, 512))
_EXPANSION = 4

Dtype = Any


def _remat_policy(mode: str):
    names = ("bn_stats", "mid_acts") if mode == "mid" else ("bn_stats",)
    return jax.checkpoint_policies.save_only_these_names(*names)


class Bottleneck3D(fnn.Module):
    """1x1 reduce -> (1,3,3) spatial -> 1x1 expand, residual (mmvit4.py:196-212).

    ``modalities=M`` runs the packed modality-in-channels form: activations
    carry M streams on the channel axis and every conv is the
    block-diagonal ``Conv(modalities=M)``; BatchNorm is per-channel, so it
    is per-(stream, channel) automatically in the packed layout.
    """

    width: int
    stride: int = 1
    has_downsample: bool = False
    modalities: int = 1
    fuse_expand_bn: bool = False  # fold bn3/down_bn into their convs
    pallas_fused: bool = False  # ops/fusedconv.py kernel path (see _fused)
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        if self.pallas_fused:
            return self._fused(x, train)
        m = self.modalities
        mid_ch = self.width * m
        out_ch = self.width * _EXPANSION * m
        identity = x
        y = Conv(
            mid_ch, (1, 1, 1), use_bias=False, modalities=m,
            kernel_init=tinit.kaiming_normal, dtype=self.dtype, name="conv1",
        )(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, use_running_average=not train)
        # 'mid_acts' names the two n*(width)-sized post-relu tensors: the
        # remat_mode='mid' policy saves them, which removes ALL in-block
        # recompute (conv wgrads need exactly these inputs; the BN affine
        # backwards need only the saved 'bn_stats') while still NOT
        # storing the 4x-wider conv3/down outputs that made remat 'none'
        # lose to recompute. Inert under other policies.
        y = checkpoint_name(jax.nn.relu(y), "mid_acts")
        y = Conv(
            mid_ch, (1, 3, 3), strides=(1, self.stride, self.stride),
            padding=(0, 1, 1), use_bias=False, modalities=m,
            kernel_init=tinit.kaiming_normal, dtype=self.dtype, name="conv2",
        )(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, use_running_average=not train)
        y = checkpoint_name(jax.nn.relu(y), "mid_acts")
        if self.fuse_expand_bn:
            # expanding pointwise convs (cin -> 4*width): BN folded into the
            # conv weights with input-side Gram statistics — the two largest
            # BN tensors in the block are never touched unnormalized, and
            # the residual add + relu fuse into the conv epilogue
            # (nn/fusedbn.py; same pytree, same math up to f32 reassociation)
            y = fused_pointwise_conv_bn(
                y, out_ch, conv_name="conv3", bn_name="bn3", train=train,
                modalities=m, kernel_init=tinit.kaiming_normal,
                dtype=self.dtype,
            )
        else:
            y = Conv(
                out_ch, (1, 1, 1), use_bias=False, modalities=m,
                kernel_init=tinit.kaiming_normal, dtype=self.dtype, name="conv3",
            )(y)
            y = BatchNorm(dtype=self.dtype, name="bn3")(y, use_running_average=not train)
        if self.has_downsample:
            # fuse only when the projection expands >=4x: the Gram costs
            # n*cin^2 (x3 with its VJP + remat recompute), so at the 2x
            # expansion of layer2-4 block0 it rivals the conv itself,
            # while at conv3's/layer1's 4x it stays ~25% (measured via
            # cost_analysis on the isolated block)
            if self.fuse_expand_bn and out_ch >= 4 * x.shape[-1]:
                identity = fused_pointwise_conv_bn(
                    x, out_ch, conv_name="down_conv", bn_name="down_bn",
                    train=train, strides=(1, self.stride, self.stride),
                    modalities=m, kernel_init=tinit.kaiming_normal,
                    dtype=self.dtype,
                )
            else:
                identity = Conv(
                    out_ch, (1, 1, 1), strides=(1, self.stride, self.stride),
                    use_bias=False, modalities=m, kernel_init=tinit.kaiming_normal,
                    dtype=self.dtype, name="down_conv",
                )(x)
                identity = BatchNorm(dtype=self.dtype, name="down_bn")(
                    identity, use_running_average=not train
                )
        return jax.nn.relu(y + identity)

    def _fused(self, x, train: bool):
        """Pallas-kernel forward (ops/fusedconv.py): every conv carries the
        previous BN's apply + ReLU in its input prologue and emits its own
        batch statistics from the epilogue, so the three conv outputs cross
        HBM once per direction instead of three times. Parameter/stat
        pytree is IDENTICAL to the standard path (same module/param names
        on the same rng paths — the fusedbn.py contract); numerics differ
        from it only by f32 reassociation (stats come from the f32 MXU
        accumulator rather than a rounded readback). The stride-2 conv2 of
        layers 2-4 block0 falls back to the XLA composition; its conv1 and
        conv3 neighbours stay fused."""
        from corrifnet_tpu.nn.conv import _block_diag_kernel
        from corrifnet_tpu.nn.fusedbn import _BNParams, _ConvKernel
        from corrifnet_tpu.ops.fusedconv import (
            conv3x3_fma_relu_stats,
            pointwise_conv_stats,
        )

        m = self.modalities
        mid_ch = self.width * m
        out_ch = self.width * _EXPANSION * m
        in_ch = x.shape[-1]
        cdtype = self.dtype or x.dtype
        x = x.astype(cdtype)

        def pw_kernel(name, ci, co, ks=(1, 1, 1)):
            k = _ConvKernel(
                kernel_size=ks, in_ch=ci, features=co, modalities=m,
                kernel_init=tinit.kaiming_normal, name=name,
            )()
            if m > 1:
                k = _block_diag_kernel(k)
            return k.astype(cdtype)

        def bn_from(name, s, q, nel, features):
            mean = s / nel
            var = jnp.maximum(q / nel - mean * mean, 0.0)
            return _BNParams(features=features, name=name)(
                mean, var, nel, use_running_average=not train
            )

        nel1 = 1
        for d in x.shape[:-1]:
            nel1 *= d

        y1, s1, q1 = pointwise_conv_stats(
            x, pw_kernel("conv1", in_ch, mid_ch).reshape(in_ch, mid_ch)
        )
        y1 = checkpoint_name(y1, "mid_acts")
        a1, b1 = bn_from("bn1", s1, q1, nel1, mid_ch)

        w2 = pw_kernel("conv2", mid_ch, mid_ch, ks=(1, 3, 3))  # (1,3,3,ci,co)
        bb, dd, hh, ww_, _ = y1.shape
        if self.stride == 1:
            y2, s2, q2 = conv3x3_fma_relu_stats(
                y1.reshape(bb * dd, hh, ww_, mid_ch), w2[0], a1, b1
            )
            y2 = y2.reshape(bb, dd, hh, ww_, mid_ch)
        else:
            # stride-2 conv2 (layers 2-4 block0): XLA conv, prologue as a
            # fused elementwise producer
            dt = y1.dtype
            z1 = jax.nn.relu(y1 * a1.astype(dt) + b1.astype(dt))
            z1 = z1.reshape(bb * dd, hh, ww_, mid_ch)
            dn = jax.lax.conv_dimension_numbers(
                z1.shape, w2[0].shape, ("NHWC", "HWIO", "NHWC")
            )
            # conv in the compute dtype: preferred_element_type=f32 here is
            # NOT autodiff-safe (the transpose rule feeds the f32 cotangent
            # back into a conv with the bf16 kernel -> dtype error); the TPU
            # conv accumulates in f32 internally either way, so the output
            # is identical and only the stats see rounded-readback values —
            # the same accuracy as the standard unfused path (nn/norm.py).
            yc = jax.lax.conv_general_dilated(
                z1, w2[0], (self.stride, self.stride), [(1, 1), (1, 1)],
                dimension_numbers=dn,
            )
            yf = yc.astype(jnp.float32)
            s2 = yf.sum(axis=(0, 1, 2))
            q2 = (yf * yf).sum(axis=(0, 1, 2))
            y2 = yc.reshape(bb, dd, yc.shape[1], yc.shape[2], mid_ch)
        y2 = checkpoint_name(y2, "mid_acts")
        nel2 = nel1 // (self.stride * self.stride)
        a2, b2 = bn_from("bn2", s2, q2, nel2, mid_ch)

        y3, s3, q3 = pointwise_conv_stats(
            y2, pw_kernel("conv3", mid_ch, out_ch).reshape(mid_ch, out_ch),
            a2, b2,
        )
        a3, b3 = bn_from("bn3", s3, q3, nel2, out_ch)

        if self.has_downsample:
            xd = x
            if self.stride != 1:
                for axis in (2, 3):
                    xd = jax.lax.slice_in_dim(
                        xd, 0, xd.shape[axis], stride=self.stride, axis=axis
                    )
            yd, sd, qd = pointwise_conv_stats(
                xd, pw_kernel("down_conv", in_ch, out_ch).reshape(in_ch, out_ch)
            )
            ad, bd = bn_from("down_bn", sd, qd, nel2, out_ch)
            dt = yd.dtype
            identity = yd * ad.astype(dt) + bd.astype(dt)
        else:
            identity = x
        dt = y3.dtype
        return jax.nn.relu(y3 * a3.astype(dt) + b3.astype(dt) + identity)


class _TailBody(fnn.Module):
    """scan body: one stride-1 bottleneck (train is a static attribute)."""

    width: int
    train: bool
    fuse_expand_bn: bool = False
    pallas_fused: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, _):
        y = Bottleneck3D(
            width=self.width, stride=1, has_downsample=False,
            fuse_expand_bn=self.fuse_expand_bn,
            pallas_fused=self.pallas_fused, dtype=self.dtype,
            name="block",
        )(x, self.train)
        return y, None


class _BottleneckTail(fnn.Module):
    """n identical bottlenecks rolled into nn.scan (stacked params)."""

    width: int
    n: int
    train: bool
    remat_mode: str = "all"  # 'all' | 'mid' (save mid acts too) | 'early' | 'none'
    scan_unroll: int = 1  # lax.scan unroll factor; 0 = fully unrolled
    fuse_expand_bn: bool = False
    pallas_fused: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        # remat each scanned block: only block-boundary carries are stored,
        # activations recompute in the backward pass. 'all' buys ~3x
        # activation-memory headroom (batch 16+ on v5e); 'early' stores the
        # deep layers' small activations to skip their recompute.
        if self.remat_mode in ("all", "mid") or (
            self.remat_mode == "early" and self.width <= 128
        ):
            # Save the (C,)-sized folded BN stats (nn/norm.py names them
            # 'bn_stats'): a few KB per block, and the backward recompute
            # skips every stat reduction pass over the activations.
            # 'mid' additionally saves the two post-relu mid activations
            # per block (see Bottleneck3D), trading ~2*n*width of HBM per
            # block for zero in-block recompute.
            body = fnn.remat(
                _TailBody, policy=_remat_policy(self.remat_mode)
            )
        else:
            body = _TailBody
        unroll = self.scan_unroll if self.scan_unroll > 0 else self.n
        Scanned = fnn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            length=self.n,
            unroll=min(unroll, self.n),
        )
        y, _ = Scanned(
            width=self.width, train=self.train,
            fuse_expand_bn=self.fuse_expand_bn,
            pallas_fused=self.pallas_fused, dtype=self.dtype, name="blocks"
        )(x, None)
        return y


class _PackedTailBlock(fnn.Module):
    """remat body: one packed stride-1 bottleneck (train is a static
    attribute so ``fnn.remat`` sees only array args)."""

    width: int
    train: bool
    modalities: int
    fuse_expand_bn: bool = False
    pallas_fused: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        return Bottleneck3D(
            width=self.width, stride=1, has_downsample=False,
            modalities=self.modalities, fuse_expand_bn=self.fuse_expand_bn,
            pallas_fused=self.pallas_fused, dtype=self.dtype, name="block",
        )(x, self.train)


class PackedStage1(fnn.Module):
    """Stem + layer1 for ALL modalities jointly, modality packed into
    channels: activations are (B, D, H, W, M*C) instead of M vmapped
    (B, D, H, W, C) streams.

    Why: every stage-1 channel count (stem cin 1, width 64) fills at most
    half of the TPU's 128-wide lane dim in the per-modality form — every
    conv, BN stat pass, relu, pool, and layout copy runs half-empty.
    Packing M=3 modalities modality-major into channels makes the convs
    dense block-diagonal (3x the MACs, zeros off-diagonal) but fully
    lane-utilized, and all glue ops full-width: measured 26% faster
    fwd+bwd than the vmapped form at the real shapes (micro_stage1.py,
    11.62 vs 15.71 ms). Params stay per-modality ((M, ...) leading axes,
    identical shapes/init to the vmapped encoder; see Conv.modalities) —
    the math is unchanged (cross-modality weights are exact zeros), only
    the compute layout differs. From layer2 on, widths >=128 fill the
    lanes anyway and 3x MACs would lose — the model unpacks and runs the
    remaining levels per-modality (ResNet3DEncoder(skip_stage1=True)).

    Returns (x1, y): post-maxpool stem features (B, D, H, W, M*64) and
    layer1 output (B, D, H, W, M*256), both packed modality-major.
    """

    modalities: int = 3
    remat_mode: str = "all"  # remat tail blocks (matches _BottleneckTail)
    fuse_expand_bn: bool = False
    pallas_fused: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        m = self.modalities
        y = Conv(
            64 * m, (3, 7, 7), strides=(1, 2, 2), padding=(1, 3, 3),
            use_bias=False, modalities=m, kernel_init=tinit.kaiming_normal,
            dtype=self.dtype, name="stem_conv",
        )(x)
        y = jax.nn.relu(y)
        y = BatchNorm(dtype=self.dtype, name="stem_bn")(y, use_running_average=not train)
        x1 = max_pool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1))

        blocks, width = _LAYERS[0]
        if self.remat_mode == "none":
            Tail = _PackedTailBlock
        else:
            Tail = fnn.remat(
                _PackedTailBlock, policy=_remat_policy(self.remat_mode)
            )
        y = Bottleneck3D(
            width=width, stride=1, has_downsample=True, modalities=m,
            fuse_expand_bn=self.fuse_expand_bn,
            pallas_fused=self.pallas_fused, dtype=self.dtype,
            name="layer1_block0",
        )(x1, train)
        for bi in range(1, blocks):
            y = Tail(
                width=width, train=train, modalities=m,
                fuse_expand_bn=self.fuse_expand_bn,
                pallas_fused=self.pallas_fused,
                dtype=self.dtype, name=f"layer1_b{bi}",
            )(y)
        return x1, y


def pack_stage1_variables(variables, modalities: int = 3):
    """Convert MMVit4(pack_stage1=False) variables to the pack_stage1=True
    tree: pure moves and reshapes, no numeric change.

    The vmapped tree stacks per-modality stage-1 params under
    ``encoders/{stem_*, layer1_block0, layer1_tail}`` with a leading M
    axis (tails additionally stacked over the scan axis). The packed tree
    keeps conv kernels bitwise identical under ``packed_stage1/...``
    ((M, ...) per-stream leaves, see Conv.modalities) and flattens BN
    vectors (M, C) -> (M*C,) to match the packed channel axis."""
    m = modalities
    tail_blocks = _LAYERS[0][0] - 1

    def convert_module(name, tree):
        if "bn" in name:
            return jax.tree.map(lambda v: v.reshape(-1), tree)
        return tree  # conv: per-stream (M, ...) leaves, unchanged

    def pack_collection(col):
        enc = dict(col["encoders"])
        ps1 = {}
        for name in ("stem_conv", "stem_bn", "layer1_block0"):
            if name in enc:
                sub = enc.pop(name)
                if name == "layer1_block0":
                    ps1[name] = {
                        k: convert_module(k, v) for k, v in sub.items()
                    }
                else:
                    ps1[name] = convert_module(name, sub)
        if "layer1_tail" in enc:
            block = enc.pop("layer1_tail")["blocks"]["block"]
            for bi in range(1, tail_blocks + 1):
                picked = jax.tree.map(lambda v, i=bi - 1: v[:, i], block)
                ps1[f"layer1_b{bi}"] = {"block": {
                    k: convert_module(k, v) for k, v in picked.items()
                }}
        out = {k: v for k, v in col.items() if k != "encoders"}
        out["encoders"] = enc
        out["packed_stage1"] = ps1
        return out

    return {
        cname: pack_collection(dict(col))
        if cname in ("params", "batch_stats") else col
        for cname, col in variables.items()
    }


class ResNet3DEncoder(fnn.Module):
    """Per-modality encoder returning (x1..x5 adapted levels, x6 bottleneck).

    Input: (B, D=3, H, W, C=1) channels-last volume (one spectral modality,
    its 3 bands on the depth axis). Outputs channels-last volumes with
    channel counts 8/16/32/64/64 and the 64-ch x6 at (8, 8, 8)
    (mmvit4.py:159-194).

    ``skip_stage1=True``: stage 1 ran externally (PackedStage1); ``x`` is
    then the per-modality tuple ``(x1, layer1_out)`` and the encoder picks
    up at layer2. Stem/layer1 params are not declared in this mode.
    """

    remat_mode: str = "all"  # see _BottleneckTail
    scan_unroll: int = 1  # see _BottleneckTail
    skip_stage1: bool = False
    fuse_expand_bn: bool = False  # see Bottleneck3D
    pallas_fused: bool = False  # see Bottleneck3D
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, ...]:
        bd = BASIC_DIMS
        if self.skip_stage1:
            x1, y = x
            feats = [x1, y]
        else:
            # Stem: inflated conv1 (3,7,7)/(1,2,2), then ReLU BEFORE BatchNorm
            # (mmvit4.py:170-174), then MaxPool3d((1,3,3),(1,2,2),(0,1,1)).
            y = Conv(
                64, (3, 7, 7), strides=(1, 2, 2), padding=(1, 3, 3), use_bias=False,
                kernel_init=tinit.kaiming_normal, dtype=self.dtype, name="stem_conv",
            )(x)
            y = jax.nn.relu(y)
            y = BatchNorm(dtype=self.dtype, name="stem_bn")(y, use_running_average=not train)
            x1 = max_pool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1))
            feats = [x1]
            y = x1
        for li, (blocks, width) in enumerate(_LAYERS):
            if self.skip_stage1 and li == 0:
                continue
            # first block carries the stride + projection downsample
            y = Bottleneck3D(
                width=width,
                stride=2 if li > 0 else 1,
                has_downsample=True,
                fuse_expand_bn=self.fuse_expand_bn,
                pallas_fused=self.pallas_fused,
                dtype=self.dtype,
                name=f"layer{li + 1}_block0",
            )(y, train)
            # identical-shape tail blocks roll into one lax.scan — same math,
            # ~3x smaller HLO (compile time) than unrolled blocks
            if blocks > 1:
                y = _BottleneckTail(
                    width=width,
                    n=blocks - 1,
                    train=train,
                    remat_mode=self.remat_mode,
                    scan_unroll=self.scan_unroll,
                    fuse_expand_bn=self.fuse_expand_bn,
                    pallas_fused=self.pallas_fused,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_tail",
                )(y)
            feats.append(y)
        x1, x2, x3, x4, x5 = feats

        # Per-level 1x1 adapt convs to basic_dims multiples (mmvit4.py:164-168).
        adapt_ch = (bd, bd * 2, bd * 4, bd * 8, bd * 8)
        adapted = []
        for i, (f, c) in enumerate(zip(feats, adapt_ch)):
            adapted.append(
                Conv(
                    c, (1, 1, 1), kernel_init=tinit.kaiming_normal,
                    dtype=self.dtype, name=f"adapt{i + 1}",
                )(f)
            )
        a1, a2, a3, a4, a5 = adapted

        # x6: trilinear-resize all levels to 8^3 (align_corners=True,
        # mmvit4.py:187-191), concat (184 ch), 1x1 conv to 64 ch.
        pooled = [resize_linear(a, (8, 8, 8), align_corners=True) for a in adapted]
        x6 = jnp.concatenate(pooled, axis=-1)
        x6 = Conv(
            bd * 8, (1, 1, 1), kernel_init=tinit.kaiming_normal,
            dtype=self.dtype, name="conv6",
        )(x6)
        return a1, a2, a3, a4, a5, x6
