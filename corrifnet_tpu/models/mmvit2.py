"""MMVit2 and its correlation-free ablation mmformer
(reference: mmmvit2.py:345-477, mmformer.py:349-435 — byte-identical except
for the correlation stage).

Differences from MMVit4 (mmvit4.py):
  * encoder is a plain 5-stage residual Conv3d stack (replicate padding,
    stride-2 downsampling in ALL dims incl. depth, mmmvit2.py:57-104) — not
    the inflated ResNet50;
  * the encoder's x6 pyramid resize uses bare ``F.interpolate`` = NEAREST
    (mmmvit2.py:97-101), unlike MMVit4's trilinear;
  * skips are stacked per-modality channels directly (mmmvit2.py:416-430) —
    no EarlyFusionBlocks;
  * correlation attention runs on the IntraFormer *outputs* and its result
    REPLACES them (no residual skip add, mmmvit2.py:434-461);
  * multimodal transformer sees 3 token groups (1536 tokens, no fused6
    group); decode conv is 1536 -> 192 (mmmvit2.py:384);
  * decoder identical except no RFM5_reduce (d4_c1 consumes 192 ch).

``MMFormer`` is the ``use_correlation=False`` ablation — the reference
point CorrIFNet improves on (SURVEY §2.2).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.models.decoder import DecoderFuse
from corrifnet_tpu.nn import Conv, Dense, GeneralConv3d, Transformer
from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.nn.resize import resize_nearest
from corrifnet_tpu.ops import correlation_fusion

__all__ = ["MMVit2", "MMFormer", "ConvEncoder"]

Dtype = Any
BD = 8  # basic_dims
TDIM = 512
PATCH = 8
NUM_TOKENS = PATCH ** 3


class ConvEncoder(fnn.Module):
    """5-stage residual conv encoder (mmmvit2.py:57-104), channels-last.

    Input (B, 3, H, W, 1); levels at channels 8/16/32/64/64 and the x6
    bottleneck at (8,8,8)x64 via NEAREST resize + 1x1 conv.
    """

    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        def stage(x, ch, stride, name):
            if name == "e1":
                y = Conv(
                    ch, 3, strides=1, padding=1, pad_mode="replicate",
                    kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                    name=f"{name}_c1",
                )(x)
            else:
                y = GeneralConv3d(
                    ch, 3, stride, 1, pad_mode="replicate", dtype=self.dtype,
                    name=f"{name}_c1",
                )(x, train)
            r = GeneralConv3d(
                ch, 3, 1, 1, pad_mode="replicate", dtype=self.dtype,
                name=f"{name}_c2",
            )(y, train)
            r = GeneralConv3d(
                ch, 3, 1, 1, pad_mode="replicate", dtype=self.dtype,
                name=f"{name}_c3",
            )(r, train)
            return y + r

        x1 = stage(x, BD, 1, "e1")
        x2 = stage(x1, BD * 2, 2, "e2")
        x3 = stage(x2, BD * 4, 2, "e3")
        x4 = stage(x3, BD * 8, 2, "e4")
        x5 = stage(x4, BD * 8, 2, "e5")

        pooled = [resize_nearest(t, (8, 8, 8)) for t in (x1, x2, x3, x4, x5)]
        x6 = jnp.concatenate(pooled, axis=-1)  # 184 = 23*BD ch
        x6 = Conv(
            BD * 8, 1, pad_mode="replicate",
            kernel_init=tinit.kaiming_normal, dtype=self.dtype, name="conv6",
        )(x6)
        return x1, x2, x3, x4, x5, x6


class _IntraStream(fnn.Module):
    """Per-modality tokenizer + IntraFormer (vmapped x3). Unlike MMVit4,
    downstream consumers use the transformer OUTPUT, not the skip."""

    use_pallas_attn: bool = False
    transformer_dropout: float = 0.1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x6_tokens, pos, train: bool = True):
        tok = Dense(
            TDIM, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
            name="encode_conv",
        )(x6_tokens)
        intra = Transformer(
            TDIM, depth=1, heads=8, mlp_dim=512,
            dropout_rate=self.transformer_dropout,
            use_pallas_attn=self.use_pallas_attn, dtype=self.dtype,
            name="transformer",
        )(tok, pos, deterministic=not train)
        qkv = Dense(
            TDIM * 3, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
            name="qkv",
        )(intra)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return intra, q, k, v


class MMVit2(fnn.Module):
    num_cls: int = 1
    dtype: Dtype = None
    use_pallas: bool = True
    use_correlation: bool = True
    depth_mode: str = "full"
    transformer_dropout: float = 0.1  # reference rate; a knob so the
    # train-dynamics parity test can run deterministically

    @fnn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        cdtype = self.dtype or x.dtype
        vol = jnp.moveaxis(x, 1, 0)[..., None].astype(cdtype)

        VEncoder = fnn.vmap(
            ConvEncoder,
            in_axes=(0, None),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        e1, e2, e3, e4, e5, e6 = VEncoder(dtype=self.dtype, name="encoders")(
            vol, train
        )

        # stacked per-modality skips (mmmvit2.py:416-427): channels-last
        # concat == torch stack(modality).view(B, 3C, ...)
        def stack(lvl):
            return jnp.concatenate([lvl[0], lvl[1], lvl[2]], axis=-1)

        x1, x2, x3, x4 = stack(e1), stack(e2), stack(e3), stack(e4)

        pos = self.param(
            "modality_pos", tinit.zeros, (3, 1, NUM_TOKENS, TDIM), jnp.float32
        )
        VStream = fnn.vmap(
            _IntraStream,
            in_axes=(0, 0, None),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        x6_tokens = e6.reshape(3, b, NUM_TOKENS, BD * 8)
        intra, q, k, v = VStream(
            use_pallas_attn=self.use_pallas,
            transformer_dropout=self.transformer_dropout, dtype=self.dtype,
            name="modality_stream",
        )(x6_tokens, pos.astype(cdtype), train)

        if self.use_correlation:
            # correlation output REPLACES the intra tokens (mmmvit2.py:457-461)
            mm_groups = correlation_fusion(q, k, v, use_pallas=self.use_pallas)
        else:
            # mmformer: intra tokens go straight to the multimodal stage
            mm_groups = intra

        mm_tokens = jnp.concatenate([mm_groups[0], mm_groups[1], mm_groups[2]], axis=1)
        mm_pos = jnp.concatenate([pos[0], pos[1], pos[2]], axis=1).astype(cdtype)
        mm_out = Transformer(
            TDIM, depth=1, heads=8, mlp_dim=512,
            dropout_rate=self.transformer_dropout,
            use_pallas_attn=self.use_pallas, dtype=self.dtype,
            name="multimodal_transformer",
        )(mm_tokens, mm_pos, deterministic=not train)

        # (B, 1536, 512) -> (B,8,8,8,1536) row-major view (mmmvit2.py:470)
        x6_inter = mm_out.reshape(b, PATCH, PATCH, PATCH, TDIM * 3)
        x6_inter = Dense(
            BD * 8 * 3, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
            name="multimodal_decode_conv",
        )(x6_inter)

        return DecoderFuse(
            num_cls=self.num_cls, depth_mode=self.depth_mode, use_reduce=False,
            dtype=self.dtype, name="decoder",
        )(x1, x2, x3, x4, x6_inter, train)


class MMFormer(MMVit2):
    """mmformer baseline (mmformer.py:349-435): MMVit2 without the
    correlation stage."""

    use_correlation: bool = False
