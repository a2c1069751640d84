"""MMVit4 — CorrIFNet, the flagship model (reference: mmvit4.py:391-532).

Pipeline (mmvit4.py:441-532):
  1. three per-modality inflated-ResNet50-3D encoders (RGB / NIR / SWIR);
  2. EarlyFusionBlock per level (concat -> 1x1 conv -> ReLU -> InstanceNorm);
  3. IntraFormer: per-modality 1x1 conv to 512-d tokens (8^3 = 512 tokens),
     learned zero-init positional embeddings, depth-1 8-head transformer;
  4. InterFormer correlation attention: per-modality qkv projections, then
     the per-element modality softmax fusion (see ops.correlation — Pallas
     kernel on TPU, XLA path elsewhere);
  5. residual: correlation output is added onto the PRE-transformer skip
     tokens (mmvit4.py:505-507 — the IntraFormer output itself feeds only
     the qkv projections, quirk preserved);
  6. multimodal transformer over the 4 concatenated token groups (2048
     tokens) followed by the (B,2048,512)->(B,8,8,8,2048) reinterpreting
     reshape + 1x1 decode conv (mmvit4.py:519-529);
  7. DecoderFuse cascade to a sigmoid (B, 3, 1, 224, 224) prediction.

TPU-first design choices:
  * the three encoders / tokenizers / qkv projections are a single
    ``nn.vmap`` over a stacked modality axis — every conv/matmul runs at 3x
    batch, tripling MXU occupancy at small batch;
  * everything is channels-last; 1x1x1 convs on token grids are expressed
    as Dense layers (identical math, direct MXU mapping);
  * init parity: every conv is kaiming-normal because MMVit4's constructor
    re-initializes all Conv3d weights (mmvit4.py:437-439), positional
    embeddings are zeros (mmvit4.py:408-411).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.models.decoder import DecoderFuse
from corrifnet_tpu.models.resnet3d import (
    BASIC_DIMS,
    PackedStage1,
    ResNet3DEncoder,
)
from corrifnet_tpu.nn import Dense, EarlyFusionBlock, Transformer
from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.ops import correlation_fusion

__all__ = ["MMVit4"]

Dtype = Any

TRANSFORMER_DIM = 512  # mmvit4.py:11
PATCH = 8  # mmvit4.py:16
NUM_TOKENS = PATCH ** 3


class _ModalityStream(fnn.Module):
    """Per-modality tokenizer + IntraFormer + qkv projection (vmapped x3)."""

    use_pallas_attn: bool = False
    transformer_dropout: float = 0.1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x6, pos, train: bool = True):
        b = x6.shape[0]
        # 1x1x1 encode conv == per-token Dense (mmvit4.py:398-400)
        skip = Dense(
            TRANSFORMER_DIM, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
            name="encode_conv",
        )(x6.reshape(b, NUM_TOKENS, -1))
        trans = Transformer(
            TRANSFORMER_DIM, depth=1, heads=8, mlp_dim=512,
            dropout_rate=self.transformer_dropout,
            use_pallas_attn=self.use_pallas_attn, dtype=self.dtype,
            name="transformer",
        )(skip, pos, deterministic=not train)
        qkv = Dense(
            TRANSFORMER_DIM * 3, kernel_init=tinit.kaiming_normal,
            dtype=self.dtype, name="qkv",
        )(trans)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return skip, q, k, v


class MMVit4(fnn.Module):
    """CorrIFNet. Input (B, 3, 3, 224, 224) reference layout; output
    sigmoid probabilities (B, 3, 1, 224, 224)."""

    num_cls: int = 1
    dtype: Dtype = None
    use_pallas: bool = True
    depth_mode: str = "full"  # decoder depth mode: 'full' (parity) | 'pruned' (fast inference)
    remat_mode: str = "all"  # encoder scan remat: 'all' | 'mid' | 'early' |
    # 'none' | 'mid1' ('mid' for the packed stage 1 only, 'all' elsewhere —
    # stage 1's bwd recompute is the big remat cost, ~7.9 of 74.7 ms at B=8,
    # while storing layers 2-4's mid acts measured neutral-to-negative)
    scan_unroll: int = 1  # encoder tail-scan unroll factor; 0 = full unroll
    pack_stage1: bool = True  # stem+layer1 modality-packed (see PackedStage1)
    fuse_expand_bn: bool = False  # fold bn3/down_bn into convs (nn/fusedbn.py)
    pallas_fused_blocks: bool = False  # bottleneck convs via ops/fusedconv.py
    transformer_dropout: float = 0.1  # reference rate (mmvit4.py Transformer);
    # a knob so train-mode parity tests can run deterministically
    decoder_remat: bool = False  # rematerialize decoder conv blocks in bwd
    # (DecoderFuse.remat_convs): bit-identical, trades decoder-bwd FLOPs
    # for the full-depth multi-GB working set (NOTES round 4)
    decoder_lean: "bool | None" = None  # lean-residual full-depth decoder
    # backward (DecoderFuse.lean / nn/leandec.py): one stored volume per
    # stage — bit-identical forward, grads equal to autodiff at f32
    # reassociation. None = batch-adaptive (on at batch <= 4; see
    # DecoderFuse.lean)
    decoder_chunk: int = 0  # lean mode: depth-chunk count for d1_c2's
    # backward (DecoderFuse.c2_chunks) — bounds the full-depth memory
    # peak's transient cluster; fwd equal to f32 conv-blocking
    # reassociation; 0 = off

    @fnn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        cdtype = self.dtype or x.dtype

        if self.pack_stage1:
            # (B, M, D, H, W) -> modality-packed (B, D, H, W, M): stage 1's
            # <=64-channel streams run jointly at full lane width; unpack to
            # the per-modality vmapped form where widths >=128 take over.
            packed = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cdtype)
            rm1 = "mid" if self.remat_mode == "mid1" else self.remat_mode
            x1p, y1p = PackedStage1(
                modalities=3, remat_mode=rm1,
                fuse_expand_bn=self.fuse_expand_bn,
                pallas_fused=self.pallas_fused_blocks, dtype=self.dtype,
                name="packed_stage1",
            )(packed, train)

            # split the packed channel axis (..., M*C) -> (..., M, C) and let
            # vmap map over axis 4 in place — no materialized
            # modality-leading transpose between stage 1 and layer2
            def unpack(t):
                bb, dd, hh, ww, mc = t.shape
                return t.reshape(bb, dd, hh, ww, 3, mc // 3)

            stage1 = (unpack(x1p), unpack(y1p))
            VEncoder = fnn.vmap(
                ResNet3DEncoder,
                in_axes=((4, 4), None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
            )
            e1, e2, e3, e4, e5, e6 = VEncoder(
                remat_mode=("all" if self.remat_mode == "mid1"
                            else self.remat_mode),
                scan_unroll=self.scan_unroll,
                skip_stage1=True, fuse_expand_bn=self.fuse_expand_bn,
                pallas_fused=self.pallas_fused_blocks,
                dtype=self.dtype, name="encoders"
            )(stage1, train)
        else:
            # (B, M, C, H, W) -> stacked channels-last volumes
            # (M, B, D=3, H, W, 1)
            vol = jnp.moveaxis(x, 1, 0)[..., None].astype(cdtype)

            VEncoder = fnn.vmap(
                ResNet3DEncoder,
                in_axes=(0, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
            )
            e1, e2, e3, e4, e5, e6 = VEncoder(
                remat_mode=("all" if self.remat_mode == "mid1"
                            else self.remat_mode),
                scan_unroll=self.scan_unroll,
                fuse_expand_bn=self.fuse_expand_bn,
                pallas_fused=self.pallas_fused_blocks,
                dtype=self.dtype, name="encoders"
            )(vol, train)

        # Early fusion per level (mmvit4.py:449-454).
        fused = [
            EarlyFusionBlock(dtype=self.dtype, name=f"fusion{i + 1}")(
                lvl[0], lvl[1], lvl[2]
            )
            for i, lvl in enumerate((e1, e2, e3, e4, e5, e6))
        ]
        fused_x1, fused_x2, fused_x3, fused_x4, _fused_x5, fused_x6 = fused

        # IntraFormer + qkv per modality (vmapped).
        pos = self.param(
            "modality_pos",
            tinit.zeros,
            (3, 1, NUM_TOKENS, TRANSFORMER_DIM),
            jnp.float32,
        )
        VStream = fnn.vmap(
            _ModalityStream,
            in_axes=(0, 0, None),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        x6_tokens = e6.reshape(3, b, NUM_TOKENS, BASIC_DIMS * 8)
        skip, q, k, v = VStream(
            use_pallas_attn=self.use_pallas,
            transformer_dropout=self.transformer_dropout, dtype=self.dtype,
            name="modality_stream",
        )(x6_tokens, pos.astype(cdtype), train)

        # InterFormer correlation fusion (mmvit4.py:481-491) — Pallas on TPU.
        corr = correlation_fusion(q, k, v, use_pallas=self.use_pallas)
        fused_tokens = skip + corr  # residual onto PRE-transformer skips

        # Multimodal transformer over 4 token groups (mmvit4.py:510-522).
        fused6_tok = Dense(
            TRANSFORMER_DIM, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
            name="fused6_encode_conv",
        )(fused_x6.reshape(b, NUM_TOKENS, -1))
        fused6_pos = self.param(
            "fused6_pos", tinit.zeros, (1, NUM_TOKENS, TRANSFORMER_DIM), jnp.float32
        )
        mm_tokens = jnp.concatenate(
            [fused_tokens[0], fused_tokens[1], fused_tokens[2], fused6_tok], axis=1
        )
        mm_pos = jnp.concatenate(
            [pos[0], pos[1], pos[2], fused6_pos], axis=1
        ).astype(cdtype)
        mm_out = Transformer(
            TRANSFORMER_DIM, depth=1, heads=8, mlp_dim=512,
            dropout_rate=self.transformer_dropout,
            use_pallas_attn=self.use_pallas, dtype=self.dtype,
            name="multimodal_transformer",
        )(mm_tokens, mm_pos, deterministic=not train)

        # Reinterpreting reshape (B,2048,512)->(B,8,8,8,2048) — row-major
        # buffer reuse identical to torch .view (mmvit4.py:525-529).
        x6_inter = mm_out.reshape(b, PATCH, PATCH, PATCH, TRANSFORMER_DIM * 4)
        x6_inter = Dense(
            BASIC_DIMS * 8 * 3, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
            name="multimodal_decode_conv",
        )(x6_inter)

        return DecoderFuse(
            num_cls=self.num_cls, depth_mode=self.depth_mode,
            use_pallas_epilogue=self.use_pallas, dtype=self.dtype,
            remat_convs=self.decoder_remat, lean=self.decoder_lean,
            c2_chunks=self.decoder_chunk,
            name="decoder",
        )(fused_x1, fused_x2, fused_x3, fused_x4, x6_inter, train)
