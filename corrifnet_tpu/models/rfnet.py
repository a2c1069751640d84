"""RFNet — region-aware modal fusion (reference: RFNet.py:287-317).

Three 4-stage residual Conv3d encoders (RFNet.py:157-190, stride-2 in all
dims, conv -> InstanceNorm -> LeakyReLU(0.2) ordering); the decoder
generates *probability region maps* per level (prm_generator /
prm_generator_laststage, RFNet.py:35-79 — note Softmax over a single class
channel, which is constantly 1 for num_cls=1, quirk preserved), detaches
them (stop_gradient, RFNet.py:237,242,253,266), and gates a
region-aware modal fusion (modal_fusion weighted-sum over modalities +
region_fusion + shortcut, RFNet.py:81-154) feeding a trilinear-upsampling
decode cascade. Final sigmoid prediction repeated x3 on the modality axis
(RFNet.py:276-282).

Modality-stacked tensors are kept as (B, 3, D, H, W, C) channels-last; the
reference's (B, 3C, ...) channel-major views become modality-axis
concatenations (identical layout).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import Conv, GeneralConv3d
from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.nn.resize import resize_linear, resize_nearest

__all__ = ["RFNet"]

Dtype = Any
BD = 8  # basic_dims (RFNet.py:156)


def _gconv(feat, k, pad, dtype, name, stride=1):
    """RFNet's general_conv3d: replicate pad, IN, lrelu(0.2), norm-then-act."""
    return GeneralConv3d(
        feat, k, stride, pad, pad_mode="replicate", act="lrelu",
        order="norm_act", dtype=dtype, name=name,
    )


class ConvEncoder4(fnn.Module):
    """4-stage residual encoder (RFNet.py:157-190), channels 8/16/32/64."""

    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        y = x
        for i, (ch, stride) in enumerate([(BD, 1), (BD * 2, 2), (BD * 4, 2), (BD * 8, 2)]):
            y = _gconv(ch, 3, 1, self.dtype, f"e{i + 1}_c1", stride)(y, train)
            r = _gconv(ch, 3, 1, self.dtype, f"e{i + 1}_c2")(y, train)
            r = _gconv(ch, 3, 1, self.dtype, f"e{i + 1}_c3")(r, train)
            y = y + r
            feats.append(y)
        return tuple(feats)


class PrmGeneratorLast(fnn.Module):
    """prm_generator_laststage (RFNet.py:35-56)."""

    in_channel: int
    num_cls: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x_stack, train: bool = True):
        # x_stack: (B, 3, D, H, W, C) -> modality-major channel concat
        y = jnp.concatenate([x_stack[:, i] for i in range(3)], axis=-1)
        c = self.in_channel
        y = _gconv(c // 4, 1, 0, self.dtype, "emb0")(y, train)
        y = _gconv(c // 4, 3, 1, self.dtype, "emb1")(y, train)
        y = _gconv(c, 1, 0, self.dtype, "emb2")(y, train)
        p = _gconv(16, 1, 0, self.dtype, "prm0")(y, train)
        p = Conv(self.num_cls, 1, kernel_init=tinit.kaiming_normal,
                 dtype=self.dtype, name="prm1")(p)
        return jax.nn.softmax(p.astype(jnp.float32), axis=-1).astype(p.dtype)


class PrmGenerator(fnn.Module):
    """prm_generator (RFNet.py:58-79)."""

    in_channel: int
    num_cls: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x1, x2_stack, train: bool = True):
        y = jnp.concatenate([x2_stack[:, i] for i in range(3)], axis=-1)
        c = self.in_channel
        y = _gconv(c // 4, 1, 0, self.dtype, "emb0")(y, train)
        y = _gconv(c // 4, 3, 1, self.dtype, "emb1")(y, train)
        y = _gconv(c, 1, 0, self.dtype, "emb2")(y, train)
        emb_up = resize_linear(y, x1.shape[1:4], align_corners=True)
        p = _gconv(16, 1, 0, self.dtype, "prm0")(
            jnp.concatenate([x1, emb_up], axis=-1), train
        )
        p = Conv(self.num_cls, 1, kernel_init=tinit.kaiming_normal,
                 dtype=self.dtype, name="prm1")(p)
        return jax.nn.softmax(p.astype(jnp.float32), axis=-1).astype(p.dtype)


class RegionAwareModalFusion(fnn.Module):
    """region_aware_modal_fusion (RFNet.py:122-154)."""

    in_channel: int
    num_cls: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x_stack, prm, train: bool = True):
        # x_stack: (B, 3, D, H, W, C); prm: (B, D, H, W, 1)
        b = x_stack.shape[0]
        c = self.in_channel
        gated = x_stack * prm[:, None]  # broadcast over modality + channel

        # modal_fusion (RFNet.py:81-106)
        prm_avg = prm.mean(axis=(1, 2, 3)) + 1e-7  # (B, 1)
        feat_avg = gated.mean(axis=(2, 3, 4)) / prm_avg[:, None]  # (B, 3, C)
        feat_vec = feat_avg.reshape(b, 3 * c)
        feat_vec = jnp.concatenate([feat_vec, prm_avg], axis=-1)  # (B, 3C+1)
        w = Conv(128, 1, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                 name="mf_w0")(feat_vec[:, None, None, None, :])
        w = jax.nn.leaky_relu(w, 0.2)
        w = Conv(3, 1, kernel_init=tinit.kaiming_normal, dtype=self.dtype,
                 name="mf_w1")(w)
        w = jax.nn.sigmoid(w.astype(jnp.float32)).astype(x_stack.dtype)
        w = w.reshape(b, 3, 1, 1, 1, 1)
        # the weighted sum runs over the GATED features (modal_feat), not the
        # raw stack (RFNet.py:106,147-149)
        region_feat = (gated * w).sum(axis=1)  # (B, D, H, W, C)

        # region_fusion (RFNet.py:109-120)
        rf = _gconv(c, 1, 0, self.dtype, "rf0")(region_feat, train)
        rf = _gconv(c, 3, 1, self.dtype, "rf1")(rf, train)
        rf = _gconv(c // 2, 1, 0, self.dtype, "rf2")(rf, train)

        # short_cut on the raw modality-concat (RFNet.py:129-133)
        sc = jnp.concatenate([x_stack[:, i] for i in range(3)], axis=-1)
        sc = _gconv(c, 1, 0, self.dtype, "sc0")(sc, train)
        sc = _gconv(c, 3, 1, self.dtype, "sc1")(sc, train)
        sc = _gconv(c // 2, 1, 0, self.dtype, "sc2")(sc, train)
        return jnp.concatenate([rf, sc], axis=-1)


class RFNet(fnn.Module):
    num_cls: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        cdtype = dt or x.dtype
        vol = jnp.moveaxis(x, 1, 0)[..., None].astype(cdtype)  # (3,B,D,H,W,1)

        VEnc = fnn.vmap(
            ConvEncoder4, in_axes=(0, None), out_axes=0,
            variable_axes={"params": 0}, split_rngs={"params": True},
        )
        e1, e2, e3, e4 = VEnc(dtype=dt, name="encoders")(vol, train)
        # (3, B, D, H, W, C) -> (B, 3, D, H, W, C)
        x1, x2, x3, x4 = (jnp.swapaxes(t, 0, 1) for t in (e1, e2, e3, e4))
        sg = jax.lax.stop_gradient

        prm4 = PrmGeneratorLast(BD * 8, dtype=dt, name="prm_generator4")(x4, train)
        de_x4 = RegionAwareModalFusion(BD * 8, dtype=dt, name="RFM4")(
            x4, sg(prm4), train
        )
        de_x4 = resize_nearest(de_x4, (16, 16, 16))
        de_x4 = resize_linear(de_x4, (32, 32, 32), align_corners=True)
        de_x4 = _gconv(BD * 4, 3, 1, dt, "d3_c1")(de_x4, train)

        prm3 = PrmGenerator(BD * 4, dtype=dt, name="prm_generator3")(de_x4, x3, train)
        prm3 = resize_linear(sg(prm3), x3.shape[2:5], align_corners=True)
        de_x3 = RegionAwareModalFusion(BD * 4, dtype=dt, name="RFM3")(x3, prm3, train)
        de_x3 = resize_nearest(de_x3, (32, 32, 32))
        de_x3 = jnp.concatenate([de_x3, de_x4], axis=-1)
        de_x3 = _gconv(BD * 4, 3, 1, dt, "d3_c2")(de_x3, train)
        de_x3 = _gconv(BD * 4, 1, 0, dt, "d3_out")(de_x3, train)
        de_x3 = resize_linear(de_x3, (64, 64, 64), align_corners=True)
        de_x3 = _gconv(BD * 2, 3, 1, dt, "d2_c1")(de_x3, train)

        prm2 = PrmGenerator(BD * 2, dtype=dt, name="prm_generator2")(de_x3, x2, train)
        prm2 = resize_linear(sg(prm2), x2.shape[2:5], align_corners=True)
        de_x2 = RegionAwareModalFusion(BD * 2, dtype=dt, name="RFM2")(x2, prm2, train)
        de_x2 = resize_nearest(de_x2, (64, 64, 64))
        de_x2 = jnp.concatenate([de_x2, de_x3], axis=-1)
        de_x2 = _gconv(BD * 2, 3, 1, dt, "d2_c2")(de_x2, train)
        de_x2 = _gconv(BD * 2, 1, 0, dt, "d2_out")(de_x2, train)
        de_x2 = resize_linear(de_x2, (128, 128, 128), align_corners=True)
        de_x2 = _gconv(BD, 3, 1, dt, "d1_c1")(de_x2, train)

        prm1 = PrmGenerator(BD, dtype=dt, name="prm_generator1")(de_x2, x1, train)
        prm1 = resize_linear(sg(prm1), x1.shape[2:5], align_corners=True)
        de_x1 = RegionAwareModalFusion(BD, dtype=dt, name="RFM1")(x1, prm1, train)
        de_x1 = resize_nearest(de_x1, (128, 128, 128))
        de_x1 = jnp.concatenate([de_x1, de_x2], axis=-1)
        de_x1 = _gconv(BD, 3, 1, dt, "d1_c2")(de_x1, train)
        de_x1 = _gconv(BD, 1, 0, dt, "d1_out")(de_x1, train)

        logits = Conv(self.num_cls, 1, kernel_init=tinit.kaiming_normal,
                      dtype=dt, name="seg_layer")(de_x1)
        logits = resize_linear(logits, (1, 224, 224), align_corners=True)
        pred = jax.nn.sigmoid(logits.astype(jnp.float32))
        pred = jnp.moveaxis(pred, -1, 1)  # (B, 1, 1, 224, 224)
        return jnp.repeat(pred, 3, axis=1)  # (B, 3, 1, 224, 224)
