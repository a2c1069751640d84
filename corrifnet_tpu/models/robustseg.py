"""RobustMseg — style/content disentanglement segmentation
(reference: RobustSeg.py:8-95).

Per modality: a StyleEncoder (GAP -> 128-d code, RobustSeg.py:98-115) and a
4-level ContentEncoder (RobustSeg.py:118-145 — note ``e1c1`` is applied
twice per level: once inside the conv chain and once for the residual,
shared weights, quirk preserved). Missing-modality robustness: a drop mask
(``sum(x) == 0`` per modality) zeroes that modality's content features in
forward AND backward (ZeroLayer, RobustSeg.py:291-303) — realized here as a
multiply by the inverted mask, which has identical fwd/bwd semantics.
Content maps are fused with sigmoid attention (RobustSeg.py:69-74), AdaIN
image-reconstruction decoders regenerate each modality (computed for parity
but unused by the return, RobustSeg.py:77-85,95), and a U-Net MaskDecoder
produces the mask, stacked x3 on the modality axis.

AdaptiveRes2d quirk preserved: the reference overwrites the conv1 branch
with ``y = self.conv2(x)`` (RobustSeg.py:262), so only conv2's path affects
the output; conv1/norm1 params still exist.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import Conv, InstanceNorm
from corrifnet_tpu.nn.resize import resize_linear

__all__ = ["RobustMseg"]

Dtype = Any


class BasicConv2d(fnn.Module):
    """conv(bias=False) [-> dropout2d] [-> InstanceNorm] [-> ReLU]
    (RobustSeg.py:274-288)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    relu: bool = True
    norm: bool = True
    drop_rate: float = 0.0
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.out_ch, self.kernel, strides=self.stride,
                 padding=self.padding, use_bias=False, dtype=self.dtype,
                 name="conv")(x)
        if self.drop_rate > 0:
            x = fnn.Dropout(self.drop_rate, broadcast_dims=(1, 2), name="drop")(
                x, deterministic=not train
            )
        if self.norm:
            x = InstanceNorm(dtype=self.dtype, name="norm")(x)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class StyleEncoder(fnn.Module):
    base_ch: int = 32
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        b = self.base_ch
        cfg = [(b, 7, 1, 3), (b * 2, 4, 2, 1), (b * 4, 4, 2, 1),
               (b * 4, 4, 2, 1), (b * 4, 4, 2, 1)]
        for i, (ch, k, s, p) in enumerate(cfg):
            x = BasicConv2d(ch, k, s, p, relu=True, norm=False,
                            dtype=self.dtype, name=f"enc{i}")(x, train)
        x = x.mean(axis=(1, 2), keepdims=True)
        x = BasicConv2d(b * 4, 1, 1, 0, relu=False, norm=False,
                        dtype=self.dtype, name="final")(x, train)
        return x  # (B, 1, 1, 128)


class ContentEncoder(fnn.Module):
    base_filters: int = 16
    drop_rate: float = 0.3
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        bf = self.base_filters
        outs = []
        y = x
        for lvl, (ch, down) in enumerate(
            [(bf, False), (bf * 2, True), (bf * 4, True), (bf * 8, True)]
        ):
            c1 = BasicConv2d(ch, 3, 2 if down else 1, 1, relu=True, norm=False,
                             dtype=self.dtype, name=f"e{lvl + 1}c1")
            c2 = BasicConv2d(ch, 3, 1, 1, relu=True, norm=False,
                             drop_rate=self.drop_rate, dtype=self.dtype,
                             name=f"e{lvl + 1}c2")
            c3 = BasicConv2d(ch, 3, 1, 1, relu=True, norm=False,
                             dtype=self.dtype, name=f"e{lvl + 1}c3")
            first = c1(y, train)  # shared-weight double application quirk
            y = c3(c2(first, train), train) + c1(y, train)
            outs.append(y)
        return outs


class MLP2d(fnn.Module):
    mlp_ch: int = 128
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, style):
        from corrifnet_tpu.nn import Dense

        x = style.reshape(style.shape[0], -1)
        x = jax.nn.relu(Dense(self.mlp_ch, dtype=self.dtype, name="l1")(x))
        x = jax.nn.relu(Dense(self.mlp_ch, dtype=self.dtype, name="l2")(x))
        mu = Dense(self.mlp_ch, dtype=self.dtype, name="l_mu")(x)
        sigma = Dense(self.mlp_ch, dtype=self.dtype, name="l_sigma")(x)
        return mu[:, None, None, :], sigma[:, None, None, :]


def _adain(content, gamma, beta, eps=1e-5):
    """AdaptiveInstanceNorm2d with torch's unbiased std (RobustSeg.py:267-271)."""
    mean = content.mean(axis=(1, 2), keepdims=True)
    n = content.shape[1] * content.shape[2]
    var = ((content - mean) ** 2).sum(axis=(1, 2), keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    return gamma * ((content - mean) / (std + eps)) + beta


class ImageDecoder(fnn.Module):
    mlp_ch: int = 128
    out_ch: int = 3
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, style, content, train: bool = True):
        mu, sigma = MLP2d(self.mlp_ch, dtype=self.dtype, name="mlp")(style)
        x = content
        for i in range(4):
            # AdaptiveRes2d with the conv1-branch-overwritten quirk:
            # effective output = x + AdaIN(conv2(x))
            _ = BasicConv2d(self.mlp_ch, 3, 1, 1, relu=False, norm=False,
                            dtype=self.dtype, name=f"res{i}_conv1")(x, train)
            y = BasicConv2d(self.mlp_ch, 3, 1, 1, relu=False, norm=False,
                            dtype=self.dtype, name=f"res{i}_conv2")(x, train)
            y = _adain(y, mu, sigma)
            x = x + y
        ch = self.mlp_ch
        for i in range(3):
            x = resize_linear(x, (x.shape[1] * 2, x.shape[2] * 2),
                              align_corners=False)
            x = BasicConv2d(ch // 2, 5, 1, 2, relu=False, norm=False,
                            dtype=self.dtype, name=f"up{i}")(x, train)
            # F.layer_norm over (C,H,W) without params (RobustSeg.py:172)
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=(1, 2, 3), keepdims=True)
            var = ((xf - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
            x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
            x = jax.nn.relu(x)
            ch //= 2
        x = BasicConv2d(self.out_ch, 7, 1, 3, relu=False, norm=False,
                        dtype=self.dtype, name="final")(x, train)
        return x, mu, sigma


class MaskDecoder(fnn.Module):
    in_ch: int = 128
    num_classes: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, feats, train: bool = True):
        c = self.in_ch
        x = resize_linear(feats[3], (feats[3].shape[1] * 2, feats[3].shape[2] * 2),
                          align_corners=False)
        for i, ch in enumerate([c // 2, c // 2, c // 2]):
            x = BasicConv2d(ch, 3 if i < 2 else 1, 1, 1 if i < 2 else 0,
                            dtype=self.dtype, name=f"c3_{i + 1}")(x, train)
        x = jnp.concatenate([x, feats[2]], axis=-1)
        x = resize_linear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)
        for i, ch in enumerate([c // 4, c // 4, c // 4]):
            x = BasicConv2d(ch, 3 if i < 2 else 1, 1, 1 if i < 2 else 0,
                            dtype=self.dtype, name=f"c2_{i + 1}")(x, train)
        x = jnp.concatenate([x, feats[1]], axis=-1)
        x = resize_linear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)
        for i, ch in enumerate([c // 8, c // 8, c // 8]):
            x = BasicConv2d(ch, 3 if i < 2 else 1, 1, 1 if i < 2 else 0,
                            dtype=self.dtype, name=f"c1_{i + 1}")(x, train)
        x = jnp.concatenate([x, feats[0]], axis=-1)
        return BasicConv2d(self.num_classes, 1, 1, 0, relu=False, norm=False,
                           dtype=self.dtype, name="final")(x, train)


class RobustMseg(fnn.Module):
    n_base_filters: int = 16
    final_sigmoid: bool = True
    # style_noise == the reference's ``valid=True`` path (RobustSeg.py:61-62):
    # every per-modality style code is replaced by standard-normal noise
    # before the reconstruction decoders (needs a 'style_noise' RNG stream).
    style_noise: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, M=3, C=3, H, W)
        b, m, c, h, w = x.shape
        cdtype = self.dtype or x.dtype
        xm = jnp.moveaxis(x, 2, -1).astype(cdtype)  # (B, M, H, W, C)
        # modality-drop detection (RobustSeg.py:214): sum in f32 regardless
        # of the wire dtype — a bf16-accumulated sum could cancel to exactly
        # 0 on a present modality, so the detection must not inherit the
        # wire cast's compute dtype (ADVICE r4)
        drop = (
            x.reshape(b, m, -1).astype(jnp.float32).sum(axis=2) == 0
        ).astype(cdtype)  # (B, M)

        VStyle = fnn.vmap(StyleEncoder, in_axes=(0, None), out_axes=0,
                          variable_axes={"params": 0},
                          split_rngs={"params": True, "dropout": True})
        VContent = fnn.vmap(ContentEncoder, in_axes=(0, None), out_axes=0,
                            variable_axes={"params": 0},
                            split_rngs={"params": True, "dropout": True})
        xmod = jnp.swapaxes(xm, 0, 1)  # (M, B, H, W, C)
        styles = VStyle(dtype=self.dtype, name="style_enc")(xmod, train)
        if self.style_noise:
            styles = jax.random.normal(
                self.make_rng("style_noise"), styles.shape, jnp.float32
            ).astype(styles.dtype)
        contents = VContent(dtype=self.dtype, name="content_enc")(xmod, train)

        # ZeroLayer: zero dropped modalities fwd+bwd (multiply by mask)
        keep = (1.0 - drop).T[:, :, None, None, None]  # (M, B, 1, 1, 1)
        contents = [lvl * keep for lvl in contents]

        nf = self.n_base_filters
        shared = []
        for lvl in range(4):
            feats = contents[lvl]  # (M, B, H', W', C')
            cat = jnp.concatenate([feats[i] for i in range(3)], axis=-1)
            attn = BasicConv2d(3, 3, 1, 1, relu=False, norm=True,
                               dtype=self.dtype, name=f"content_attn{lvl}")(cat, train)
            attn = jax.nn.sigmoid(attn.astype(jnp.float32)).astype(cat.dtype)
            weighted = jnp.concatenate(
                [feats[i] * attn[..., i : i + 1] for i in range(3)], axis=-1
            )
            shared.append(
                BasicConv2d(nf * (2 ** lvl), 1, 1, 0, relu=True, norm=True,
                            dtype=self.dtype, name=f"content_share{lvl}")(weighted, train)
            )

        # reconstruction decoders (parity: params + traced compute; output
        # unused by the reference's return, RobustSeg.py:95)
        for i in range(3):
            ImageDecoder(mlp_ch=128, out_ch=3, dtype=self.dtype,
                         name=f"recon{i}")(styles[i], shared[-1], train)

        mask = MaskDecoder(in_ch=nf * 8, num_classes=1, dtype=self.dtype,
                           name="seg_decoder")(shared, train)
        mask = jax.nn.sigmoid(mask.astype(jnp.float32))
        mask = jnp.moveaxis(mask, -1, 1)  # (B, 1, H, W)
        return jnp.repeat(mask[:, None], 3, axis=1)  # (B, 3, 1, H, W)
