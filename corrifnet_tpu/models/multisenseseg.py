"""MultiSenseSeg — multi-branch MSE heads + AMM cross-modality fusion +
Swin-style windowed backbone + PPM/FPN neck + gated decode head
(reference: MultiSenseSeg.py:1137-1297, constructed as
``MultiSenseSeg(n_classes=1, in_chans=(3,3,3), n_branch=3)``).

Reference quirks preserved deliberately:
  * the angular positional scalars (MultiSenseSeg.py:1098-1101) are held in
    a plain Python list, so torch never registers/trains them — implemented
    as the constants cos(0°), cos(45°), cos(90°);
  * token BatchNorm from the file's LAST ``creat_norm_layer`` definition
    (MultiSenseSeg.py:894-917) omits the rearrange-back, so ``CNNMlp``
    receives (B, C, L) and its transpose+view scrambles the (L, C) buffer
    into (C, H, W) (MultiSenseSeg.py:352) — reproduced with the identical
    row-major reshape;
  * AMM attention is channel-by-channel cosine similarity with a clamped
    log-scaled temperature, sigmoid continuous-relative-position bias and
    the inverted double softmax ``softmax(1 - softmax(sim))``
    (MultiSenseSeg.py:1012-1022);
  * AMM q/k use MaxPool(8) + UNPADDED depthwise 3x3 (spatial 28 -> 26 at
    224 input), heads split the flattened spatial axis
    (MultiSenseSeg.py:976-1010).

Tensors in this module follow torch NCHW/token layouts internally (the
reference's reshape semantics are load-bearing); convs are applied through
channels-last wrappers.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from corrifnet_tpu.nn import BatchNorm, Conv, Dense, LayerNorm, max_pool
from corrifnet_tpu.nn.resize import resize_linear

__all__ = ["MultiSenseSeg"]

Dtype = Any


def _nchw(x):
    return jnp.moveaxis(x, -1, 1)


def _nhwc(x):
    return jnp.moveaxis(x, 1, -1)


class _ConvBNAct(fnn.Module):
    """conv -> BN -> act on NCHW input (helper)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    bn: bool = True
    act: str = "relu"  # 'relu' | 'relu6' | 'gelu' | 'none'
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        y = Conv(self.features, self.kernel, strides=self.stride,
                 padding=self.padding, groups=self.groups,
                 use_bias=self.use_bias, dtype=self.dtype, name="conv")(_nhwc(x))
        if self.bn:
            y = BatchNorm(dtype=self.dtype, name="bn")(y, use_running_average=not train)
        if self.act == "relu":
            y = jax.nn.relu(y)
        elif self.act == "relu6":
            y = jnp.minimum(jax.nn.relu(y), 6.0)
        elif self.act == "gelu":
            y = jax.nn.gelu(y, approximate=False)
        return _nchw(y)


class SEAttention(fnn.Module):
    in_chans: int
    ratio: int = 4
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):  # NCHW
        w = x.mean(axis=(2, 3), keepdims=True)
        w = _ConvBNAct(self.in_chans // self.ratio, 1, use_bias=False, bn=False,
                       act="relu6", dtype=self.dtype, name="fc1")(w)
        w = _ConvBNAct(self.in_chans, 1, use_bias=False, bn=False, act="none",
                       dtype=self.dtype, name="fc2")(w)
        return x * jax.nn.sigmoid(w.astype(jnp.float32)).astype(x.dtype)


class CBAMAttention(fnn.Module):
    in_chans: int
    ratio: int = 4
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        c1 = _ConvBNAct(self.in_chans // self.ratio, 1, use_bias=False, bn=False,
                        act="relu6", dtype=self.dtype, name="conv1")
        c2 = _ConvBNAct(self.in_chans, 1, use_bias=False, bn=False, act="none",
                        dtype=self.dtype, name="conv2")
        avg = c2(c1(x.mean(axis=(2, 3), keepdims=True)))
        mx = c2(c1(x.max(axis=(2, 3), keepdims=True)))
        w = jax.nn.sigmoid((avg + mx).astype(jnp.float32)).astype(x.dtype)
        return x * w


class MSE(fnn.Module):
    """Modality-specific extractor (MultiSenseSeg.py:920-954)."""

    out_chans: int
    n_group: int = 4
    pos: float = 0.0
    use_pos: bool = True
    chan_attn_type: str = "SE"
    ratio: int = 16
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):  # NCHW
        x = _ConvBNAct(self.out_chans, 3, 1, 1, use_bias=False, dtype=self.dtype,
                       name="conv1")(x, train)
        short_cut = x
        y = _ConvBNAct(self.out_chans // 2, 1, use_bias=False, bn=False,
                       act="none", dtype=self.dtype, name="conv2")(x)
        if self.use_pos:
            y = y + jnp.asarray(self.pos, y.dtype)
        y = _ConvBNAct(self.out_chans // 2, 3, 1, 1, groups=self.n_group,
                       act="none", dtype=self.dtype, name="conv3_dw")(y, train)
        y = _ConvBNAct(self.out_chans, 1, bn=False, act="relu",
                       dtype=self.dtype, name="conv3_pw")(y)
        y = y + short_cut
        attn = (SEAttention if self.chan_attn_type == "SE" else CBAMAttention)(
            self.out_chans, self.ratio, dtype=self.dtype, name="attn"
        )
        return attn(y)


class AMM(fnn.Module):
    """Cross-modality channel-attention fusion (MultiSenseSeg.py:957-1030)."""

    in_chans: int
    out_chans: int
    n_branch: int
    offset_scale: int = 16
    patch_size: int = 4
    n_heads: int = 4
    fuse_drop: float = 0.0
    qkv_bias: bool = True
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):  # NCHW
        b, c, H, W = x.shape
        det = not train
        p = self.patch_size
        nh = self.n_heads

        sc = Conv(self.out_chans, p, strides=p, dtype=self.dtype,
                  name="short_cut_conv")(_nhwc(x))
        sc = LayerNorm(dtype=self.dtype, name="short_cut_ln")(sc)
        sc = _nchw(sc)

        def conv1x1_grouped(t, name):
            return _nchw(Conv(self.in_chans, 1, groups=self.n_branch,
                              use_bias=self.qkv_bias, dtype=self.dtype,
                              name=name)(_nhwc(t)))

        q = conv1x1_grouped(x, "q")
        k = conv1x1_grouped(x, "k")
        v = conv1x1_grouped(x, "v")

        def pool_dw(t, name):
            t = _nhwc(t)
            t = max_pool(t, (self.offset_scale, self.offset_scale),
                         (self.offset_scale, self.offset_scale))
            t = Conv(self.in_chans, 3, groups=self.in_chans, dtype=self.dtype,
                     name=name)(t)  # UNPADDED depthwise (quirk)
            return _nchw(t)

        q = pool_dw(q, "q_proj").reshape(b, c, -1)
        k = pool_dw(k, "k_proj").reshape(b, c, -1)
        v = _nchw(Conv(self.in_chans, p, strides=p, groups=self.in_chans,
                       dtype=self.dtype, name="v_proj")(_nhwc(v))).reshape(b, c, -1)

        # heads split the flattened SPATIAL axis (MultiSenseSeg.py:1008-1010)
        def heads(t):
            return t.reshape(b, c, nh, -1).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        qn = qh / (jnp.linalg.norm(qh, axis=-1, keepdims=True) + 1e-12)
        kn = kh / (jnp.linalg.norm(kh, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bhcd,bhed->bhce", qn, kn)

        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, math.log(10.0), jnp.float32),
            (nh, 1, 1),
        )
        sim = sim * jnp.exp(jnp.clip(logit_scale, max=math.log(100.0)))

        # continuous relative position bias over channel pairs
        rpb = _amm_relative_bias(self.in_chans)  # (C, C, 1) static
        h1 = Dense(16 * self.n_branch, dtype=self.dtype, name="cpb_fc1")(
            jnp.asarray(rpb, jnp.float32)
        )
        h1 = jax.nn.relu(h1)
        h2 = Dense(nh, use_bias=False, dtype=self.dtype, name="cpb_fc2")(h1)
        bias = jax.nn.sigmoid(h2.transpose(2, 0, 1))  # (nh, C, C)
        sim = sim + bias[None]

        sim = jax.nn.softmax(
            1.0 - jax.nn.softmax(sim.astype(jnp.float32), axis=-1), axis=-1
        ).astype(x.dtype)
        sim = fnn.Dropout(self.fuse_drop, name="attn_drop")(sim, deterministic=det)

        out = jnp.einsum("bhce,bhed->bhcd", sim, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, c, -1)
        out = out.reshape(b, -1, H // p, W // p)

        out = _ConvBNAct(self.in_chans, 1, bn=False, act="gelu", dtype=self.dtype,
                         name="proj1")(out)
        out = _ConvBNAct(self.out_chans, 1, bn=False, act="none", dtype=self.dtype,
                         name="proj2")(out)
        out = fnn.Dropout(self.fuse_drop, name="proj_drop")(out, deterministic=det)
        out = _nchw(LayerNorm(dtype=self.dtype, name="norm")(_nhwc(out)))
        return out + sc, x


@functools.lru_cache(maxsize=None)
def _amm_relative_bias(c: int) -> np.ndarray:
    """Log-scaled signed channel-offset table (MultiSenseSeg.py:987-993)."""
    coords = np.zeros((c, c), dtype=np.float64)
    for idx in range(c):
        coords[idx] = np.arange(c) - idx
    bias = coords / coords.max()
    bias *= 8
    bias = np.sign(bias) * np.log2(np.abs(bias) + 1.0) / np.log2(8)
    return bias[..., None].astype(np.float32)


# ---------------------------------------------------------------------------
# Swin-style backbone
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def _swin_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Shifted-window attention mask (MultiSenseSeg.py:686-705)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(fnn.Module):
    """FC/CNN window self-attention (MultiSenseSeg.py:365-494 — the CNN
    variant's 1x1-conv qkv is mathematically per-token linear; the only
    difference is the bias-free proj)."""

    dim: int
    window: Tuple[int, int]
    n_heads: int
    qkv_bias: bool = True
    qk_ratio: float = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    proj_bias: bool = True  # False for the CNN variant
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        bw, n, d = x.shape
        nh = self.n_heads
        if self.qk_ratio is None:
            qkv_dim = d * 3
        else:
            qkv_dim = int(d + 2 * (d // self.qk_ratio // nh) * nh)
        qkv = Dense(qkv_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        q, k = jnp.split(qkv[..., : qkv_dim - d], 2, axis=-1)
        v = qkv[..., -d:]
        head_dim = d // nh
        scale = head_dim ** -0.5

        def heads(t):
            return t.reshape(bw, n, nh, -1).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * scale

        table = self.param(
            "relative_position_bias_table",
            fnn.initializers.normal(0.02),
            ((2 * self.window[0] - 1) * (2 * self.window[1] - 1), nh),
            jnp.float32,
        )
        idx = jnp.asarray(_relative_position_index(*self.window).reshape(-1))
        bias = table[idx].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(bw, nh, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = fnn.Dropout(self.attn_drop, name="attn_drop")(
            attn, deterministic=deterministic
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, d)
        out = Dense(d, use_bias=self.proj_bias, dtype=self.dtype, name="proj")(out)
        out = fnn.Dropout(self.proj_drop, name="proj_drop")(
            out, deterministic=deterministic
        )
        return out


class CNNMlp(fnn.Module):
    """Grouped-conv token FFN with the (B,C,L)->(B,L,C)->view(B,C,H,W)
    scramble quirk (MultiSenseSeg.py:330-362 + 894-917; see module docs)."""

    in_chans: int
    hidden: int
    n_group: int
    drop: float = 0.0
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x_bcl, H, W, train: bool = True):
        b, c, l = x_bcl.shape
        det = not train
        # the reference: (B,C,L).transpose(1,2).view(B,C,H,W) — row-major
        # reinterpretation of the (L,C) buffer (scramble, preserved)
        x = x_bcl.transpose(0, 2, 1).reshape(b, c, H, W)
        short_cut = x
        y = _ConvBNAct(self.hidden, 1, groups=self.n_group, bn=False,
                       act="gelu", dtype=self.dtype, name="convup")(x)
        y = fnn.Dropout(self.drop, name="d1")(y, deterministic=det)
        y = _ConvBNAct(self.hidden, 3, 1, 1, groups=self.hidden, use_bias=False,
                       act="gelu", dtype=self.dtype, name="dw")(y, train)
        y = fnn.Dropout(self.drop, name="d2")(y, deterministic=det)
        y = _ConvBNAct(self.in_chans, 1, bn=False, act="none", dtype=self.dtype,
                       name="convdown")(y)
        y = fnn.Dropout(self.drop, name="d3")(y, deterministic=det)
        y = short_cut + y
        return y.reshape(b, c, -1).transpose(0, 2, 1)  # (B, L, C)


class DropPath(fnn.Module):
    rate: float = 0.0

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class BasicBlock(fnn.Module):
    """Swin block with shift + CNN FFN (MultiSenseSeg.py:553-630)."""

    dim: int
    n_heads: int
    window: int
    shift: int
    mlp_ratio: float
    qk_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    qkv_type: str
    group_dim: int
    idx2group: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, H, W, mask, train: bool = True):
        b, l, c = x.shape
        det = not train
        shortcut = x
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = y.reshape(b, H, W, c)

        w = self.window
        pad_r = (w - W % w) % w
        pad_b = (w - H % w) % w
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = y.shape[1], y.shape[2]

        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            attn_mask = jnp.asarray(_swin_attn_mask(hp, wp, w, self.shift))
        else:
            attn_mask = None

        y = y.reshape(b, hp // w, w, wp // w, w, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)
        y = WindowAttention(
            self.dim, (w, w), self.n_heads, self.qkv_bias, self.qk_ratio,
            self.attn_drop, self.drop,
            proj_bias=self.qkv_type != "CNN", dtype=self.dtype, name="attn",
        )(y, attn_mask, deterministic=det)
        y = y.reshape(b, hp // w, wp // w, w, w, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)

        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :H, :W].reshape(b, l, c)
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(y, deterministic=det)

        # norm2: token BatchNorm1d per channel (the reference's last
        # creat_norm_layer outputs (B, C, L) without rearranging back)
        normed = BatchNorm(dtype=self.dtype, name="norm2")(
            x, use_running_average=not train
        )  # (B, L, C), stats per channel
        normed = normed.transpose(0, 2, 1)  # (B, C, L) as the reference emits
        n_group = (c // self.group_dim) if self.idx2group == 0 else 1
        mlp_out = CNNMlp(c, int(c * self.mlp_ratio), n_group, self.drop,
                         dtype=self.dtype, name="mlp")(normed, H, W, train)
        return dp(mlp_out, deterministic=det) + x


class PatchMerging(fnn.Module):
    """Downsampling_block (MultiSenseSeg.py:522-550)."""

    out_chans: int
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, H, W):
        b, l, c = x.shape
        y = x.reshape(b, H, W, c)
        if H % 2 or W % 2:
            y = jnp.pad(y, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        y = jnp.concatenate(
            [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2], y[:, 1::2, 1::2]],
            axis=-1,
        )
        y = y.reshape(b, -1, 4 * c)
        y = LayerNorm(dtype=self.dtype, name="ln")(y)
        return Dense(self.out_chans, use_bias=False, dtype=self.dtype,
                     name="reduction")(y)


class SwinBackbone(fnn.Module):
    """Build_backbone (MultiSenseSeg.py:722-842), patch_embed skipped when
    ``patch_size is None`` (the default MultiSenseSeg config)."""

    embed_dim: int = 96
    group_dim: int = 8
    depths: Tuple[int, ...] = (2, 2, 8, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 8
    mlp_ratio: float = 4.0
    qk_ratio: float = 1.5
    qkv_bias: bool = True
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.1
    drop_path_rate: float = 0.1
    qkv_type: str = "FC"
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x_nchw, train: bool = True):
        b, c, H, W = x_nchw.shape
        x = x_nchw.reshape(b, c, H * W).transpose(0, 2, 1)  # (B, L, C)
        x = fnn.Dropout(self.drop_rate, name="pos_drop")(x, deterministic=not train)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        outs = []
        offset = 0
        for li, depth in enumerate(self.depths):
            d = int(self.embed_dim * 2 ** li)
            for i in range(depth):
                x = BasicBlock(
                    dim=d, n_heads=self.num_heads[li], window=self.window,
                    shift=0 if i % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio, qk_ratio=self.qk_ratio,
                    qkv_bias=self.qkv_bias, drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=float(dpr[offset + i]), qkv_type=self.qkv_type,
                    group_dim=self.group_dim, idx2group=i % 2,
                    dtype=self.dtype, name=f"stage{li}_block{i}",
                )(x, H, W, None, train)
            offset += depth
            out = LayerNorm(dtype=self.dtype, name=f"out_norm{li}")(x)
            outs.append(out.reshape(b, H, W, d).transpose(0, 3, 1, 2))
            if li < len(self.depths) - 1:
                x = PatchMerging(d * 2, dtype=self.dtype, name=f"merge{li}")(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
        return tuple(outs)


class CNNBlock(fnn.Module):
    """CNN_Block (MultiSenseSeg.py:845-867): 3x3 conv-BN-ReLU, 3x3 conv-BN,
    projection shortcut when shape changes, ReLU after the residual add."""

    planes: int
    stride: int = 1
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):  # NCHW
        cin = x.shape[1]
        y = _ConvBNAct(self.planes, 3, self.stride, 1, use_bias=False,
                       dtype=self.dtype, name="c1")(x, train)
        y = _ConvBNAct(self.planes, 3, 1, 1, use_bias=False, act="none",
                       dtype=self.dtype, name="c2")(y, train)
        short = x
        if self.stride != 1 or cin != self.planes:
            short = _ConvBNAct(self.planes, 1, self.stride, 0, use_bias=False,
                               act="none", dtype=self.dtype, name="short")(x, train)
        return _nchw(jax.nn.relu(_nhwc(y + short)))


class CNNBackbone(fnn.Module):
    """CNN_backbone (MultiSenseSeg.py:870-892): the ``use_faster`` 4-stage
    residual backbone — blocks (3,4,6,3), widths c/2c/4c/8c, strides
    1/2/2/2 (stage 1 keeps full resolution, unlike the Swin patch embed)."""

    chans: int = 64
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x_nchw, train: bool = True):
        outs = []
        y = x_nchw
        for li, (blocks, mult, stride) in enumerate(
            ((3, 1, 1), (4, 2, 2), (6, 4, 2), (3, 8, 2))
        ):
            for bi in range(blocks):
                y = CNNBlock(
                    planes=self.chans * mult, stride=stride if bi == 0 else 1,
                    dtype=self.dtype, name=f"layer{li + 1}_block{bi}",
                )(y, train)
            outs.append(y)
        return tuple(outs)


class PPM(fnn.Module):
    out_chans: int = 512
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):  # NCHW
        b, c, h, w = x.shape
        from corrifnet_tpu.nn.resize import adaptive_max_pool

        xs = [x]
        for i, ps in enumerate(self.pool_sizes):
            y = adaptive_max_pool(_nhwc(x), (ps, ps))
            y = Conv(self.out_chans, 1, use_bias=False, dtype=self.dtype,
                     name=f"pool_proj{i}")(y)
            y = jax.nn.relu(y)
            y = resize_linear(y, (h, w), align_corners=True)
            xs.append(_nchw(y))
        y = jnp.concatenate(xs, axis=1)
        return _ConvBNAct(self.out_chans, 3, 1, 1, use_bias=False,
                          dtype=self.dtype, name="bottom")(y, train)


class FPNNeck(fnn.Module):
    in_chans: int
    depth: int
    out_chans: int = 512
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, feats, train: bool = True):
        # feats: deepest-first list; feats[0] already PPM'd (out_chans)
        feats = list(feats)
        stage_rev = list(range(self.depth))[::-1]
        out = [feats[0]]
        fpn_x = feats[0]
        for i in range(self.depth - 1):
            up = _nchw(resize_linear(
                _nhwc(feats[i]),
                (feats[i].shape[2] * 2, feats[i].shape[3] * 2),
                align_corners=True,
            ))
            lateral = _ConvBNAct(self.out_chans, 1, use_bias=False,
                                 dtype=self.dtype, name=f"conv_{i}")(feats[i + 1], train)
            fpn_x = _ConvBNAct(self.out_chans, 3, 1, 1, use_bias=False,
                               dtype=self.dtype, name=f"fpn_conv{i}")(up, train) + lateral
            feats[i + 1] = fpn_x
            out.append(fpn_x)
        out = out[::-1]
        h, w = out[0].shape[2], out[0].shape[3]
        for i in range(1, len(out)):
            out[i] = _nchw(resize_linear(_nhwc(out[i]), (h, w), align_corners=True))
        y = jnp.concatenate(out, axis=1)
        return _ConvBNAct(self.out_chans, 3, 1, 1, use_bias=False,
                          dtype=self.dtype, name="out")(y, train)


class DecodeGate(fnn.Module):
    """Build_decode_gate (MultiSenseSeg.py:112-160)."""

    in_chans: int
    n_classes: int
    en_chans: int
    chan_ratio: int = 8
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x_en, x_de, train: bool = True):  # both NCHW
        head = self.in_chans // 2
        short_cut = x_de
        y = _ConvBNAct(head, 3, 1, 1, use_bias=False, act="none",
                       dtype=self.dtype, name="conv")(x_de, train)

        # Spatial_attention (MultiSenseSeg.py:41-65)
        en = _nhwc(x_en)
        en = max_pool(en, (4, 4), (4, 4))
        en = Conv(head, 1, dtype=self.dtype, name="sa_conv1")(en)
        en = BatchNorm(dtype=self.dtype, name="sa_bn1")(
            en, use_running_average=not train
        )
        en = _nchw(en)
        de = _ConvBNAct(head, 1, act="none", dtype=self.dtype, name="sa_conv2")(y, train)
        a = jax.nn.relu(en + de)
        a = _ConvBNAct(1, 1, act="none", dtype=self.dtype, name="sa_attn")(a, train)
        a = jax.nn.sigmoid(a.astype(jnp.float32)).astype(y.dtype)
        # the gate multiplies the conv2-TRANSFORMED decoder features, not the
        # pre-conv2 tensor (Spatial_attention returns x_de * attn where
        # x_de = conv2(x_de), MultiSenseSeg.py:61-65)
        spat = de * a

        chan = SEAttention(head, self.chan_ratio, dtype=self.dtype,
                           name="chan_attn")(y)
        f = spat + chan
        f = _ConvBNAct(head, 3, 1, 1, groups=head, act="none", dtype=self.dtype,
                       name="dw1")(f, train)
        f = _ConvBNAct(self.in_chans, 1, use_bias=False, bn=False, act="none",
                       dtype=self.dtype, name="dw2")(f)
        out = short_cut + f
        out = jax.nn.relu(out)
        out = _ConvBNAct(self.n_classes, 1, bn=False, act="none",
                         dtype=self.dtype, name="out_conv")(out)
        out = _nchw(resize_linear(
            _nhwc(out), (out.shape[2] * 4, out.shape[3] * 4), align_corners=True
        ))
        return out


class MultiSenseSeg(fnn.Module):
    n_classes: int = 1
    in_chans: Tuple[int, ...] = (3, 3, 3)
    n_branch: int = 3
    decoder_chans: int = 512
    head_out_chans: int = 32
    group_dim: int = 8
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 8, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 8
    chan_ratio: int = 8
    use_faster: bool = False  # CNN backbone instead of Swin (MultiSenseSeg.py:1231)
    aux: bool = False  # auxiliary FCN head params (MultiSenseSeg.py:1251-1256)
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, M, C, H, W) -> unbind modalities (MultiSenseSeg.py:1279-1284)
        cdtype = self.dtype or x.dtype
        x = x.astype(cdtype)
        branches = [x[:, m] for m in range(self.n_branch)]

        # angular positional constants (unregistered params in the reference)
        ang_table = list(range(0, 136, 135 // self.n_branch))
        fuse = []
        for i in range(self.n_branch):
            pos = math.cos(ang_table[i] * math.pi / 180)
            fuse.append(
                MSE(self.head_out_chans,
                    n_group=self.head_out_chans // 2 // self.group_dim,
                    pos=pos, use_pos=True, ratio=self.chan_ratio,
                    dtype=self.dtype, name=f"MSE{i}")(branches[i], train)
            )
        cat = jnp.concatenate(fuse, axis=1)  # (B, 96, H, W)

        # use_faster forces embed_dim=64 (MultiSenseSeg.py:1185)
        ed = 64 if self.use_faster else self.embed_dim
        amm_out, short_cut = AMM(
            in_chans=self.head_out_chans * self.n_branch,
            out_chans=ed, n_branch=self.n_branch,
            offset_scale=8, patch_size=4, n_heads=4, fuse_drop=0.1,
            qkv_bias=True, dtype=self.dtype, name="AMM",
        )(cat, train)
        de_x = _ConvBNAct(self.head_out_chans, 3, 1, 1, use_bias=False,
                          dtype=self.dtype, name="smooth")(short_cut, train)

        if self.use_faster:
            feats = CNNBackbone(chans=ed, dtype=self.dtype, name="backbone")(
                amm_out, train
            )
        else:
            feats = SwinBackbone(
                embed_dim=ed, group_dim=self.group_dim,
                depths=self.depths, num_heads=self.num_heads,
                window=self.window_size, dtype=self.dtype, name="backbone",
            )(amm_out, train)

        if self.aux:
            # Auxiliary FCN head over the penultimate backbone level. The
            # reference defines these params but its forward keeps the aux
            # branch commented out (MultiSenseSeg.py:1292); here the map is
            # computed and sown as an intermediate so the capability is
            # usable without changing the return contract.
            ax = _ConvBNAct(self.decoder_chans // 2, 3, 1, 1, use_bias=False,
                            dtype=self.dtype, name="aux_conv")(feats[-2], train)
            ax = Conv(self.n_classes, 1, dtype=self.dtype, name="aux_head")(
                _nhwc(ax)
            )
            self.sow("intermediates", "aux_out", _nchw(ax))

        # neck: reversed features, PPM on the deepest (MultiSenseSeg.py:261-265)
        rev = list(feats)[::-1]
        rev[0] = PPM(self.decoder_chans, dtype=self.dtype, name="ppm")(rev[0], train)
        neck = FPNNeck(ed, len(self.depths), self.decoder_chans,
                       dtype=self.dtype, name="fpn")(rev, train)

        out = DecodeGate(self.decoder_chans, self.n_classes,
                         en_chans=self.head_out_chans,
                         chan_ratio=self.chan_ratio, dtype=self.dtype,
                         name="decode_gate")(de_x, neck, train)
        out = out[:, None].repeat(self.n_branch, axis=1)  # (B, M, cls, H, W)
        return jax.nn.sigmoid(out.astype(jnp.float32))
