"""Spatial resizing with PyTorch-matching semantics, channels-last, TPU-first.

The reference mixes two interpolation flavours that must NOT be conflated:
  * ``mode='trilinear', align_corners=True`` — encoder x6 pyramid
    (mmvit4.py:187-191), decoder ``up2/up4/...`` (mmvit4.py:243-246) and
    ``up_to_224`` (mmvit4.py:263);
  * bare ``F.interpolate(x, size)`` with NO mode — torch defaults to
    **nearest** (decoder skip resizes, mmvit4.py:271,276,281,286).

Implementation strategy (TPU-first): interpolation along each axis is a
linear map, so we materialize small static interpolation matrices at trace
time (NumPy, shapes are static under jit) and contract them with the data —
the work lands on the MXU as matmuls instead of gather pipelines.

``align_corners=True`` coordinate rule (torch): src = dst*(S-1)/(D-1) for
D>1, else 0 (so up_to_224 on a D=128 volume takes depth slice 0 — quirk
preserved). Nearest rule: src = floor(dst*S/D).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_linear",
    "resize_nearest",
    "max_pool",
    "avg_pool",
    "upsample_bilinear_2d",
    "resize_linear_depth_prefix",
    "resize_nearest_depth_prefix",
]


@functools.lru_cache(maxsize=None)
def _linear_matrix(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """(dst, src) row-stochastic linear interpolation matrix."""
    w = np.zeros((dst, src), dtype=np.float32)
    for i in range(dst):
        if align_corners:
            x = i * (src - 1) / (dst - 1) if dst > 1 else 0.0
        else:
            x = max((i + 0.5) * src / dst - 0.5, 0.0)
        lo = int(np.floor(x))
        lo = min(lo, src - 1)
        hi = min(lo + 1, src - 1)
        frac = x - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


@functools.lru_cache(maxsize=None)
def _nearest_indices(src: int, dst: int) -> np.ndarray:
    """Torch 'nearest' source indices: floor(dst_idx * src / dst)."""
    idx = np.floor(np.arange(dst) * (src / dst)).astype(np.int32)
    return np.minimum(idx, src - 1)


def resize_linear(
    x: jnp.ndarray,
    size: Sequence[int],
    align_corners: bool = True,
    compute_dtype=None,
):
    """Linear/bilinear/trilinear resize of the spatial axes of a
    channels-last array ``(B, *spatial, C)`` to ``size``.

    Matches torch ``F.interpolate(mode='(bi|tri)linear')``. Interpolation
    runs in f32 by default; ``compute_dtype`` overrides it (the full-depth
    decoder's fused path interpolates bf16 volumes in bf16 — the MXU still
    accumulates the two-tap lerp in f32, and the f32 round trip doubled
    HBM traffic on the (B,64,128,128,C) volumes for no precision gain).
    """
    spatial_axes = tuple(range(1, x.ndim - 1))
    assert len(size) == len(spatial_axes), (x.shape, size)
    dtype = x.dtype
    ctype = compute_dtype or jnp.float32
    y = x
    for ax, dst in zip(spatial_axes, size):
        src = y.shape[ax]
        if src == dst:
            continue
        w = jnp.asarray(_linear_matrix(src, dst, align_corners), dtype=ctype)
        y = jnp.tensordot(
            w, y.astype(ctype), axes=[[1], [ax]]
        )  # -> dst axis first
        y = jnp.moveaxis(y, 0, ax)
    return y.astype(dtype)


@functools.lru_cache(maxsize=None)
def _nearest_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) one-hot gather matrix for nearest resize. Expressing the
    gather as a matmul makes the BACKWARD a matmul too (the transpose of a
    jnp.take is a scatter-add while-loop on TPU — measured at ~11 ms/step
    in the MMVit4 decoder before this change)."""
    w = np.zeros((dst, src), dtype=np.float32)
    w[np.arange(dst), _nearest_indices(src, dst)] = 1.0
    return w


def resize_nearest(x: jnp.ndarray, size: Sequence[int]):
    """Nearest-neighbour resize (torch ``F.interpolate`` default mode).

    Upsampling axes use the one-hot-matmul form (exact: one 1.0 per row);
    downsampling or same-size axes keep the cheap gather."""
    spatial_axes = tuple(range(1, x.ndim - 1))
    assert len(size) == len(spatial_axes), (x.shape, size)
    dtype = x.dtype
    y = x
    for ax, dst in zip(spatial_axes, size):
        src = y.shape[ax]
        if src == dst:
            continue
        if dst > src:
            # one-hot matmul in the INPUT dtype: every row holds a single
            # 1.0, so the product is bitwise-exact in bf16 as well (MXU
            # accumulates in f32) — an f32 round trip here materialized
            # multi-GB intermediates on the full-depth decoder's 128^3
            # skip resizes for no precision gain.
            w = jnp.asarray(_nearest_matrix(src, dst)).astype(dtype)
            y = jnp.tensordot(w, y, axes=[[1], [ax]])
            y = jnp.moveaxis(y, 0, ax).astype(dtype)
        else:
            idx = jnp.asarray(_nearest_indices(src, dst))
            y = jnp.take(y, idx, axis=ax)
    return y


def _pool(x, window, strides, padding, init_val, op):
    """reduce_window over spatial axes of channels-last input."""
    nspatial = x.ndim - 2
    window_dims = (1, *window, 1)
    stride_dims = (1, *strides, 1)
    pads = [(0, 0)] + [(p, p) for p in padding] + [(0, 0)]
    return jax.lax.reduce_window(x, init_val, op, window_dims, stride_dims, pads)


def max_pool(x, window, strides=None, padding=None):
    """Max pooling, torch-compatible (pads with -inf).

    ``window``/``strides``/``padding`` are per-spatial-axis tuples, e.g. the
    MMVit4 stem's MaxPool3d((1,3,3), (1,2,2), (0,1,1)) (mmvit4.py:123).
    """
    strides = strides or window
    padding = padding or tuple(0 for _ in window)
    return _pool(x, window, strides, padding, -jnp.inf, jax.lax.max)


def avg_pool(x, window, strides=None, padding=None, count_include_pad=True):
    """Average pooling (torch default counts padded zeros in the divisor)."""
    strides = strides or window
    padding = padding or tuple(0 for _ in window)
    summed = _pool(
        x.astype(jnp.float32), window, strides, padding, 0.0, jax.lax.add
    )
    if count_include_pad:
        denom = 1.0
        for w in window:
            denom *= w
        out = summed / denom
    else:
        ones = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
        counts = _pool(ones, window, strides, padding, 0.0, jax.lax.add)
        out = summed / counts
    return out.astype(x.dtype)


def resize_linear_depth_prefix(
    x, src_d_full: int, dst_d_full: int, d_prefix: int, hw_size, align_corners=True
):
    """Trilinear resize computing only the first ``d_prefix`` depth slices.

    Exact (same interpolation weights as the full resize, just fewer output
    rows) — used by the depth-pruned MMVit4 decoder where only the leading
    depth slices reach the final output. ``x`` is (B, D', H, W, C) where D'
    may already be a prefix of ``src_d_full``; asserts the prefix contains
    every source slice the requested output rows touch.
    """
    w_full = _linear_matrix(src_d_full, dst_d_full, align_corners)
    w = w_full[:d_prefix]
    needed = int(np.max(np.nonzero(np.any(w != 0, axis=0))[0])) + 1
    assert needed <= x.shape[1], (
        f"depth prefix {x.shape[1]} too small: need {needed} source slices"
    )
    wj = jnp.asarray(w[:, : x.shape[1]], dtype=jnp.float32)
    y = jnp.tensordot(wj, x.astype(jnp.float32), axes=[[1], [1]])
    y = jnp.moveaxis(y, 0, 1)  # (B, d_prefix, H, W, C)
    y = resize_linear(y, (d_prefix, *hw_size), align_corners=align_corners)
    return y.astype(x.dtype)


def resize_nearest_depth_prefix(x, dst_d_full: int, d_prefix: int, hw_size):
    """Nearest resize computing only the first ``d_prefix`` depth slices."""
    src_d = x.shape[1]
    idx = _nearest_indices(src_d, dst_d_full)[:d_prefix]
    y = jnp.take(x, jnp.asarray(idx), axis=1)
    return resize_nearest(y, (d_prefix, *hw_size))


def upsample_bilinear_2d(x, scale: int, align_corners: bool = True):
    """nn.Upsample(scale_factor=s, mode='bilinear') for NHWC input."""
    b, h, w, c = x.shape
    return resize_linear(x, (h * scale, w * scale), align_corners=align_corners)


def adaptive_max_pool(x, out_hw):
    """torch AdaptiveMaxPool2d: output (oh, ow) regardless of input size;
    output cell (i, j) takes the max over input rows
    [floor(i*H/oh), ceil((i+1)*H/oh)) x cols [floor(j*W/ow), ceil((j+1)*W/ow)).
    NHWC; static shapes (windows resolved at trace time)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, r0:r1, c0:c1, :].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


def adaptive_avg_pool(x, out_hw):
    """torch AdaptiveAvgPool2d with the same window rule."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, r0:r1, c0:c1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def max_pool_argmax(x, k: int, stride: int, padding: int):
    """2-D max pool returning (values, flat_indices) — torch
    ``MaxPool2d(return_indices=True)`` semantics: indices are row-major flat
    positions into the (unpadded) H*W input plane, per (batch, channel).

    NHWC input. Implemented with patch extraction + argmax (ENet's
    downsampling bottlenecks, F29_ENet.py:121-125).
    """
    b, h, w, c = x.shape
    neg = jnp.finfo(jnp.float32).min
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
        constant_values=neg,
    )
    ho = (h + 2 * padding - k) // stride + 1
    wo = (w + 2 * padding - k) // stride + 1
    # gather k*k shifted slices: (k*k, B, Ho, Wo, C)
    slices = [
        xp[:, i : i + stride * ho : stride, j : j + stride * wo : stride, :]
        for i in range(k)
        for j in range(k)
    ]
    stack = jnp.stack(slices, axis=0)
    arg = jnp.argmax(stack, axis=0)  # (B, Ho, Wo, C) in [0, k*k)
    vals = jnp.max(stack, axis=0).astype(x.dtype)
    # source coordinates in the unpadded plane
    oh = jax.lax.broadcasted_iota(jnp.int32, (b, ho, wo, c), 1)
    ow = jax.lax.broadcasted_iota(jnp.int32, (b, ho, wo, c), 2)
    kh = arg // k
    kw = arg % k
    src_h = oh * stride - padding + kh
    src_w = ow * stride - padding + kw
    flat = src_h * w + src_w
    return vals, flat


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def max_unpool(x, indices, out_hw):
    """torch ``MaxUnpool2d``: scatter values to ``indices`` (flat H*W
    positions) in a zero canvas of spatial size ``out_hw``. NHWC.

    Custom VJP: torch's backward is a plain gather
    (``grad_in[i] = grad_out[indices[i]]``), so when two pooled outputs
    point at the SAME source element (overlapping k=3/s=2 windows make
    duplicate indices common) BOTH writers receive the gradient. JAX's
    native scatter-set VJP gives it to only one winner, which silently
    drops gradient mass along ENet's unpool main branches."""
    return _max_unpool_impl(x, indices, out_hw)


def _max_unpool_impl(x, indices, out_hw):
    b, h, w, c = x.shape
    oh, ow = out_hw
    vals = x.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    idx = indices.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    canvas = jnp.zeros((b * c, oh * ow), x.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    canvas = canvas.at[rows, idx].set(vals)
    return canvas.reshape(b, c, oh, ow).transpose(0, 2, 3, 1)


def _max_unpool_fwd(x, indices, out_hw):
    return _max_unpool_impl(x, indices, out_hw), (indices, x.shape)


def _max_unpool_bwd(out_hw, res, g):
    indices, x_shape = res
    b, h, w, c = x_shape
    gf = g.transpose(0, 3, 1, 2).reshape(b * c, -1)
    idx = indices.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    rows = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    gx = gf[rows, idx].reshape(b, c, h, w).transpose(0, 2, 3, 1)
    d_idx = np.zeros(indices.shape, jax.dtypes.float0)
    return gx.astype(g.dtype), d_idx


max_unpool.defvjp(_max_unpool_fwd, _max_unpool_bwd)
