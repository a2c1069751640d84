"""Exact depth-structure fusion for the full-depth decoder convs.

The MMVit4 decoder cascade (reference mmvit4.py:266-292) interleaves depth
resizes with replicate-padded 3^3 convs on volumes up to (B,128,128,128,C).
Both resize flavours are LINEAR maps along depth, and a 3-tap depth conv is
a banded linear map — so conv-after-resize contracts into a single static
depth-expansion matrix applied to a conv computed at the COARSE depth:

    y[d] = sum_t W_t (*) x[clamp(d+t-1)]      with  x = R z   (R: depth resize)
         = sum_t W_t (*) (R z)[clamp(d+t-1)]
         = sum_{t,k} M[d,t,k] * (W_t (*) z[k]),   M[d,t,:] = R[clamp(d+t-1), :]

  * c1 convs (d1_c1 ...): R is the align-corners depth-linear up2 —
    the conv runs at HALF the depth rows and the depth-materialized
    trilinear volume is never built;
  * c2 convs (d1_c2 ...): the skip block of input channels is
    nearest-resized from 3 depth rows — its conv collapses to a
    3-coarse-row conv (R is a one-hot slab selector), leaving only the
    narrow run block at fine depth.

Exact: same math as resize-then-conv, differing only in f32 reassociation
(verified <1e-6 rel in tests/test_depthfuse.py; measured on hardware in
scripts/micro_depthfuse.py — NOTES round-4).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from corrifnet_tpu.nn.resize import _linear_matrix, _nearest_matrix

__all__ = ["tap_expand_table", "fused_resize_conv"]


@functools.lru_cache(maxsize=None)
def tap_expand_table(
    kind: str, src_d: int, dst_d: int, pad_mode: str = "replicate"
) -> np.ndarray:
    """(dst_d, 3, src_d) table M: output depth row d, conv tap t reads the
    coarse rows R[d+t-1] of the depth-resize matrix R, with the conv's
    depth padding baked in (replicate == index clamp; zeros == zero row).
    kind: 'linear' (align_corners=True, the decoder up2) | 'nearest'
    (torch default F.interpolate, the skip resizes)."""
    if kind == "linear":
        a = _linear_matrix(src_d, dst_d, True)
    elif kind == "nearest":
        a = _nearest_matrix(src_d, dst_d)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(kind)
    idx = np.arange(dst_d)[:, None] + np.arange(3)[None, :] - 1
    m = a[np.clip(idx, 0, dst_d - 1)]  # (dst_d, 3, src_d)
    if pad_mode != "replicate":
        m = m * ((idx >= 0) & (idx < dst_d))[..., None]
    return m


def fused_resize_conv(x, kernel, dst_d, kind, pad_mode, pd, cdtype):
    """conv3d(depth_resize(x, dst_d), kernel) without materializing the
    fine-depth volume: tap-major coarse 2-D conv + one depth-expansion
    einsum.

    x: (B, S, H, W, C) — depth-COARSE, H/W already at the conv's resolution
       (H/W resizing does not commute with the 3x3 spatial taps and is done
       by the caller; depth/HW resize order swap is exact for separable
       interpolation).
    kernel: (3, kh, kw, C, CO) depth-tap-major; pd: ((1,1),(ph,ph),(pw,pw)).
    Returns (B, dst_d, H', W', CO), no bias.
    """
    from corrifnet_tpu.nn.conv import _conv2d

    b, s, h, w, c = x.shape
    co = kernel.shape[-1]
    if pad_mode == "replicate" and (pd[1] != (0, 0) or pd[2] != (0, 0)):
        x = jnp.pad(x, [(0, 0), (0, 0), pd[1], pd[2], (0, 0)], mode="edge")
        pad2d = [(0, 0), (0, 0)]
    else:
        pad2d = [pd[1], pd[2]]
    kcat = jnp.concatenate([kernel[t] for t in range(3)], axis=-1)
    u = _conv2d(
        x.reshape(b * s, *x.shape[2:]), kcat, (1, 1), pad2d, (1, 1), 1, cdtype
    )
    u = u.reshape(b, s, u.shape[1], u.shape[2], 3 * co)
    m = jnp.asarray(tap_expand_table(kind, s, dst_d, pad_mode)).astype(cdtype)
    # per-tap tensordot + moveaxis — the same contraction idiom as
    # nn/resize.py (a single fused einsum over (t, k) sent the remote
    # compile helper into a >30 min compile at the level-1 shapes; the
    # per-tap form compiles like the resizes it replaces)
    y = None
    for t in range(3):
        yt = jnp.tensordot(m[:, t, :], u[..., t * co:(t + 1) * co],
                           axes=[[1], [1]])
        y = yt if y is None else y + yt
    return jnp.moveaxis(y, 0, 1)  # (B, dst_d, H', W', CO)
