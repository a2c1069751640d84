"""Convolution building blocks, channels-last, TPU-first.

Layout: activations are channels-last (NHWC / NDHWC) and kernels are
spatial-first ``(*kernel, in, out)`` — XLA's preferred TPU layout, keeping
the channel dim on the 128-lane axis so convs tile directly onto the MXU.

Performance note: 3-D convolutions whose depth kernel is 1 with unit depth
stride (every inflated ResNet50 bottleneck conv, mmvit4.py:131-135 uses
``time_dim=1``) are algebraically 2-D convolutions applied per depth slice.
``Conv`` detects this and folds depth into batch, turning the whole encoder
into large batched 2-D convs — much better MXU utilization than genuine 3-D
convolution for depth-3 volumes.

Parity notes:
  * default kernel/bias init matches torch Conv defaults
    (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)));
  * ``pad_mode='replicate'`` matches torch ``padding_mode='replicate'``
    (decoder convs, mmvit4.py:225-236);
  * ``GeneralConv3d`` applies conv -> activation -> norm in that order
    (activation BEFORE norm, mmvit4.py:41-45).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as fnn

from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.nn.norm import BatchNorm, GroupNorm, InstanceNorm

__all__ = [
    "packed_kernel_init",
    "Conv",
    "ConvTranspose",
    "Dense",
    "PReLU",
    "GeneralConv3d",
    "FusionPrenorm",
    "EarlyFusionBlock",
]

Dtype = Any


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n, (v, n)
        return tuple(v)
    return (v,) * n


def packed_kernel_init(kernel_init, ks, ci, co, m):
    """Initializer for the packed modality-in-channels form: per-stream
    (M, *ks, ci, co) leaves drawn exactly as M separate convs would draw
    them (rng split M ways, same per-stream shapes). Shared by ``Conv``
    and the BN-folded path (nn/fusedbn.py) so the rng/init contract lives
    in one place."""

    def init(rng, _shape, dtype):
        keys = jax.random.split(rng, m)
        return jax.vmap(lambda k: kernel_init(k, (*ks, ci, co), dtype))(keys)

    return init


def _block_diag_kernel(k):
    """(M, *ks, ci, co) per-stream kernels -> (*ks, M*ci, M*co) dense
    block-diagonal kernel (stream i maps input block i to output block i;
    zeros elsewhere). Gradients flow back through the diagonal reads only.
    """
    m = k.shape[0]
    zero = jnp.zeros_like(k[0])
    cols = [
        jnp.concatenate([k[i] if j == i else zero for j in range(m)], axis=-2)
        for i in range(m)
    ]
    return jnp.concatenate(cols, axis=-1)


class Conv(fnn.Module):
    """N-D convolution (N inferred from input rank), channels-last.

    kernel_size/strides/padding/dilation: int or per-spatial-axis tuple.
    padding is symmetric ints per axis (torch-style).

    ``modalities=M`` (M>1) is the modality-in-channels packed form: the
    input carries M independent streams stacked modality-major on the
    channel axis ((..., M*ci)), the params stay per-stream with a leading
    M axis ((M, *ks, ci, co) — same shapes and init distribution as M
    separate convs), and the compute runs ONE dense conv with the
    per-stream kernels embedded block-diagonally ((*ks, M*ci, M*co),
    zeros off the diagonal). M x the MACs of M separate convs, but full
    128-lane channel utilization for the conv AND every surrounding
    elementwise/norm op — measured 26% faster fwd+bwd than per-modality
    ``nn.vmap`` at the MMVit4 stage-1 shapes (scripts/micro_stage1.py)
    where ci<=64 lane-pads half-empty. Cross-stream terms multiply
    exact zeros, so the math is identical to M separate convs.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"  # 'zeros' | 'replicate' | 'reflect'
    kernel_init: Callable = tinit.torch_default_kernel
    bias_init: Optional[Callable] = None  # default: torch U(+-1/sqrt(fan_in))
    modalities: int = 1  # M>1: packed block-diagonal form (see docstring)
    dtype: Dtype = None  # compute dtype; params stay float32

    @fnn.compact
    def __call__(self, x, depth_fuse=None):
        """``depth_fuse`` (full-depth decoder fast path, nn/depthfuse.py):
        ``("linear", dst_d)`` — x is the depth-COARSE volume and the conv
        computes conv3d(depth_linear_resize(x, dst_d)) without
        materializing it; ``("nearest", dst_d)`` — x is a (skip, run)
        tuple: conv3d(concat(nearest_depth_resize(skip, dst_d), run)).
        Params are IDENTICAL to the unfused conv (same shapes/init), so
        checkpoints are interchangeable across the two paths."""
        if depth_fuse is not None:
            parts = x if isinstance(x, tuple) else (x,)
            nsp = 3
        else:
            parts = (x,)
            nsp = x.ndim - 2
        ks = _tuple(self.kernel_size, nsp)
        st = _tuple(self.strides, nsp)
        pd = _tuple(self.padding, nsp)
        # Each padding entry may be an int (symmetric) or a (lo, hi) pair
        # (used by the depth-pruned decoder for top-edge-only padding).
        pd = tuple((p, p) if isinstance(p, int) else tuple(p) for p in pd)
        dl = _tuple(self.dilation, nsp)
        in_ch = sum(p.shape[-1] for p in parts)
        assert in_ch % self.groups == 0
        m = self.modalities
        if m > 1:
            # packed modality-in-channels form: per-stream params, dense
            # block-diagonal compute kernel
            assert self.groups == 1 and in_ch % m == 0 and self.features % m == 0
            ci, co = in_ch // m, self.features // m
            kshape = (*ks, in_ch, self.features)
            fan_in = ci * math.prod(ks)  # per-stream fan

            kernel = self.param(
                "kernel", packed_kernel_init(self.kernel_init, ks, ci, co, m),
                None, jnp.float32,
            )
            kernel = _block_diag_kernel(kernel)
            bias = None
            if self.use_bias:
                b_init = self.bias_init or tinit.torch_default_bias(fan_in)

                def m_bias_init(rng, _shape, dtype):
                    keys = jax.random.split(rng, m)
                    return jax.vmap(lambda k: b_init(k, (co,), dtype))(keys)

                bias = self.param("bias", m_bias_init, None, jnp.float32)
                bias = bias.reshape(self.features)
        else:
            kshape = (*ks, in_ch // self.groups, self.features)
            fan_in = (in_ch // self.groups) * math.prod(ks)

            kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
            bias = None
            if self.use_bias:
                b_init = self.bias_init or tinit.torch_default_bias(fan_in)
                bias = self.param("bias", b_init, (self.features,), jnp.float32)

        cdtype = self.dtype or parts[0].dtype
        kernel = kernel.astype(cdtype)
        if depth_fuse is not None:
            return self._depth_fused(
                tuple(p.astype(cdtype) for p in parts), kernel, bias, pd,
                cdtype, depth_fuse,
            )
        x = x.astype(cdtype)

        # Depth-1 reduction: a 3-D conv over a single depth slice with
        # same-size output is exactly a 2-D conv — replicate padding sees
        # the slice at every kernel depth (sum the kernel over depth), zero
        # padding sees it only at the centre tap. Collapses most of the
        # MMVit2/RFNet encoder convs to MXU-friendly 2-D convs.
        if (
            nsp == 3
            and ks[0] > 1
            and ks[0] % 2 == 1
            and x.shape[1] == 1
            and st[0] == 1
            and dl[0] == 1
            and pd[0] == ((ks[0] - 1) // 2,) * 2
            and self.pad_mode in ("replicate", "zeros")
        ):
            if self.pad_mode == "replicate":
                kernel = kernel.sum(axis=0, keepdims=True)
            else:
                kernel = kernel[ks[0] // 2 : ks[0] // 2 + 1]
            ks = (1, *ks[1:])
            pd = ((0, 0), *pd[1:])
        elif (
            # Depth-3 decomposition: a (3,kh,kw) conv is exactly ONE 2-D
            # conv over the three depth-tap slices folded into input
            # channels (kernel taps stacked along cin) — identical FLOPs,
            # but it runs through the far better-optimized 2-D conv path
            # with a 3x larger contraction dim and a single output write
            # (the encoder hot path for MMVit2/RFNet/mmformer and the
            # MMVit4 stem/decoder). Stride-2 gathers the strided tap
            # slices; grouped/large-depth cases fall back to per-tap convs
            # + shift-adds.
            nsp == 3
            and ks[0] == 3
            and dl[0] == 1
            and (
                (st[0] == 1 and pd[0] in ((1, 1), (1, 0)))
                or (st[0] == 2 and pd[0] == (1, 1))
            )
            and self.pad_mode in ("replicate", "zeros")
            and x.shape[1] >= 2
        ):
            if st[0] == 1:
                d_ = x.shape[1]
                # Depth-in-channels banded form for the lane-starved small-
                # cout case (pruned-decoder convs, cout 8-32 at <=6% output
                # lanes): ONE 2-D conv (B,H,W,D*cin)->(B,H,W,D*cout) with a
                # block-tridiagonal kernel. D/3 x the FLOPs, ~D x the
                # output lanes — measured 3.5x faster fwd+bwd at the d1
                # shape (scripts/micro_depthconv.py).
                if (
                    self.groups == 1
                    and self.features <= 48
                    and d_ * in_ch <= 256
                    and d_ * self.features <= 160
                ):
                    return self._depth3_banded(x, kernel, bias, st, pd, dl, cdtype)
                # NOTE a grouped-depth banded form for LARGE depth counts
                # (G output depths folded into channels, 128 output lanes at
                # (G+2)/3 x the MACs) was built and measured on hardware at
                # the d1_c2 shape (8,128,128,128,32->8): banded16 43.9 /
                # banded4 43.0 ms vs the shipping tapout shift-add 36.9 ms
                # (scripts/micro_fullconv.py, NOTES round-4) — the FLOP
                # duplication hits fwd, dgrad AND wgrad, eating the lane
                # win. Rejected; the full-depth decoder perf comes from the
                # exact depth-structure rewrites in nn/depthfuse.py instead.
                return self._depth3_decomposed(x, kernel, bias, st, pd, dl, cdtype)
            if self.groups == 1:
                return self._depth3_strided(x, kernel, bias, st, pd, dl, cdtype)
            # grouped stride-2 depth convs: fall through to the generic
            # 3-D conv path (correct for any feature_group_count)
        # Pointwise (all-ones kernel, unstrided, ungrouped) convs are plain
        # channel matmuls; bypassing lax.conv avoids XLA's conv layout
        # assignment, which was emitting standalone transpose copies around
        # every bottleneck conv1/conv3 (profiled at batch 16).
        if (
            all(k == 1 for k in ks)
            and all(s == 1 for s in st)
            and all(p == (0, 0) for p in pd)
            and self.groups == 1
        ):
            y = jnp.dot(x, kernel.reshape(in_ch, self.features))
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y.astype(cdtype)

        if self.pad_mode != "zeros" and any(lo or hi for lo, hi in pd):
            cfg = [(0, 0)] + list(pd) + [(0, 0)]
            mode = {"replicate": "edge", "reflect": "reflect"}[self.pad_mode]
            x = jnp.pad(x, cfg, mode=mode)
            pad_cfg = [(0, 0)] * nsp
        else:
            pad_cfg = list(pd)

        # Fold trivial leading spatial dims (kernel 1, stride 1, no pad, no
        # dilation) into batch: turns depth-1-kernel 3-D convs into 2-D convs.
        fold = 0
        while (
            fold < nsp - 2
            and ks[fold] == 1
            and st[fold] == 1
            and pad_cfg[fold] == (0, 0)
            and dl[fold] == 1
        ):
            fold += 1
        orig_shape = x.shape
        if fold:
            lead = 1
            for s in orig_shape[: 1 + fold]:
                lead *= s
            x = x.reshape(lead, *orig_shape[1 + fold :])
            kernel = kernel.reshape(*kshape[fold:-2], *kshape[-2:]).astype(cdtype)
            st_, pad_, dl_ = st[fold:], pad_cfg[fold:], dl[fold:]
        else:
            st_, pad_, dl_ = st, pad_cfg, dl

        if x.ndim == 4:
            # XLA accumulates low-precision convs in f32 on the MXU
            y = _conv2d(x, kernel, st_, pad_, dl_, self.groups, cdtype)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=st_,
                padding=pad_,
                rhs_dilation=dl_,
                dimension_numbers=_dim_numbers(x.ndim),
                feature_group_count=self.groups,
            )
        if fold:
            y = y.reshape(*orig_shape[: 1 + fold], *y.shape[1:])
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(cdtype)

    def _depth_fused(self, parts, kernel, bias, pd, cdtype, depth_fuse):
        """Full-depth decoder fast path (see ``__call__`` docstring and
        nn/depthfuse.py). Exact: same math as depth-resize + conv."""
        from corrifnet_tpu.nn.depthfuse import fused_resize_conv

        kind, dst_d = depth_fuse
        assert (
            kernel.shape[0] == 3
            and pd[0] == (1, 1)
            and self.groups == 1
            and self.modalities == 1
        ), (kernel.shape, pd, self.groups)
        if kind == "linear":
            (z,) = parts
            y = fused_resize_conv(
                z, kernel, dst_d, "linear", self.pad_mode, pd, cdtype
            )
        else:
            skip, run = parts
            cs = skip.shape[-1]
            y = fused_resize_conv(
                skip, kernel[..., :cs, :], dst_d, "nearest", self.pad_mode,
                pd, cdtype,
            )
            y = y + self._depth3_shift_add(
                run, kernel[..., cs:, :], None, (1, 1, 1), pd, (1, 1, 1),
                cdtype,
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(cdtype)

    def _depth3_decomposed(self, x, kernel, bias, st, pd, dl, cdtype):
        """y[:, d] = sum_t conv2d(x[:, d+t-1], W[t]) with boundary handling
        from the depth padding mode. Exact (torch-parity tested).

        Realized by folding the 3 depth taps into input channels: one 2-D
        conv over concat([x_{d-1}, x_d, x_{d+1}], channel) with the kernel
        taps stacked along the input-channel axis. Identical math to three
        per-tap convs + shift-adds, but 3x fewer output writes and a 3x
        larger MXU contraction dim — decisive for the cin=1 encoder stem.
        Falls back to the per-tap shift-add form when the concat buffer
        would be large (full-depth decoder volumes, depth up to 128)."""
        b, d_, h_, w_, cin = x.shape
        out_d = d_ if pd[0] == (1, 1) else d_ - 1
        # channel folding interleaves tap blocks across the input-channel
        # axis, which is incompatible with grouped convs; large depth counts
        # (full-depth decoder) would triple a multi-GB concat buffer.
        if out_d > 16 or self.groups != 1:
            return self._depth3_shift_add(x, kernel, bias, st, pd, dl, cdtype)

        # depth-pad so tap t of output j reads padded index j + t
        if self.pad_mode == "replicate":
            top, bottom = x[:, :1], x[:, -1:]
        else:
            top = jnp.zeros_like(x[:, :1])
            bottom = None if pd[0] == (1, 0) else jnp.zeros_like(x[:, :1])
        parts = [top, x] + ([bottom] if pd[0] == (1, 1) else [])
        xp = jnp.concatenate(parts, axis=1)  # (b, out_d + 2, H, W, cin)

        if self.pad_mode == "replicate" and (pd[1] != (0, 0) or pd[2] != (0, 0)):
            xp = jnp.pad(xp, [(0, 0), (0, 0), pd[1], pd[2], (0, 0)], mode="edge")
            pad2d = [(0, 0), (0, 0)]
        else:
            pad2d = [pd[1], pd[2]]

        xcat = jnp.concatenate(
            [xp[:, t : t + out_d] for t in range(3)], axis=-1
        )  # (b, out_d, H', W', 3*cin)
        # kernel (3, kh, kw, cin, O) -> (kh, kw, 3*cin, O), tap-major blocks
        kcat = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
            kernel.shape[1], kernel.shape[2], 3 * cin, kernel.shape[4]
        )
        y = _conv2d(
            xcat.reshape(b * out_d, *xcat.shape[2:]),
            kcat, st[1:], pad2d, dl[1:], self.groups, cdtype,
        )
        y = y.reshape(b, out_d, *y.shape[1:])
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(cdtype)

    def _depth3_banded(self, x, kernel, bias, st, pd, dl, cdtype):
        """Depth folded INTO channels: y[:, do] = sum_t conv2d(x[:, do+t-1],
        W[t]) realized as ONE 2-D conv (B, H, W, D*cin) -> (B, H, W,
        out_d*cout) whose kernel is block-tridiagonal over the depth
        blocks — block (di, do) holds W[di-do+1] (zero off the band).
        Depth boundary handling is baked into the edge blocks: replicate
        folds W[0] (top) / W[2] (bottom) into the centre tap; zeros drops
        them. Exact (torch-parity tested via the shared Conv tests)."""
        b, d_, h_, w_, cin = x.shape
        cout = kernel.shape[-1]
        out_d = d_ if pd[0] == (1, 1) else d_ - 1

        if self.pad_mode == "replicate" and (pd[1] != (0, 0) or pd[2] != (0, 0)):
            x = jnp.pad(x, [(0, 0), (0, 0), pd[1], pd[2], (0, 0)], mode="edge")
            h_, w_ = x.shape[2], x.shape[3]
            pad2d = [(0, 0), (0, 0)]
        else:
            pad2d = [pd[1], pd[2]]

        xf = x.transpose(0, 2, 3, 1, 4).reshape(b, h_, w_, d_ * cin)

        rep = self.pad_mode == "replicate"
        zero_blk = jnp.zeros_like(kernel[0])
        cols = []
        for do in range(out_d):
            blocks = []
            for di in range(d_):
                t = di - do + 1
                blk = kernel[t] if 0 <= t <= 2 else zero_blk
                if rep and di == 0 and do == 0:
                    blk = kernel[0] + kernel[1]  # x[-1] clamps to x[0]
                if rep and pd[0] == (1, 1) and di == d_ - 1 and do == d_ - 1:
                    blk = kernel[1] + kernel[2]  # x[D] clamps to x[D-1]
                blocks.append(blk)
            cols.append(jnp.concatenate(blocks, axis=2))
        w2 = jnp.concatenate(cols, axis=3)  # (kh, kw, d_*cin, out_d*cout)

        yf = _conv2d(xf, w2, st[1:], pad2d, dl[1:], 1, cdtype)
        y = yf.reshape(b, yf.shape[1], yf.shape[2], out_d, cout)
        y = y.transpose(0, 3, 1, 2, 4)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(cdtype)

    def _depth3_shift_add(self, x, kernel, bias, st, pd, dl, cdtype):
        """Per-tap conv + shift-add fallback for large depth counts (the
        channel-folded form would triple a multi-GB concat buffer).

        The three depth-tap convs run as ONE 2-D conv with the tap kernels
        concatenated along OUTPUT channels ((kh,kw,cin,3*cout)) — the
        full-depth decoder's convs have cout 8-32, i.e. 6-25% of the
        MXU's 128 output lanes per tap; tap-major output folding triples
        the occupied lanes at identical FLOPs (the shift-add below reads
        per-tap channel blocks instead of separate arrays). Grouped convs
        keep per-tap kernels (output folding would interleave groups)."""
        b, d_, h_, w_, cin = x.shape
        xf = x.reshape(b * d_, h_, w_, cin)
        if self.pad_mode == "replicate" and (pd[1] != (0, 0) or pd[2] != (0, 0)):
            xf = jnp.pad(xf, [(0, 0), pd[1], pd[2], (0, 0)], mode="edge")
            pad2d = [(0, 0), (0, 0)]
        else:
            pad2d = [pd[1], pd[2]]
        dn2 = _dim_numbers(4)
        if self.groups == 1:
            cout = kernel.shape[-1]
            kcat = jnp.concatenate([kernel[t] for t in range(3)], axis=-1)
            zcat = jax.lax.conv_general_dilated(
                xf,
                kcat,
                window_strides=st[1:],
                padding=pad2d,
                rhs_dilation=dl[1:],
                dimension_numbers=dn2,
            )
            zcat = zcat.reshape(b, d_, *zcat.shape[1:])
            zs = [zcat[..., t * cout : (t + 1) * cout] for t in range(3)]
        else:
            zs = []
            for t in range(3):
                zt = jax.lax.conv_general_dilated(
                    xf,
                    kernel[t],
                    window_strides=st[1:],
                    padding=pad2d,
                    rhs_dilation=dl[1:],
                    dimension_numbers=dn2,
                    feature_group_count=self.groups,
                )
                zs.append(zt.reshape(b, d_, *zt.shape[1:]))
        z0, z1, z2 = zs
        out_d = d_ if pd[0] == (1, 1) else d_ - 1
        if self.pad_mode == "replicate":
            top = z0[:, :1]
        else:
            top = jnp.zeros_like(z0[:, :1])
        z0_shift = jnp.concatenate([top, z0[:, : out_d - 1]], axis=1)
        if pd[0] == (1, 1):
            if self.pad_mode == "replicate":
                bottom = z2[:, -1:]
            else:
                bottom = jnp.zeros_like(z2[:, :1])
            z2_shift = jnp.concatenate([z2[:, 1:], bottom], axis=1)
        else:  # (1, 0): every d+1 index exists, no bottom boundary
            z2_shift = z2[:, 1:out_d + 1]
        y = z0_shift + z1[:, :out_d] + z2_shift
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(cdtype)

    def _depth3_strided(self, x, kernel, bias, st, pd, dl, cdtype):
        """Depth-stride-2 variant: y[:, j] = sum_t conv2d(x[:, 2j + t - 1])
        with boundary clamping (replicate) / zeroing (zeros), realized by
        gathering the three tap slices per output depth into input channels
        and running ONE 2-D conv (same folding as _depth3_decomposed)."""
        import numpy as np

        b, d_, h_, w_, cin = x.shape
        out_d = (d_ - 1) // 2 + 1
        if self.pad_mode == "replicate" and (pd[1] != (0, 0) or pd[2] != (0, 0)):
            x = jnp.pad(x, [(0, 0), (0, 0), pd[1], pd[2], (0, 0)], mode="edge")
            pad2d = [(0, 0), (0, 0)]
        else:
            pad2d = [pd[1], pd[2]]

        taps = []
        for t in range(3):
            src = 2 * np.arange(out_d) + t - 1
            xt = x[:, np.clip(src, 0, d_ - 1)]
            if self.pad_mode != "replicate":
                valid = (src >= 0) & (src < d_)
                if not valid.all():
                    xt = xt * jnp.asarray(
                        valid, dtype=xt.dtype
                    ).reshape(1, out_d, 1, 1, 1)
            taps.append(xt)
        xcat = jnp.concatenate(taps, axis=-1)  # (b, out_d, H', W', 3*cin)
        kcat = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
            kernel.shape[1], kernel.shape[2], 3 * cin, kernel.shape[4]
        )
        y = _conv2d(
            xcat.reshape(b * out_d, *xcat.shape[2:]),
            kcat, st[1:], pad2d, dl[1:], self.groups, cdtype,
        )
        y = y.reshape(b, out_d, *y.shape[1:]).astype(cdtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def _s2d_eligible(x, kernel, strides, padding, dilation, groups):
    """Space-to-depth profitability test for a channels-last 2-D conv.

    A stride-(2,2) conv with few input channels wastes the MXU's 128-wide
    lane dim (the stem's tap-folded cin=9 conv measured ~5% MFU). Blocking
    2x2 input pixels into channels turns it into a stride-1 conv with 4x
    the contraction depth — identical math, ~4x lane utilization."""
    if strides != (2, 2) or dilation != (1, 1) or groups != 1:
        return False
    kh, kw, cin, _ = kernel.shape
    if cin > 32 or max(kh, kw) < 2:
        return False
    (pl_h, pr_h), (pl_w, pr_w) = padding
    h, w = x.shape[1], x.shape[2]
    return h + pl_h + pr_h >= kh and w + pl_w + pr_w >= kw


def _s2d_conv2d(x, kernel, padding, cdtype):
    """Stride-2 conv as a VALID stride-1 conv over 2x2-blocked channels.

    y[i,j,o] = sum_{u,v,c} xpad[2i+u, 2j+v, c] W[u,v,c,o]. Writing
    u = 2U + a (a in {0,1}): xpad blocks to X[P,Q,(a,b,c)] = xpad[2P+a,
    2Q+b, c] and W pads (zeros on the phantom taps) to W'[U,V,(a,b,c),o] =
    W[2U+a, 2V+b, c, o], giving y = conv_valid_s1(X, W'). Exact — the
    zero kernel taps annihilate any even-padding rows added to xpad."""
    kh, kw, cin, cout = kernel.shape
    (pl_h, pr_h), (pl_w, pr_w) = padding
    n, h, w, _ = x.shape
    hp, wp = h + pl_h + pr_h, w + pl_w + pr_w
    xpad = jnp.pad(
        x, [(0, 0), (pl_h, pr_h + hp % 2), (pl_w, pr_w + wp % 2), (0, 0)]
    )
    hp2, wp2 = (hp + 1) // 2, (wp + 1) // 2
    xb = xpad.reshape(n, hp2, 2, wp2, 2, cin)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp2, wp2, 4 * cin)

    k2h, k2w = (kh + 1) // 2, (kw + 1) // 2
    kpad = jnp.pad(
        kernel, [(0, 2 * k2h - kh), (0, 2 * k2w - kw), (0, 0), (0, 0)]
    )
    kb = kpad.reshape(k2h, 2, k2w, 2, cin, cout)
    kb = kb.transpose(0, 2, 1, 3, 4, 5).reshape(k2h, k2w, 4 * cin, cout)

    return jax.lax.conv_general_dilated(
        xb,
        kb.astype(cdtype),
        window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=_dim_numbers(4),
    )


def _conv2d(x, kernel, strides, padding, dilation, groups, cdtype):
    """Channels-last 2-D conv with the space-to-depth rewrites when they win.

    ``padding`` must already be numeric (lo, hi) pairs (replicate/reflect
    modes are materialized by the callers before reaching here)."""
    strides, dilation = tuple(strides), tuple(dilation)
    padding = tuple((lo, hi) for lo, hi in padding)
    if _s2d_eligible(x, kernel, strides, padding, dilation, groups):
        return _s2d_conv2d(x, kernel, padding, cdtype)
    # NOTE: an output-side 2x2 blocking for stride-1 small-cout convs (the
    # decoder's cout=8-32 heads, ~1% MFU) was built and measured: the
    # transformed conv itself got >4x faster, but the block/unblock
    # transposes and their backward pad/adds on the lane-starved (C<=48)
    # activations cost ~2x what the conv saved (decoder region 13.1 ->
    # 22.2 ms/step at B=8). Reverted; see NOTES.md round-2 ladder.
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=list(padding),
        rhs_dilation=dilation,
        dimension_numbers=_dim_numbers(4),
        feature_group_count=groups,
    )


def _dim_numbers(rank):
    spatial = "DHW"[-(rank - 2):] if rank <= 5 else None
    assert spatial is not None, f"unsupported conv rank {rank}"
    lhs = "N" + spatial + "C"
    rhs = spatial + "IO"
    return jax.lax.conv_dimension_numbers((1,) * rank, (1,) * rank, (lhs, rhs, lhs))


class ConvTranspose(fnn.Module):
    """2-D transposed convolution with torch ConvTranspose2d semantics
    (kernel/stride/padding/output_padding), channels-last.

    torch's op is the gradient of a stride-``s`` conv; expressed via
    ``lax.conv_general_dilated`` with lhs_dilation=s and padding
    ``(k-1-p, k-1-p+output_padding)`` per spatial axis, with the kernel
    spatially flipped and in/out transposed.
    """

    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = tinit.torch_default_kernel
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, s, p, op = (
            self.kernel_size, self.strides, self.padding, self.output_padding
        )
        # torch weight layout (in, out, kh, kw); fan_in for default init is
        # out_ch * k * k (torch uses weight.size(1)*k*k for ConvTranspose)
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, self.features, in_ch), jnp.float32
        )
        cdtype = self.dtype or x.dtype
        kern = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # HWIO
        pad = (k - 1 - p, k - 1 - p + op)
        dn = _dim_numbers(4)
        y = jax.lax.conv_general_dilated(
            x.astype(cdtype),
            kern.astype(cdtype),
            window_strides=(1, 1),
            padding=[pad, pad],
            lhs_dilation=(s, s),
            dimension_numbers=dn,
        )
        if self.use_bias:
            fan_in = self.features * k * k
            bias = self.param(
                "bias", tinit.torch_default_bias(fan_in), (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        return y.astype(cdtype)


class PReLU(fnn.Module):
    """torch nn.PReLU: learnable slope(s), init 0.25. ``channels=None``
    gives the single shared parameter of ``nn.PReLU()``; an int matches
    ``nn.PReLU(nOut)`` (per-channel, channels-last)."""

    channels: Optional[int] = None
    init_value: float = 0.25

    @fnn.compact
    def __call__(self, x):
        n = self.channels or 1
        alpha = self.param(
            "alpha",
            lambda key, shape, dtype=jnp.float32: jnp.full(shape, self.init_value, dtype),
            (n,),
        )
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class Dense(fnn.Module):
    """Linear layer with torch default init."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = tinit.torch_default_kernel
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_ch, self.features), jnp.float32
        )
        cdtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(cdtype), kernel.astype(cdtype))
        if self.use_bias:
            bias = self.param(
                "bias", tinit.torch_default_bias(in_ch), (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


class GeneralConv3d(fnn.Module):
    """conv3d + activation + norm.

    Default order 'act_norm' = the reference general_conv3d_prenorm
    (mmvit4.py:29-45, activation BEFORE norm); 'norm_act' = RFNet's
    general_conv3d (RFNet.py:18-33, norm before lrelu)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    pad_mode: str = "zeros"
    norm: str = "in"  # 'bn' | 'gn' | 'in'
    act: str = "relu"  # 'relu' | 'lrelu'
    relufactor: float = 0.2
    order: str = "act_norm"  # 'act_norm' | 'norm_act'
    use_pallas_epilogue: bool = False  # fused ReLU+IN kernel (ops.instancenorm)
    kernel_init: Callable = tinit.kaiming_normal  # MMVit4 re-init, mmvit4.py:437-439
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True, depth_fuse=None):
        x = Conv(
            self.features,
            self.kernel_size,
            self.strides,
            self.padding,
            pad_mode=self.pad_mode,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x, depth_fuse=depth_fuse)
        if (
            self.use_pallas_epilogue
            and self.order == "act_norm"
            and self.act == "relu"
            and self.norm == "in"
        ):
            from corrifnet_tpu.ops import relu_instancenorm

            return relu_instancenorm(x)

        def apply_act(x):
            if self.act == "relu":
                return jax.nn.relu(x)
            if self.act == "lrelu":
                return jax.nn.leaky_relu(x, self.relufactor)
            raise ValueError(self.act)

        def apply_norm(x):
            if self.norm == "bn":
                return BatchNorm(dtype=self.dtype, name="norm")(
                    x, use_running_average=not train
                )
            if self.norm == "gn":
                return GroupNorm(num_groups=4, dtype=self.dtype, name="norm")(x)
            if self.norm == "in":
                return InstanceNorm(dtype=self.dtype, name="norm")(x)
            raise ValueError(f"normalization type {self.norm} is not supported")

        if self.order == "act_norm":
            return apply_norm(apply_act(x))
        return apply_act(apply_norm(x))


class FusionPrenorm(fnn.Module):
    """RFM block: 1x1 -> 3x3 -> 1x1 GeneralConv3d stack (mmvit4.py:47-56)."""

    in_channel: int = 64
    num_cls: int = 1
    use_pallas_epilogue: bool = False
    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        c = self.in_channel
        pe = self.use_pallas_epilogue
        x = GeneralConv3d(c, 1, 1, 0, use_pallas_epilogue=pe,
                          dtype=self.dtype, name="l0")(x, train)
        x = GeneralConv3d(c, 3, 1, 1, use_pallas_epilogue=pe,
                          dtype=self.dtype, name="l1")(x, train)
        x = GeneralConv3d(c, 1, 1, 0, use_pallas_epilogue=pe,
                          dtype=self.dtype, name="l2")(x, train)
        return x


class EarlyFusionBlock(fnn.Module):
    """concat(modalities) -> 1x1 conv -> ReLU -> InstanceNorm
    (mmvit4.py:64-81). Channel count is preserved (3*in_channels)."""

    dtype: Dtype = None

    @fnn.compact
    def __call__(self, x_rgb, x_nir, x_swir):
        x = jnp.concatenate([x_rgb, x_nir, x_swir], axis=-1)
        x = Conv(
            x.shape[-1],
            1,
            kernel_init=tinit.kaiming_normal,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = jax.nn.relu(x)
        return InstanceNorm(dtype=self.dtype, name="norm")(x)
