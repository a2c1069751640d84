"""Lean-residual decoder stages: one stored volume per conv/ReLU/IN stage.

The full-depth MMVit4 decoder (reference mmvit4.py:266-292) is the step's
memory hot spot: at B=16 the train step peaks at 16.6 GB (> the chip), and
the round-4 ladder proved the excess is per-stage STORED RESIDUALS — the
standard autodiff composition keeps both the conv pre-activation (for the
relu/IN backward) and the normalized output (for the next conv's wgrad)
live from forward to backward, and per-conv remat cannot reduce it
(NOTES round-4: decoder_remat moved 0.24-0.87 GB of a ~3.5 GB excess).

Structure here (VERDICT r4 #2 — "restructure the decoder backward"):

  * ``ops.instancenorm.relu_in_stats`` ends each stage: returns the relu
    output ``y`` plus the f32 IN scalars ``(a, b)`` with a custom VJP whose
    residual is just ``y`` (+ scalars) — the relu mask is recovered from
    ``y`` (exact: bf16 relu preserves positive values bit-for-bit) and the
    statistics backward is hand-derived;
  * ``LeanGeneralConv3d`` consumes the previous stage's ``(y, a, b)``
    handoff and computes ``conv(resize?(y*a+b))`` inside ``fnn.remat`` —
    the normalized volume is REBUILT from ``y`` during the backward (one
    fused fma pass; the conv forward itself is dead code in the backward
    and DCE'd by remat's partial-eval), never stored;
  * ``lean_head`` closes the chain: the reference head keeps only depth
    slice 0 (mmvit4.py:263), so the final fma+slice is checkpointed and the
    full normalized volume never materializes outside the stage.

Net stored fine-depth residuals per stage: exactly one ``y`` volume.

Exactness: the forward is operation-identical to the standard
``GeneralConv3d`` XLA epilogue path (same fma expression, same cast
placement, same conv); gradients match autodiff to f32 reassociation
(tests/test_lean_decoder.py, including at full cascade scale). Parameter
names/shapes are IDENTICAL to ``GeneralConv3d`` (the conv lives under
``conv/``; InstanceNorm has no params), so checkpoints are interchangeable.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
from flax import linen as fnn

from corrifnet_tpu.nn import init as tinit
from corrifnet_tpu.nn.conv import Conv
from corrifnet_tpu.nn.resize import resize_linear

__all__ = ["LeanHandoff", "LeanGeneralConv3d", "lean_head"]

Dtype = Any


class LeanHandoff(NamedTuple):
    """A decoder stage's lean epilogue output: relu volume + IN scalars.
    The consumer applies ``y * a + b`` (the InstanceNorm fma) itself,
    inside its rematted region."""

    y: Any
    a: Any
    b: Any


def _expand(h: LeanHandoff, pre_resize):
    t = h.y * h.a + h.b
    if pre_resize:
        # the fused up2 path's H/W-only resize at coarse depth, in the
        # compute dtype (decoder.py up2_conv — bit-identical placement)
        t = resize_linear(t, pre_resize, align_corners=True,
                          compute_dtype=t.dtype)
    return t


class _LeanConv(Conv):
    """``Conv`` that reconstructs its input from a ``LeanHandoff`` (and
    optionally H/W-resizes it) before convolving. Runs under ``fnn.remat``
    so the reconstructed volume is a backward-time recompute, not a stored
    residual. Accepts the decoder's three input forms: a plain array, a
    handoff, or ``(skip_array, handoff)`` for the fused skip-concat convs.
    """

    pre_resize: tuple = ()

    def __call__(self, x, depth_fuse=None):
        if isinstance(x, LeanHandoff):
            x = _expand(x, self.pre_resize)
        elif (isinstance(x, tuple) and len(x) == 2
              and isinstance(x[1], LeanHandoff)):
            x = (x[0], _expand(x[1], self.pre_resize))
        elif self.pre_resize:
            x = resize_linear(x, self.pre_resize, align_corners=True,
                              compute_dtype=x.dtype)
        return super().__call__(x, depth_fuse=depth_fuse)


def _in_stats_of_act(y, eps=1e-5):
    """InstanceNorm scalars of an already-activated volume — the stats
    half of ``relu_in_stats`` (same ops: single-pass E[x^2], f32, same
    cast placement). Plain autodiff: the only large residual is y, which
    the caller stores anyway."""
    import jax.numpy as jnp

    axes = tuple(range(1, y.ndim - 1))
    yf = y.astype(jnp.float32)
    mean = yf.mean(axis=axes, keepdims=True)
    sq = (yf * yf).mean(axis=axes, keepdims=True)
    var = jnp.maximum(sq - mean * mean, 0.0)
    a = jax.lax.rsqrt(var + eps)
    b = -mean * a
    dt = y.dtype
    return a.astype(dt), b.astype(dt)


def _chunked_nearest_conv(skip, h, kernel, bias, dst_d, chunks, cdtype):
    """The fused skip-concat conv + ReLU, depth-chunk-scanned.

    Row-for-row the SAME operations as ``Conv._depth_fused`` (skip block:
    tap-major coarse conv + one-hot nearest expansion; run block: tap-cat
    2-D conv + shift-add) followed by the epilogue relu — output equal to
    f32 conv-blocking reassociation (<1e-6 rel: the run conv executes on
    chunk-sized batches, whose internal accumulation blocking may differ
    from the one full-volume conv) — computed one depth chunk at a time
    inside a ``lax.scan`` whose body is checkpointed. The decoder-only memory
    isolation (NOTES round 5) showed the full-depth backward peak is this
    conv's TRANSPOSE cluster (shifted dz copies + concat + conv-transpose
    over the whole 128-deep volume, all live at once); the scan bounds
    those transients to one chunk, and the run volume is reconstructed
    from the lean handoff per chunk.
    """
    import jax.numpy as jnp

    from corrifnet_tpu.nn.conv import _conv2d
    from corrifnet_tpu.nn.depthfuse import tap_expand_table

    cs = skip.shape[-1]
    co = kernel.shape[-1]
    b_, s3, hh, ww, _ = skip.shape
    assert dst_d % chunks == 0, (dst_d, chunks)
    rows = dst_d // chunks

    # ---- skip block at its 3 coarse rows (mirrors fused_resize_conv) ----
    ksk = kernel[..., :cs, :]
    xsk = jnp.pad(skip, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)],
                  mode="edge")
    kcat_sk = jnp.concatenate([ksk[t] for t in range(3)], axis=-1)
    us = _conv2d(
        xsk.reshape(b_ * s3, *xsk.shape[2:]), kcat_sk, (1, 1),
        [(0, 0), (0, 0)], (1, 1), 1, cdtype,
    )
    us = us.reshape(b_, s3, us.shape[1], us.shape[2], 3 * co)
    m = jnp.asarray(
        tap_expand_table("nearest", s3, dst_d, "replicate")
    ).astype(cdtype)

    # ---- run block: replicate depth pad of the RELU volume (the fma's
    # scalars are per-(sample, channel), so fma commutes with row
    # duplication — exact) ----
    y1 = h.y
    y1p = jnp.concatenate([y1[:, :1], y1, y1[:, -1:]], axis=1)
    krun = kernel[..., cs:, :]
    kcat_run = jnp.concatenate([krun[t] for t in range(3)], axis=-1)

    def compute(start, y1p_, a_, bf_, us_, m_, kc_, bias_):
        sl = jax.lax.dynamic_slice_in_dim(y1p_, start, rows + 2, axis=1)
        x = sl * a_ + bf_
        xf = jnp.pad(
            x.reshape(b_ * (rows + 2), x.shape[2], x.shape[3], x.shape[4]),
            [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge",
        )
        z = _conv2d(xf, kc_, (1, 1), [(0, 0), (0, 0)], (1, 1), 1, cdtype)
        z = z.reshape(b_, rows + 2, z.shape[1], z.shape[2], 3 * co)
        # shift-add within the padded chunk: out[j] = sum_t z_t[j + t]
        run = (z[:, 0:rows, :, :, 0:co]
               + z[:, 1:rows + 1, :, :, co:2 * co]) \
            + z[:, 2:rows + 2, :, :, 2 * co:3 * co]
        mc = jax.lax.dynamic_slice_in_dim(m_, start, rows, axis=0)
        yk = None
        for t in range(3):
            yt = jnp.tensordot(mc[:, t, :], us_[..., t * co:(t + 1) * co],
                               axes=[[1], [1]])
            yk = yt if yk is None else yk + yt
        yk = jnp.moveaxis(yk, 0, 1)
        p = yk + run + bias_.astype(cdtype)
        return jax.nn.relu(p).astype(cdtype)

    def body(carry, start):
        yc = jax.checkpoint(compute)(start, *carry)
        return carry, yc

    carry = (y1p, h.a, h.b, us, m, kcat_run, bias)
    _, ys = jax.lax.scan(body, carry, jnp.arange(chunks) * rows)
    # (chunks, B, rows, H, W, co) -> (B, dst_d, H, W, co)
    y = jnp.moveaxis(ys, 0, 1).reshape(b_, dst_d, ys.shape[3], ys.shape[4],
                                       co)
    return y


def _chunked_pointwise_conv(h, kernel, bias, chunks, cdtype):
    """fma + 1x1 conv (channel matmul) + relu, depth-chunk-scanned — same
    per-row ops as the standard path (``jnp.dot`` + bias), bounding the
    backward's dgrad/wgrad transients (full-volume dp and recomputed fma)
    to one chunk. No halo (pointwise)."""
    import jax.numpy as jnp

    y = h.y
    b_, d, hh, ww, ci = y.shape
    co = kernel.shape[-1]
    assert d % chunks == 0, (d, chunks)
    rows = d // chunks
    k2 = kernel.reshape(ci, co)

    def compute(start, y_, a_, bf_, k_, bias_):
        sl = jax.lax.dynamic_slice_in_dim(y_, start, rows, axis=1)
        x = sl * a_ + bf_
        p = jnp.dot(x, k_) + bias_.astype(cdtype)
        return jax.nn.relu(p).astype(cdtype)

    def body(carry, start):
        yc = jax.checkpoint(compute)(start, *carry)
        return carry, yc

    carry = (y, h.a, h.b, k2, bias)
    _, ys = jax.lax.scan(body, carry, jnp.arange(chunks) * rows)
    return jnp.moveaxis(ys, 0, 1).reshape(b_, d, hh, ww, co)


class _ChunkedNearestConv(fnn.Module):
    """Parameter-compatible stand-in for the ``conv`` child on the
    chunked path: creates kernel/bias exactly as ``Conv`` would (same
    names, shapes, inits) and runs ``_chunked_nearest_conv``."""

    features: int
    kernel_init: Any = tinit.kaiming_normal
    dtype: Dtype = None
    depth_chunks: int = 8

    @fnn.compact
    def __call__(self, skip, h, dst_d):
        import jax.numpy as jnp

        ci = skip.shape[-1] + h.y.shape[-1]
        kshape = (3, 3, 3, ci, self.features)
        fan_in = ci * 27
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = self.param(
            "bias", tinit.torch_default_bias(fan_in), (self.features,),
            jnp.float32,
        )
        cdtype = self.dtype or h.y.dtype
        return _chunked_nearest_conv(
            skip.astype(cdtype), h, kernel.astype(cdtype), bias, dst_d,
            self.depth_chunks, cdtype,
        )


class _ChunkedPointwiseConv(fnn.Module):
    """Parameter-compatible ``conv`` child for the chunked 1x1 stages."""

    features: int
    kernel_init: Any = tinit.kaiming_normal
    dtype: Dtype = None
    depth_chunks: int = 8

    @fnn.compact
    def __call__(self, h):
        import jax.numpy as jnp

        ci = h.y.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (1, 1, 1, ci, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", tinit.torch_default_bias(ci), (self.features,),
            jnp.float32,
        )
        cdtype = self.dtype or h.y.dtype
        return _chunked_pointwise_conv(
            h, kernel.astype(cdtype), bias, self.depth_chunks, cdtype)


class LeanGeneralConv3d(fnn.Module):
    """conv + relu + InstanceNorm with the lean handoff calling convention
    (see module docstring). Mirrors ``GeneralConv3d`` with
    ``order='act_norm', act='relu', norm='in'`` — the decoder epilogue —
    and identical parameter layout (``conv/kernel``, ``conv/bias``).

    ``depth_chunks > 0`` (skip-concat stages only): run the conv+relu as a
    depth-chunked scan (``_chunked_nearest_conv``) bounding the backward's
    tap-transpose transients to one chunk — forward equal to f32
    conv-blocking reassociation (<1e-6 rel)."""

    features: int
    kernel_size: Any = 3
    strides: Any = 1
    padding: Any = 1
    pad_mode: str = "replicate"
    kernel_init: Any = tinit.kaiming_normal
    dtype: Dtype = None
    pre_resize: tuple = ()
    depth_chunks: int = 0

    @fnn.compact
    def __call__(self, x, train: bool = True, depth_fuse=None) -> LeanHandoff:
        from corrifnet_tpu.ops.instancenorm import relu_in_stats

        if (self.depth_chunks and depth_fuse is not None
                and depth_fuse[0] == "nearest" and isinstance(x, tuple)
                and isinstance(x[1], LeanHandoff)):
            skip, h = x
            y = _ChunkedNearestConv(
                self.features, kernel_init=self.kernel_init,
                dtype=self.dtype, depth_chunks=self.depth_chunks,
                name="conv",
            )(skip, h, depth_fuse[1])
            a, b = _in_stats_of_act(y)
            return LeanHandoff(y, a, b)
        if (self.depth_chunks and depth_fuse is None
                and self.kernel_size == 1 and isinstance(x, LeanHandoff)):
            y = _ChunkedPointwiseConv(
                self.features, kernel_init=self.kernel_init,
                dtype=self.dtype, depth_chunks=self.depth_chunks,
                name="conv",
            )(x)
            a, b = _in_stats_of_act(y)
            return LeanHandoff(y, a, b)

        conv_cls = fnn.remat(_LeanConv, static_argnums=(2,))
        xc = conv_cls(
            self.features, self.kernel_size, self.strides, self.padding,
            pad_mode=self.pad_mode, kernel_init=self.kernel_init,
            dtype=self.dtype, pre_resize=self.pre_resize, name="conv",
        )(x, depth_fuse)
        y, a, b = relu_in_stats(xc)
        return LeanHandoff(y, a, b)


def lean_head(h: LeanHandoff):
    """Close the lean chain at the reference head: only depth slice 0
    survives ``up_to_224`` (align_corners=True with output depth 1 samples
    source coordinate 0, mmvit4.py:263) — checkpoint the fma+slice so the
    full-depth normalized volume is never stored for the backward."""
    return jax.checkpoint(lambda y, a, b: (y * a + b)[:, :1])(h.y, h.a, h.b)
