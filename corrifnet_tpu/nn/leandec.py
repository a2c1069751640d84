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


class LeanGeneralConv3d(fnn.Module):
    """conv + relu + InstanceNorm with the lean handoff calling convention
    (see module docstring). Mirrors ``GeneralConv3d`` with
    ``order='act_norm', act='relu', norm='in'`` — the decoder epilogue —
    and identical parameter layout (``conv/kernel``, ``conv/bias``)."""

    features: int
    kernel_size: Any = 3
    strides: Any = 1
    padding: Any = 1
    pad_mode: str = "replicate"
    kernel_init: Any = tinit.kaiming_normal
    dtype: Dtype = None
    pre_resize: tuple = ()

    @fnn.compact
    def __call__(self, x, train: bool = True, depth_fuse=None) -> LeanHandoff:
        from corrifnet_tpu.ops.instancenorm import relu_in_stats

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
