"""Fused ReLU + InstanceNorm Pallas kernel.

Every decoder/fusion conv in the 5-D zoo ends in the
``conv -> ReLU -> InstanceNorm3d`` epilogue (general_conv3d_prenorm,
mmvit4.py:41-45). InstanceNorm needs per-(sample, channel) statistics over
(D, H, W), which XLA computes as separate reduction + normalization passes
over the activation; this kernel does ReLU, both statistics and the
normalization in ONE VMEM residency per sample — the model is
bandwidth-bound, so fewer HBM passes is the win.

Shapes: channels-last volumes (B, D, H, W, C); grid over (B, channel
tiles). InstanceNorm statistics are per-(sample, channel) — rows of the
transposed (C, N) slab are independent — so the channel axis tiles freely:
each block holds (ct, N) with ct chosen so input+output stay well under
the ~16 MB/core VMEM. The pruned decoder's largest slab, (4, 128, 128, 32)
= 8 MB f32 per sample, runs as 4 blocks of (8, 65536) = 2 MB each. Only
when one 8-channel row-tile alone exceeds the budget (e.g. the full-depth
decoder's 128^3 volumes, which would need two-pass N tiling) does it fall
back to the XLA path.

Backward: custom VJP recomputing through the XLA composition (exact same
math), so gradients are standard-autodiff correct.

Opt-in via ``GeneralConv3d(use_pallas_epilogue=True)``; default off until
profiled on a trustworthy TPU attach (see NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["relu_instancenorm", "relu_instancenorm_xla", "relu_in_stats"]

# Set True to run in the Pallas interpreter (CPU testing).
INTERPRET = False


def relu_instancenorm_xla(x, eps=1e-5):
    """Reference path: ReLU then InstanceNorm over spatial axes (torch
    InstanceNorm3d defaults: no affine, biased variance, batch stats).

    Composed the way nn/norm.py composes model-wide: ONE f32 reduction
    pass (E[y] and E[y^2] fuse into a single read of the conv output) and
    one ``y*a + b`` fma pass in the compute dtype (an f32 fma makes XLA
    materialize an upcast copy of the whole slab — measured, NOTES.md).
    This is the path the full-depth decoder's 128^3 slabs take (the Pallas
    kernel's smallest row tile exceeds VMEM there), so its pass count
    matters more than anywhere else; it is also the off-TPU fallback and
    the composition the custom VJP differentiates through."""
    axes = tuple(range(1, x.ndim - 1))
    y = jax.nn.relu(x)
    yf = y.astype(jnp.float32)
    mean = yf.mean(axis=axes, keepdims=True)
    sq = (yf * yf).mean(axis=axes, keepdims=True)
    var = jnp.maximum(sq - mean * mean, 0.0)
    a = jax.lax.rsqrt(var + eps)
    b = -mean * a
    dt = x.dtype
    return y * a.astype(dt) + b.astype(dt)


def _kernel(eps, x_ref, o_ref):
    # transposed layout: (C, N) — channels on sublanes, spatial on lanes.
    # Channel counts in this zoo are small (8..320); putting them on the
    # 128-wide lane axis would pad tiny-C big-N slabs up to ~16x in VMEM.
    x = x_ref[0].astype(jnp.float32)  # (C, N)
    y = jnp.maximum(x, 0.0)
    n = y.shape[1]
    mean = y.sum(axis=1, keepdims=True) / n
    d = y - mean
    var = (d * d).sum(axis=1, keepdims=True) / n
    o_ref[0] = (d * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)


_VMEM_BLOCK_BUDGET = 8 * 1024 * 1024  # in + out per block <= half of ~16 MB


def _channel_tile(c, n):
    """Largest channel tile (multiple of 8, <= padded c) whose in+out f32
    blocks fit the VMEM budget; 0 if even an 8-row tile does not fit."""
    pad_c = -(-c // 8) * 8
    pad_n = -(-n // 128) * 128

    def fits(ct):
        return 2 * ct * pad_n * 4 <= _VMEM_BLOCK_BUDGET

    ct = pad_c
    while ct > 8 and not fits(ct):
        ct = -(-(ct // 2) // 8) * 8
    return ct if fits(ct) else 0


def _fused_fwd(x, eps):
    b = x.shape[0]
    c = x.shape[-1]
    n = 1
    for s in x.shape[1:-1]:
        n *= s
    ct = _channel_tile(c, n)
    if ct == 0:
        return relu_instancenorm_xla(x, eps)
    flat = x.reshape(b, n, c).swapaxes(1, 2)  # (B, C, N)
    spec = pl.BlockSpec(
        (1, ct, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, eps),
        grid=(b, -(-c // ct)),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        interpret=INTERPRET,
    )(flat)
    return out.swapaxes(1, 2).reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _relu_instancenorm_impl(x, eps=1e-5):
    return _fused_fwd(x, eps)


def relu_instancenorm(x, eps=1e-5):
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not on_tpu and not INTERPRET:
        return relu_instancenorm_xla(x, eps)
    # Under a device mesh (ops/meshctx.py) the kernel declares its own
    # batch-sharded partitioning; single-device runs call it directly.
    from corrifnet_tpu.ops.meshctx import island

    return island(lambda t: _relu_instancenorm_impl(t, eps), (0,), 0)(x)


def _vjp_fwd(x, eps):
    return _relu_instancenorm_impl(x, eps), x


def _vjp_bwd(eps, x, g):
    _, pullback = jax.vjp(lambda t: relu_instancenorm_xla(t, eps), x)
    return pullback(g)


_relu_instancenorm_impl.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Lean epilogue: relu + IN statistics with storage-minimal residuals.
#
# The full-depth decoder's backward working set is dominated by per-stage
# stored residuals: the standard composition keeps BOTH the conv's pre-act
# output (relu/IN backward) AND the normalized output (next conv's wgrad)
# alive until the backward — two (B, D, H, W, C) volumes per stage at depth
# up to 128 (NOTES round-4 memory ladder; per-conv remat provably cannot
# move it). ``relu_in_stats`` splits the epilogue: it returns the RELU
# output y plus the f32 normalization scalars (a, b) — the ``y*a+b`` fma
# and the consuming conv run inside a rematted region
# (nn.leandec.LeanGeneralConv3d), so the normalized volume is recomputed
# from (y, a, b) during the backward (one fused fma pass) instead of being
# stored, and the pre-act x is never a residual at all: the relu mask is
# recovered from y (``y > 0`` <=> ``x > 0`` exactly — bf16 relu preserves
# positive values bit-for-bit), and the statistics backward is hand-derived
# from (y, mean, var, a). Net: ONE stored volume per stage.
#
# Exactness: the forward is operation-identical to relu_instancenorm_xla
# (same single-pass E[x^2] stats, same cast placement); gradients equal
# autodiff's to f32 reassociation (tests/test_lean_decoder.py).
# ---------------------------------------------------------------------------


def _relu_stats_math(x, eps):
    axes = tuple(range(1, x.ndim - 1))
    y = jax.nn.relu(x)
    yf = y.astype(jnp.float32)
    mean = yf.mean(axis=axes, keepdims=True)
    sq = (yf * yf).mean(axis=axes, keepdims=True)
    var = jnp.maximum(sq - mean * mean, 0.0)
    a = jax.lax.rsqrt(var + eps)
    b = -mean * a
    dt = x.dtype
    return y, mean, var, a, a.astype(dt), b.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def relu_in_stats(x, eps=1e-5):
    """relu + InstanceNorm statistics, lean-residual form.

    Returns ``(y, a, b)`` with ``y = relu(x)`` and the per-(sample,
    channel) normalization scalars in the compute dtype; the caller applies
    ``y * a + b`` (bit-identical to ``relu_instancenorm_xla(x)``) inside a
    rematted region so the normalized volume is never stored."""
    y, _, _, _, ac, bc = _relu_stats_math(x, eps)
    return y, ac, bc


def _ris_fwd(x, eps):
    y, mean, var, a, ac, bc = _relu_stats_math(x, eps)
    return (y, ac, bc), (y, mean, var, a)


def _ris_bwd(eps, res, cts):
    y, mean, var, a = res
    gy, gac, gbc = cts
    axes = tuple(range(1, y.ndim - 1))
    n = 1.0
    for ax in axes:
        n *= y.shape[ax]
    # mirror autodiff through _relu_stats_math: the a/b cotangents arrive
    # from the consumer's fma transpose (gac = sum g*y, gbc = sum g)
    da = gac.astype(jnp.float32)
    db = gbc.astype(jnp.float32)
    dmean = -a * db
    da = da - mean * db
    dvar = jnp.where(var > 0, -0.5 * a * a * a * da, 0.0)
    dmean = dmean - 2.0 * mean * dvar
    yf = y.astype(jnp.float32)
    dyf = (2.0 * yf * dvar + dmean) * (1.0 / n)
    dy = gy + dyf.astype(y.dtype)
    dx = jnp.where(y > 0, dy, jnp.zeros((), y.dtype))
    return (dx,)


relu_in_stats.defvjp(_ris_fwd, _ris_bwd)
