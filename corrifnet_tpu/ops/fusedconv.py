"""Fused bottleneck convolutions: BN-apply + ReLU on the input load, conv
on the MXU, per-channel batch statistics accumulated in the output epilogue.

Why: the ResNet3D bottleneck (models/resnet3d.py, reference
mmvit4.py:196-212) is conv -> BatchNorm -> ReLU three times per block. In
the XLA composition every conv output makes THREE full HBM round trips:
the conv write, the statistics read (single-pass E[x]/E[x^2], nn/norm.py),
and the normalize+relu read feeding the next conv. BatchNorm's batch
statistics are a global reduction, so no amount of XLA fusion can overlap
the stats pass with the conv that produces the tensor — but a Pallas kernel
can: the per-channel ``sum`` and ``sum of squares`` are accumulated from
the f32 MXU accumulator *while the output tile is written*, and the
previous BN's fold + ReLU are applied to the *input* tile as it is loaded.
Each activation then crosses HBM exactly twice (one write, one read).

Two kernel families:

  * ``pointwise_conv_stats`` — the bottleneck's 1x1 convs (conv1/conv3/
    down): a blocked (n, ci) @ (ci, co) matmul, grid over row blocks, with
    an optional per-channel ``relu(x*a + b)`` prologue and the stats
    epilogue.
  * ``conv3x3_fma_relu_stats`` — the bottleneck's (1,3,3) spatial conv
    (depth folded into batch by the caller): whole images are staged in
    VMEM, zero-padded there (never in HBM), the prologue is applied once
    per input tile, and the conv runs as 9 shifted matmuls accumulating in
    an f32 scratch. Stride-1 only; the three stride-2 block0 convs fall
    back to the XLA composition.

Numerics: statistics are taken from the f32 MXU accumulator *before* the
output is rounded to the compute dtype — in f32 mode this is bit-compatible
with the unfused BatchNorm (which upcasts the stored output); in bf16 mode
it is slightly MORE accurate (the unfused path reads back bf16-rounded
values). Backward passes are hand-written XLA compositions (matmuls /
convs) checked against autodiff of the reference composition.

Off-TPU both entry points dispatch to the XLA reference composition;
interpret-mode tests cover the kernels themselves on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pointwise_conv_stats",
    "pointwise_conv_stats_xla",
    "conv3x3_fma_relu_stats",
    "conv3x3_fma_relu_stats_xla",
]

# Set True to run in the Pallas interpreter (CPU testing).
INTERPRET = False


def _interpret():
    return pltpu.InterpretParams() if INTERPRET else False


# Mosaic double-buffers EVERY in/out block (including constant-index-map
# weight blocks — measured: the layer4 3x3 kernel's scoped allocation was
# 18.23 MiB against a 10 MiB single-buffer estimate, the gap being 2x the
# 4.5 MiB weight block plus 2x the x/y blocks). Estimates below count 2x
# per in/out block and 1x per scratch, and the computed total is passed to
# the compiler as the scoped-VMEM limit (v5e default 16 MiB, hardware
# 128 MiB/core).
_VMEM_BUDGET = 28 * 2 ** 20


def _cp(est_bytes):
    # 25% + 4 MiB headroom: Mosaic's stack accounting includes vector
    # temps the block-level estimate can't see (measured: layer4 3x3 fwd
    # allocated 25.25 MiB against an 18.95 MiB block estimate).
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(max(est_bytes * 5 // 4 + 4 * 2 ** 20,
                                     16 * 2 ** 20), 100 * 2 ** 20))
    )


def _on_tpu():
    return jax.default_backend() not in ("cpu", "gpu")


# ---------------------------------------------------------------------------
# XLA reference compositions (also the off-TPU path)
# ---------------------------------------------------------------------------


def _prologue_xla(x, a, b):
    """relu(x*a + b) with the fma in the compute dtype (matches
    nn/norm.py's application strategy)."""
    dt = x.dtype
    return jax.nn.relu(x * a.astype(dt) + b.astype(dt))


def pointwise_conv_stats_xla(x, w, a=None, b=None):
    """Reference: z = relu(x*a+b) (or z = x), y = z @ w, stats of y.

    x: (n, ci); w: (ci, co); a/b: (ci,) f32 or None (both or neither).
    Returns (y (n, co) in x.dtype, s (co,) f32, q (co,) f32) with
    s = sum_n y_f32, q = sum_n y_f32^2 taken from the f32 accumulation.
    """
    z = _prologue_xla(x, a, b) if a is not None else x
    acc = jnp.promote_types(x.dtype, jnp.float32)
    yf = jnp.dot(z, w, preferred_element_type=acc)
    s = yf.sum(axis=0).astype(jnp.float32)
    q = (yf * yf).sum(axis=0).astype(jnp.float32)
    return yf.astype(x.dtype), s, q


def conv3x3_fma_relu_stats_xla(x, w, a, b):
    """Reference: z = relu(x*a+b) zero-padded (1,1), y = conv3x3(z, w).

    x: (B, H, W, ci); w: (3, 3, ci, co); a/b: (ci,) f32.
    Returns (y (B, H, W, co), s (co,), q (co,)).
    """
    z = _prologue_xla(x, a, b)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    yf = jax.lax.conv_general_dilated(
        z, w.astype(z.dtype), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )
    s = yf.sum(axis=(0, 1, 2)).astype(jnp.float32)
    q = (yf * yf).sum(axis=(0, 1, 2)).astype(jnp.float32)
    return yf.astype(x.dtype), s, q


# ---------------------------------------------------------------------------
# Pointwise kernel
# ---------------------------------------------------------------------------

_N_BLK = 512  # row block; masked tail, so any n works


def _pw_kernel(x_ref, a_ref, b_ref, w_ref, y_ref, s_ref, q_ref, *, relu_fma, n):
    i = pl.program_id(0)
    nb = x_ref.shape[0]
    x = x_ref[...]
    if relu_fma:
        dt = x.dtype
        z = jnp.maximum(x * a_ref[0, :].astype(dt) + b_ref[0, :].astype(dt), 0)
    else:
        z = x
    # zero rows past n so padded tail rows contribute nothing to y/s/q
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0) + i * nb
    z = jnp.where(rows < n, z, 0)
    yf = jnp.dot(z, w_ref[...], preferred_element_type=jnp.float32)
    y_ref[...] = yf.astype(y_ref.dtype)

    @pl.when(i == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    s_ref[...] += yf.sum(axis=0, keepdims=True)
    q_ref[...] += (yf * yf).sum(axis=0, keepdims=True)


def _pw_pallas(x, w, a, b, relu_fma):
    n, ci = x.shape
    co = w.shape[1]
    nb = min(_N_BLK, max(8, n))
    esize = x.dtype.itemsize
    wes = w.dtype.itemsize

    def _est(blk):
        # 2x per in/out block (x, a, b, w | y, s, q), 1x temps (z, f32 yf)
        blocks = (blk * ci * esize + 2 * ci * 4 + ci * co * wes
                  + blk * co * esize + 2 * co * 4)
        temps = blk * ci * esize + blk * co * 4
        return 2 * blocks + temps

    while nb > 64 and _est(nb) > _VMEM_BUDGET:
        nb //= 2
    grid = (pl.cdiv(n, nb),)
    if a is None:
        a = jnp.ones((ci,), jnp.float32)
        b = jnp.zeros((ci,), jnp.float32)
    y, s, q = pl.pallas_call(
        functools.partial(_pw_kernel, relu_fma=relu_fma, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, ci), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, co), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, co), x.dtype),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        compiler_params=_cp(_est(nb)),
        interpret=_interpret(),
    )(x, a.reshape(1, ci), b.reshape(1, ci), w)
    return y, s[0], q[0]


def _pw_bwd_kernel(x_ref, a_ref, b_ref, w_ref, y_ref, dy_ref, ds_ref, dq_ref,
                   dx_ref, dw_ref, da_ref, db_ref, *, relu_fma, n):
    """One pass: g = dy + ds + 2*dq*y; dw += z^T g; dz = g w^T; prologue
    backward (mask/fma) emits dx and accumulates da/db. x/y/dy are read
    once; no intermediate crosses HBM."""
    i = pl.program_id(0)
    nb = x_ref.shape[0]
    dt = x_ref.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0) + i * nb
    live = rows < n

    gf = (dy_ref[...].astype(jnp.float32) + ds_ref[...]
          + 2.0 * dq_ref[...] * y_ref[...].astype(jnp.float32))
    g = jnp.where(live, gf, 0.0).astype(dt)

    # zero dead rows of x as well: padded tail blocks may hold arbitrary
    # bits (NaN * 0 would poison the dw/da accumulators)
    x = jnp.where(live, x_ref[...], 0)
    if relu_fma:
        pre = x * a_ref[0, :].astype(dt) + b_ref[0, :].astype(dt)
        z = jnp.maximum(pre, 0)
    else:
        z = x

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += jax.lax.dot_general(
        z, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dz = jax.lax.dot_general(
        g, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    if relu_fma:
        # compare in f32: Mosaic on v5e rejects arith.cmpf on packed bf16
        # vectors ("Target does not support this comparison"); the cast is
        # exact, so the mask is unchanged.
        dpre = jnp.where(pre.astype(jnp.float32) > 0.0, dz, 0)
        dx_ref[...] = dpre * a_ref[0, :].astype(dt)
        dpf = dpre.astype(jnp.float32)
        da_ref[...] += (dpf * x.astype(jnp.float32)).sum(axis=0, keepdims=True)
        db_ref[...] += dpf.sum(axis=0, keepdims=True)
    else:
        dx_ref[...] = dz


def _pw_bwd_pallas(x, a, b, w, y, dy, ds, dq, relu_fma):
    n, ci = x.shape
    co = w.shape[1]
    nb = min(_N_BLK, max(8, n))
    esize = x.dtype.itemsize
    wes = w.dtype.itemsize

    def _est(blk):
        # 2x per in/out block (x,a,b,w,y,dy,ds,dq | dx,dw,da,db), 1x temps
        blocks = (2 * blk * ci * esize + 2 * blk * co * esize
                  + ci * co * (wes + 4) + 4 * ci * 4 + 2 * co * 4)
        temps = blk * (ci + co) * 4 + blk * (ci + co) * esize
        return 2 * blocks + temps

    while nb > 64 and _est(nb) > _VMEM_BUDGET:
        nb //= 2
    grid = (pl.cdiv(n, nb),)
    dx, dw, da, db = pl.pallas_call(
        functools.partial(_pw_bwd_kernel, relu_fma=relu_fma, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, ci), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, co), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, co), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, ci), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ci), x.dtype),
            jax.ShapeDtypeStruct((ci, co), jnp.float32),
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
        ],
        compiler_params=_cp(_est(nb)),
        interpret=_interpret(),
    )(x, a.reshape(1, ci), b.reshape(1, ci), w, y, dy,
      ds.reshape(1, co), dq.reshape(1, co))
    return dx, dw.astype(w.dtype), da[0], db[0]


def _pw_bwd_math(x, a, b, w, y, dy, ds, dq, relu_fma):
    """Hand-written VJP: g = dy + ds + 2*dq*y (stats cotangents fold into
    the output cotangent), then plain matmul transposes; the prologue's
    relu/fma backward reconstructs the mask from x (cheap elementwise)."""
    dt = x.dtype
    g = dy.astype(jnp.float32) + ds + 2.0 * dq * y.astype(jnp.float32)
    g = g.astype(dt)
    if relu_fma:
        pre = x * a.astype(dt) + b.astype(dt)
        z = jnp.maximum(pre, 0)
    else:
        z = x
    dwf = jnp.dot(z.T, g, preferred_element_type=jnp.float32)
    dz = jnp.dot(g, w.T)
    if relu_fma:
        dpre = jnp.where(pre > 0, dz, 0)
        dx = dpre * a.astype(dt)
        da = (dpre.astype(jnp.float32) * x.astype(jnp.float32)).sum(axis=0)
        db = dpre.astype(jnp.float32).sum(axis=0)
        return dx, da, db, dwf.astype(w.dtype)
    return dz, None, None, dwf.astype(w.dtype)


def _pw_impl(x, a, b, w, relu_fma):
    if _on_tpu() or INTERPRET:
        return _pw_pallas(x, w, a, b, relu_fma)
    return pointwise_conv_stats_xla(x, w, a if relu_fma else None, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pw_op(x, a, b, w, relu_fma):
    return _pw_impl(x, a, b, w, relu_fma)


def _pw_fwd(x, a, b, w, relu_fma):
    out = _pw_impl(x, a, b, w, relu_fma)
    return out, (x, a, b, w, out[0])


def _pw_bwd(relu_fma, res, cts):
    x, a, b, w, y = res
    dy, ds, dq = cts
    if _on_tpu() or INTERPRET:
        dx, dw, da, db = _pw_bwd_pallas(x, a, b, w, y, dy, ds, dq, relu_fma)
        if not relu_fma:
            da = jnp.zeros_like(a)
            db = jnp.zeros_like(b)
        return dx, da, db, dw
    dx, da, db, dw = _pw_bwd_math(x, a, b, w, y, dy, ds, dq, relu_fma)
    if da is None:
        da = jnp.zeros_like(a)
        db = jnp.zeros_like(b)
    return dx, da, db, dw


_pw_op.defvjp(_pw_fwd, _pw_bwd)


def pointwise_conv_stats(x, w, a: Optional[jnp.ndarray] = None,
                         b: Optional[jnp.ndarray] = None):
    """Fused 1x1 conv with BN-stats epilogue (and optional BN-apply+ReLU
    prologue when ``a``/``b`` are given).

    x: (..., ci) activation (any leading shape, flattened internally);
    w: (ci, co); a/b: per-channel f32 fold vectors of the PREVIOUS BN
    (see nn/norm.py ``bn_fold``) or None for a raw matmul.
    Returns (y (..., co), s (co,) f32, q (co,) f32) where s/q are the
    per-channel sum / sum-of-squares of y over all leading axes.
    """
    lead = x.shape[:-1]
    ci = x.shape[-1]
    x2 = x.reshape(-1, ci)
    relu_fma = a is not None
    if not relu_fma:
        a = jnp.ones((ci,), jnp.float32)
        b = jnp.zeros((ci,), jnp.float32)
    y, s, q = _pw_op(x2, a, b, w, relu_fma)
    return y.reshape(*lead, w.shape[1]), s, q


# ---------------------------------------------------------------------------
# 3x3 kernel (stride 1, zero padding (1, 1))
# ---------------------------------------------------------------------------


def _c3_pick_p(batch, h, w, ci, co, esize, wes):
    """Images per program + scoped-VMEM estimate: fill ~2-4k matmul rows
    without blowing the budget.

    Counts 2x for every in/out block (x, a, b, the weight, y, s, q — all
    double-buffered by Mosaic) and 1x for the z scratch
    ((p, H+2, W+2, ci)), the f32 accumulator and the prologue temp."""
    kbytes = 9 * ci * co * wes
    best, best_est = 1, None
    for p in range(1, batch + 1):
        zb = p * (h + 2) * (w + 2) * ci * esize
        acc = p * h * w * co * 4
        xy = p * h * w * (ci + co) * esize
        e = 2 * (xy + kbytes + 2 * ci * 4 + 2 * co * 4) + zb + acc \
            + p * h * w * ci * esize + 2 * p * h * w * co * 4
        if e > _VMEM_BUDGET and p > 1:
            break
        best, best_est = p, e
        if p * h * w >= 2048:
            break
    return best, best_est


def _c3_kernel(x_ref, a_ref, b_ref, w_ref, y_ref, s_ref, q_ref, z_ref,
               acc_ref, *, batch, h, w):
    i = pl.program_id(0)
    p, ci = x_ref.shape[0], x_ref.shape[3]
    co = w_ref.shape[3]
    dt = x_ref.dtype

    x = x_ref[...]
    z = jnp.maximum(x * a_ref[0, :].astype(dt) + b_ref[0, :].astype(dt), 0)
    # zero out padded tail images (grid may overrun batch)
    imgs = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1, 1), 0) + i * p
    z = jnp.where(imgs < batch, z, 0)
    z_ref[...] = jnp.zeros_like(z_ref)  # zero borders == conv's (1,1) pad
    z_ref[:, 1:h + 1, 1:w + 1, :] = z

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for u in range(3):
        for v in range(3):
            zs = z_ref[:, u:u + h, v:v + w, :].reshape(p * h * w, ci)
            acc_ref[...] += jnp.dot(
                zs, w_ref[u, v], preferred_element_type=jnp.float32
            )
    yf = acc_ref[...]
    y_ref[...] = yf.reshape(p, h, w, co).astype(dt)

    @pl.when(i == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    s_ref[...] += yf.sum(axis=0, keepdims=True)
    q_ref[...] += (yf * yf).sum(axis=0, keepdims=True)


def _c3_pallas(x, w, a, b):
    batch, h, ww, ci = x.shape
    co = w.shape[3]
    esize = x.dtype.itemsize
    p, est = _c3_pick_p(batch, h, ww, ci, co, esize, w.dtype.itemsize)
    grid = (pl.cdiv(batch, p),)
    y, s, q = pl.pallas_call(
        functools.partial(_c3_kernel, batch=batch, h=h, w=ww),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p, h, ww, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p, h, ww, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, h, ww, co), x.dtype),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, h + 2, ww + 2, ci), x.dtype),
            pltpu.VMEM((p * h * ww, co), jnp.float32),
        ],
        compiler_params=_cp(est),
        interpret=_interpret(),
    )(x, a.reshape(1, ci), b.reshape(1, ci), w)
    return y, s[0], q[0]


def _c3_impl(x, a, b, w):
    # CORRIFNET_FUSED_C3=xla: plan-B for the measurement session — keep the
    # fused pointwise kernels but run conv2 as the XLA composition (its
    # Mosaic risks: the offset interior scratch write + per-tap
    # strided-value reshape; see NOTES.md).
    import os

    if (_on_tpu() or INTERPRET) and os.environ.get(
        "CORRIFNET_FUSED_C3", "pallas"
    ) != "xla":
        return _c3_pallas(x, w, a, b)
    return conv3x3_fma_relu_stats_xla(x, w, a, b)


@jax.custom_vjp
def _c3_op(x, a, b, w):
    return _c3_impl(x, a, b, w)


def _c3_fwd(x, a, b, w):
    out = _c3_impl(x, a, b, w)
    return out, (x, a, b, w, out[0])


def _c3_bwd_kernel(x_ref, a_ref, b_ref, w_ref, y_ref, dy_ref, ds_ref, dq_ref,
                   dx_ref, dw_ref, da_ref, db_ref, z_ref, g_ref, acc_ref,
                   *, batch, h, w):
    """One pass over x/y/dy per image group: g = dy + ds + 2*dq*y; z and g
    are staged zero-padded in VMEM; dw[u,v] += z_shift(u,v)^T g (9 f32
    accumulators), dz = sum_s g_shift(s) @ w[2-s]^T, then the prologue's
    mask/fma backward emits dx and accumulates da/db."""
    i = pl.program_id(0)
    p, ci = x_ref.shape[0], x_ref.shape[3]
    co = w_ref.shape[3]
    dt = x_ref.dtype
    imgs = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1, 1), 0) + i * p
    live = imgs < batch

    x = jnp.where(live, x_ref[...], 0)
    gf = (dy_ref[...].astype(jnp.float32) + ds_ref[0, :]
          + 2.0 * dq_ref[0, :] * y_ref[...].astype(jnp.float32))
    g = jnp.where(live, gf, 0.0).astype(dt)

    pre = x * a_ref[0, :].astype(dt) + b_ref[0, :].astype(dt)
    z_ref[...] = jnp.zeros_like(z_ref)
    z_ref[:, 1:h + 1, 1:w + 1, :] = jnp.maximum(pre, 0)
    g_ref[...] = jnp.zeros_like(g_ref)
    g_ref[:, 1:h + 1, 1:w + 1, :] = g

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    g2 = g.reshape(p * h * w, co)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for u in range(3):
        for v in range(3):
            zs = z_ref[:, u:u + h, v:v + w, :].reshape(p * h * w, ci)
            dw_ref[u, v] += jax.lax.dot_general(
                zs, g2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gs = g_ref[:, u:u + h, v:v + w, :].reshape(p * h * w, co)
            # dz[i] = sum_s gpad[i+s] w[2-s]: contract over co
            acc_ref[...] += jax.lax.dot_general(
                gs, w_ref[2 - u, 2 - v], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    dz = acc_ref[...].reshape(p, h, w, ci).astype(dt)
    # f32 compare: v5e Mosaic rejects cmpf on packed bf16 vectors
    dpre = jnp.where(pre.astype(jnp.float32) > 0.0, dz, 0)
    dx_ref[...] = dpre * a_ref[0, :].astype(dt)
    dpf = dpre.astype(jnp.float32)
    da_ref[...] += (dpf * x.astype(jnp.float32)).sum(axis=(0, 1, 2))[None]
    db_ref[...] += dpf.sum(axis=(0, 1, 2))[None]


def _c3_bwd_pick_p(batch, h, w, ci, co, esize, wes):
    """Images per program + scoped-VMEM estimate for the 3x3 backward.

    2x per in/out block (x, a, b, w, y, dy, ds, dq | dx, dw, da, db);
    1x for the z/g/dz scratches and the f32 g/dpre temps. The fixed cost
    is dominated by the double-buffered dw accumulator (9*ci*co f32) and
    weight block — at layer4 (ci=co=512) that alone is ~28 MiB, which is
    why the estimate (not a fixed gate) decides Pallas vs XLA fallback."""
    fixed = 2 * (9 * ci * co * (esize + 4) + 4 * ci * 4 + 2 * co * 4)
    best, best_est = 1, None
    for p in range(1, batch + 1):
        zb = p * (h + 2) * (w + 2) * (ci + co) * esize
        acc = p * h * w * ci * 4
        xy = 2 * p * h * w * (2 * ci + 2 * co) * esize
        temps = p * h * w * (ci + co) * 4
        e = fixed + zb + acc + xy + temps
        if e > _VMEM_BUDGET and p > 1:
            break
        best, best_est = p, e
        if p * h * w >= 2048:
            break
    return best, best_est


def _c3_bwd_pallas(x, a, b, w, y, dy, ds, dq):
    batch, h, ww, ci = x.shape
    co = w.shape[3]
    esize = x.dtype.itemsize
    p, est = _c3_bwd_pick_p(batch, h, ww, ci, co, esize, w.dtype.itemsize)
    grid = (pl.cdiv(batch, p),)
    dx, dw, da, db = pl.pallas_call(
        functools.partial(_c3_bwd_kernel, batch=batch, h=h, w=ww),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p, h, ww, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, h, ww, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, h, ww, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p, h, ww, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, h, ww, ci), x.dtype),
            jax.ShapeDtypeStruct((3, 3, ci, co), jnp.float32),
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, h + 2, ww + 2, ci), x.dtype),
            pltpu.VMEM((p, h + 2, ww + 2, co), x.dtype),
            pltpu.VMEM((p * h * ww, ci), jnp.float32),
        ],
        compiler_params=_cp(est),
        interpret=_interpret(),
    )(x, a.reshape(1, ci), b.reshape(1, ci), w, y, dy,
      ds.reshape(1, co), dq.reshape(1, co))
    return dx, dw.astype(w.dtype), da[0], db[0]


def _c3_bwd(res, cts):
    x, a, b, w, y = res
    dy, ds, dq = cts
    ci, co = w.shape[2], w.shape[3]
    import os

    # Pallas bwd only where even the single-image-per-program estimate
    # fits a generous scoped-VMEM ceiling (layer4's double-buffered dw
    # accumulator + weight block alone is ~28 MiB — still fine; shapes
    # beyond ~64 MiB fall back to the XLA composition)
    _, est1 = _c3_bwd_pick_p(
        x.shape[0], x.shape[1], x.shape[2], ci, co, x.dtype.itemsize,
        w.dtype.itemsize,
    )
    if (
        (_on_tpu() or INTERPRET)
        and est1 <= 64 * 2 ** 20
        and os.environ.get("CORRIFNET_FUSED_C3", "pallas") != "xla"
    ):
        dx, dw, da, db = _c3_bwd_pallas(x, a, b, w, y, dy, ds, dq)
        return dx, da, db, dw
    dt = x.dtype
    _, h, ww, _ = x.shape
    g = dy.astype(jnp.float32) + ds + 2.0 * dq * y.astype(jnp.float32)
    g = g.astype(dt)
    pre = x * a.astype(dt) + b.astype(dt)
    z = jnp.maximum(pre, 0)
    wc = w.astype(dt)
    # dz = conv(g, flip(w) with in/out swapped), same (1,1) padding
    dn = jax.lax.conv_dimension_numbers(
        g.shape, (3, 3, wc.shape[3], wc.shape[2]), ("NHWC", "HWIO", "NHWC")
    )
    dz = jax.lax.conv_general_dilated(
        g, jnp.flip(wc, (0, 1)).transpose(0, 1, 3, 2), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=dn,
    )
    # dw[u,v] = zpad_shift(u,v)^T @ g — 9 plain matmuls, f32 accumulation
    zp = jnp.pad(z, [(0, 0), (1, 1), (1, 1), (0, 0)])
    dw = jnp.stack([
        jnp.stack([
            jnp.einsum(
                "bijc,bijo->co", zp[:, u:u + h, v:v + ww], g,
                preferred_element_type=jnp.float32,
            )
            for v in range(3)
        ], axis=0)
        for u in range(3)
    ], axis=0)
    dpre = jnp.where(pre > 0, dz, 0)
    dx = dpre * a.astype(dt)
    da = (dpre.astype(jnp.float32) * x.astype(jnp.float32)).sum(axis=(0, 1, 2))
    db = dpre.astype(jnp.float32).sum(axis=(0, 1, 2))
    return dx, da, db, dw.astype(w.dtype)


_c3_op.defvjp(_c3_fwd, _c3_bwd)


def conv3x3_fma_relu_stats(x, w, a, b):
    """Fused (3, 3) stride-1 conv: BN-apply + ReLU prologue on the input
    load, zero padding materialized only in VMEM, per-channel stats of the
    output accumulated from the f32 MXU accumulator.

    x: (B, H, W, ci) (callers fold a unit depth-kernel axis into B);
    w: (3, 3, ci, co); a/b: (ci,) f32 fold vectors of the previous BN.
    Returns (y (B, H, W, co), s (co,) f32, q (co,) f32).
    """
    return _c3_op(x, a, b, w)
