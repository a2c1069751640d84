"""Fused multi-head self-attention Pallas kernels for the token transformers.

CorrIFNet's attention shapes are fixed — 512 tokens (IntraFormer,
mmvit4.py:408-411) or 2048 tokens (multimodal transformer, :515-521) at
head_dim 64. At batch 16 the multimodal attention matrix is
bf16[16,8,2048,2048] ≈ 1.07 GB; the XLA composition writes it to HBM in the
forward AND re-materializes it twice in the backward — the single largest
HBM-traffic item in the profiled train step. These kernels never let the
(N, N) matrix leave VMEM:

  * forward: grid (B*H,); per grid step Q/K/V for one (batch, head) are
    VMEM-resident and a fori_loop walks query blocks — full-row softmax in
    f32 (exact, no running-max bookkeeping needed);
  * backward: ONE kernel with the same grid producing dq/dk/dv in a
    single query-block walk (f32 dk/dv accumulator carries). The softmax
    recompute uses the forward's logsumexp residual stored PACKED as
    (BH, N/128, 128) f32 — 8 KB per row instead of the naive (N, 1) ref
    that lane-pads 128-wide and blew the scoped-VMEM budget — so p
    rebuilds in one fma+exp2 pass (no max/sum lane reductions). Softmax
    runs in the exp2 domain with the score scale folded into the fma
    constant, and the backward folds it into k*scale / a final dk scale
    — no standalone scale pass over (q_blk, N) anywhere;
  * attention-probability dropout (the reference trains with
    Dropout(0.1) on the softmax output, mmvit4.py:307-312) runs INSIDE the
    kernels via the TPU PRNG, so forward and both backward kernels
    regenerate bit-identical masks without ever materializing an (N, N)
    mask in HBM. The mask distribution matches flax Dropout (keep-prob
    1-p, 1/(1-p) scaling); the bitstream is the TPU PRNG's, not threefry —
    dropout masks carry no parity requirement.

vmap-safety (load-bearing): the modality IntraFormers run under ``nn.vmap``
(models/mmvit4.py `_ModalityStream`), and Pallas batches a vmapped
pallas_call by PREPENDING a grid dimension — which silently renumbers
``pl.program_id``. These kernels therefore use NO ``pl.program_id`` at
all: the (batch*head) coordinate enters only through BlockSpec row
selection (including the per-row dropout seed, carried as a (BH, 1, 2)
SMEM operand mixed on the host), and query/key block indices come from the
in-kernel loop, not the grid. The same kernels are correct unbatched and
under any vmap nesting.

Numerics: scores/softmax in f32 (the XLA path rounds scores to bf16 before
softmax, so the kernel is slightly *more* accurate); probability tiles are
cast to the value dtype for the PV matmul exactly like the XLA path.

Opt-in via ``corrifnet_tpu.nn.Transformer(use_pallas_attn=True)``; falls
back to the XLA composition (with an explicit bernoulli dropout mask) on
CPU/GPU so tests run everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention", "attention_xla"]

# Set True to run in the Pallas interpreter (CPU testing).
INTERPRET = False


def _interpret():
    # The TPU-aware interpreter (supports pltpu.prng_*); False on hardware.
    return pltpu.InterpretParams() if INTERPRET else False

_Q_BLK = 256  # uniform across fwd/dq/dkv: the dropout mask tile is (q_blk, k_blk)
_Q_BLK_LARGE = 256  # n > 1024: the (q_blk, N) temporaries must fit scoped
# VMEM next to the dk/dv f32 accumulator carries (16 MB limit at n=2048
# bf16, measured via the compile service). 256 only fits because the
# backward holds p/p_drop in bf16 and the dropout mask is a bf16 {0,1}
# multiplier — 128 was the ceiling with f32 p and a compare mask.
_K_BLK = 2048  # mask-tile width (the score rows themselves span all of N);
# one whole-row PRNG call per query block (vs reseed+concat per sub-tile)

_LOG2E = 1.4426950408889634
_LANES = 128  # lse residual packing width (f32 lane tile)

# Host-side per-(batch*head) seed stride; the in-kernel (qi, kj) mix
# (max (n/q_blk - 1)*7919 + n/k_blk - 1) must stay below it so dropout
# seeds never alias across rows — enforced in fused_attention (falls back
# to XLA rather than silently correlating masks). At n=2048 the mix tops
# out at 15*7919 + 3 = 118788.
_ROW_MIX = np.uint32(1000003)


def _mix_collision_free(n):
    q_blk, k_blk = _q_blk(n), _blk(n, _K_BLK)
    if q_blk is None or k_blk is None:
        return False
    return (n // q_blk - 1) * 7919 + (n // k_blk - 1) < int(_ROW_MIX)


def _blk(n, target):
    """Block length: ``target`` when it divides n, whole-row for short n,
    else None (caller falls back to XLA). Must be a pure function of (n,
    target) — forward and both backward kernels derive the dropout-mask
    tile shape from it."""
    if n % target == 0:
        return target
    if n <= target:
        return n
    return None


def _q_blk(n):
    """Query-block length — pure function of n (mask-tile contract)."""
    return _blk(n, _Q_BLK_LARGE if n > 1024 else _Q_BLK)


def attention_xla(q, k, v, scale, dropout_rate=0.0, rng=None):
    """Reference path: (B, H, N, D) heads-major attention, optional
    probability dropout (flax semantics: keep-prob 1-p, 1/(1-p) scale)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0).astype(p.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _keep_mult(rate, seed_ref, qi, q_blk, n, dtype):
    """Bernoulli(1-rate) keep mask for query block ``qi`` vs ALL keys as an
    EXACT {0, 1} multiplier in ``dtype`` (both values are representable in
    bf16, and x*1 / x*0 are exact in any dtype — so masking by multiply is
    bitwise-identical to a where(), at half the scoped-VMEM residency of a
    compare mask). Assembled from (q_blk, k_blk) PRNG tiles. ``qi`` may be
    a traced loop index; the key-block index is a static int; the row
    coordinate lives in the seed operand itself — identical bits in the
    forward and backward kernels, under vmap or not. Mosaic caps prng_seed
    at 2 words, so tile coordinates mix into the second."""
    k_blk = _blk(n, _K_BLK)
    # 31-bit threshold: Mosaic cannot relayout wide i1 vectors next to the
    # bf16 consumers (observed relayout error), so the compare is done in
    # integer arithmetic — drop the PRNG word's top bit, then
    # (b31 - t31) >> 31 is 1 exactly when b31 < t31 (the borrow bit).
    t31 = np.int32(min(int(rate * 4294967296.0), 4294967295) >> 1)
    qmix = jnp.asarray(qi, jnp.uint32) * np.uint32(7919)
    tiles = []
    for kj in range(n // k_blk):
        pltpu.prng_seed(
            seed_ref[0, 0, 0], seed_ref[0, 0, 1] + qmix + np.uint32(kj)
        )
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((q_blk, k_blk)), jnp.int32
        )
        b31 = jax.lax.shift_right_logical(bits, np.int32(1))
        drop = jax.lax.shift_right_logical(b31 - t31, np.int32(31))
        tiles.append((np.int32(1) - drop).astype(dtype))
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=1)


# ---------------------------------------------------------------- forward


def _col_to_rows(col):
    """(q_blk, 1) f32 -> (q_blk/128, 128): Mosaic supports the
    (128, 1) <-> (1, 128) shape cast but not multi-row forms — chunk it."""
    q_blk = col.shape[0]
    return jnp.concatenate(
        [col[i * _LANES:(i + 1) * _LANES].reshape(1, _LANES)
         for i in range(q_blk // _LANES)], axis=0)


def _rows_to_col(mat):
    """(q_blk/128, 128) f32 -> (q_blk, 1), chunked (see _col_to_rows)."""
    r = mat.shape[0]
    return jnp.concatenate(
        [mat[i:i + 1, :].reshape(_LANES, 1) for i in range(r)], axis=0)


def _use_lse(n, q_blk):
    """The packed lse residual needs 128-aligned query blocks; the model's
    two shapes (512, 2048) qualify. Others recompute max/sum in backward.
    ``CORRIFNET_ATTN_LSE=0`` disables the residual entirely: the extra
    forward output pushes the B=16 MMVit4 train-step program past what
    the axon remote compile helper survives (HTTP 500; B=8 — the faster
    config anyway — compiles and gains ~5% step time from the residual)."""
    if os.environ.get("CORRIFNET_ATTN_LSE", "1") == "0":
        return False
    return n % _LANES == 0 and q_blk % _LANES == 0


def _softmax_rows(q, k, scale):
    """f32 softmax rows for one query block, exp2-domain: the score scale
    folds into the (s - m) * c fma feeding exp2 (c = scale * log2e), so no
    standalone scale pass ever touches the (q_blk, N) array. Returns
    (p, lse2) with lse2 = m*c + log2(sum) — the backward recomputes p from
    the raw scores in ONE fma+exp2 pass as exp2(s*c - lse2), bitwise
    identical to p here."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (q_blk, N) f32, raw (unscaled) scores
    c = np.float32(scale * _LOG2E)
    m = s.max(axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * c)
    r = e.sum(axis=-1, keepdims=True)
    p = e * (1.0 / r)
    return p, m * c + jnp.log2(r)


def _fwd_kernel(scale, rate, q_blk, q_ref, k_ref, v_ref, seed_ref, o_ref,
                lse_ref):
    k, v = k_ref[0], v_ref[0]
    n = k.shape[0]

    def body(qi, carry):
        rows = pl.ds(qi * q_blk, q_blk)
        p, lse2 = _softmax_rows(q_ref[0, rows, :], k, scale)
        p = p.astype(v.dtype)
        if lse_ref is not None:
            # pack the (q_blk, 1) residual as (q_blk/128, 128) rows
            lrows = pl.ds(qi * (q_blk // _LANES), q_blk // _LANES)
            lse_ref[0, lrows, :] = _col_to_rows(lse2)
        if rate > 0.0:
            mult = _keep_mult(rate, seed_ref, qi, q_blk, n, v.dtype)
            inv = np.float32(1.0 / (1.0 - rate))
            p = (p.astype(jnp.float32) * inv).astype(v.dtype) * mult
        o_ref[0, rows, :] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return carry

    # fori_loop (not an unrolled Python loop): Mosaic otherwise keeps every
    # iteration's (q_blk, N) f32 temporaries live at once -> scoped-VMEM OOM.
    jax.lax.fori_loop(0, n // q_blk, body, 0)


def _specs(bh, n, d):
    row = pl.BlockSpec((1, n, d), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0),
                        memory_space=pltpu.SMEM)
    return row, seed


def _cp(n, d, q_blk, n_blocks):
    """Mosaic scoped-VMEM limit for the attention kernels.

    The 16 MiB default trips once the program is big enough that Mosaic's
    scheduler keeps more temporaries live (observed: the backward at
    bh=128, n=2048 wants 16.59 MiB — the round-2 "B=16 JaxRuntimeError").
    Estimate: double-buffered (1, n, d) blocks + two f32 (n, d) carries +
    the (q_blk, n) probability/mask f32 tiles; +25% headroom, floor at the
    16 MiB default, cap well under the 128 MiB physical VMEM."""
    est = (n_blocks * 2 * n * d * 2      # bf16 in/out blocks, double-buffered
           + 2 * n * d * 4               # dk/dv f32 carries
           + 4 * q_blk * n * 4)          # p/ds/mask tiles
    # Generous headroom: measured stack wants at bh=256/n=2048 were 17.6M
    # (lse bwd) and 18.8M (recompute bwd) against a 14.2M raw estimate —
    # Mosaic's scheduler keeps more temporaries live than the hand count.
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(max(est * 3 // 2 + 8 * 2 ** 20,
                                     16 * 2 ** 20),
                                 100 * 2 ** 20))
    )


def _fused_fwd(q, k, v, seed, scale, rate):
    """Returns (o, lse2) — lse2 is None for shapes the packed residual
    can't represent (backward falls back to full softmax recompute)."""
    bh, n, d = q.shape
    q_blk = _q_blk(n)
    row, seed_spec = _specs(bh, n, d)
    kern = functools.partial(_fwd_kernel, float(scale), float(rate), q_blk)
    if _use_lse(n, q_blk):
        lrow = pl.BlockSpec((1, n // _LANES, _LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        o, lse = pl.pallas_call(
            kern,
            grid=(bh,),
            in_specs=[row, row, row, seed_spec],
            out_specs=[row, lrow],
            out_shape=[jax.ShapeDtypeStruct((bh, n, d), q.dtype),
                       jax.ShapeDtypeStruct((bh, n // _LANES, _LANES),
                                            jnp.float32)],
            interpret=_interpret(),
            compiler_params=_cp(n, d, q_blk, 5),
        )(q, k, v, seed)
        return o, lse
    o = pl.pallas_call(
        lambda *refs: kern(*refs, None),
        grid=(bh,),
        in_specs=[row, row, row, seed_spec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=_interpret(),
        compiler_params=_cp(n, d, q_blk, 4),
    )(q, k, v, seed)
    return o, None


# --------------------------------------------------------------- backward


def _bwd_kernel(scale, rate, q_blk, use_lse, q_ref, k_ref, v_ref, do_ref,
                o_ref, lse_ref, seed_ref, dq_ref, dk_ref, dv_ref):
    """One walk over query blocks producing ALL THREE gradients: dq is
    written per block, dk/dv accumulate in f32 carries. A single kernel
    (vs the earlier separate dq and dkv passes) recomputes the softmax
    rows and dp ONCE per block instead of twice — the dominant backward
    matmuls — and loads q/k/v/do/o from HBM once. With the forward's
    packed lse residual, p recomputes in ONE fma+exp2 pass (the max/sum
    lane reductions are skipped); the score scale folds into the dq
    operand (k*scale, computed once per row) and a final dk scale."""
    k, v = k_ref[0], v_ref[0]
    n, d = k.shape
    c = np.float32(scale * _LOG2E)
    ks = (k.astype(jnp.float32) * np.float32(scale)).astype(k.dtype)

    def body(qi, carry):
        dk, dv = carry
        rows = pl.ds(qi * q_blk, q_blk)
        q, do = q_ref[0, rows, :], do_ref[0, rows, :]
        if use_lse:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lrows = pl.ds(qi * (q_blk // _LANES), q_blk // _LANES)
            lse2 = _rows_to_col(lse_ref[0, lrows, :])
            p = jnp.exp2(s * c - lse2)  # bitwise == forward's p
        else:
            p, _ = _softmax_rows(q, k, scale)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # delta_i = sum_d do_id o_id == sum_m (dropped dp)_im p_im
        delta = (do.astype(jnp.float32)
                 * o_ref[0, rows, :].astype(jnp.float32)).sum(
            axis=-1, keepdims=True
        )
        # p in the value dtype from here on: the forward itself rounds p
        # for the PV matmul, so bf16 p is the *consistent* operand for
        # dv/ds — and it halves two (q_blk, N) residencies, which is what
        # lets q_blk=256 fit scoped VMEM alongside the dropout mask.
        p = p.astype(v.dtype)
        if rate > 0.0:
            # regenerate exactly the forward's {0,1} multiplier for block
            # qi; the masked products are bitwise equal to the forward's
            # (multiply by exact 0/1), elementwise-fused so no extra f32
            # array materializes
            mult = _keep_mult(rate, seed_ref, qi, q_blk, n, v.dtype)
            inv = np.float32(1.0 / (1.0 - rate))
            p_drop = (p.astype(jnp.float32) * inv).astype(v.dtype) * mult
            dp = dp * inv * mult.astype(jnp.float32)
        else:
            p_drop = p
        ds = p.astype(jnp.float32) * (dp - delta)  # scale folded into ks/dk
        dq_ref[0, rows, :] = jnp.dot(
            ds.astype(k.dtype), ks, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dv = dv + jax.lax.dot_general(
            p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, n // q_blk, body,
        (jnp.zeros((n, d), jnp.float32), jnp.zeros((n, d), jnp.float32)),
    )
    dk_ref[0] = (dk * np.float32(scale)).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fused_bwd_impl(q, k, v, o, lse, seed, g, scale, rate):
    bh, n, d = q.shape
    q_blk = _q_blk(n)
    row, seed_spec = _specs(bh, n, d)
    use_lse = lse is not None
    kern = functools.partial(
        _bwd_kernel, float(scale), float(rate), q_blk, use_lse
    )
    if use_lse:
        lrow = pl.BlockSpec((1, n // _LANES, _LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        ins = [row, row, row, row, row, lrow, seed_spec]
        operands = (q, k, v, g, o, lse, seed)
        body = kern
    else:
        ins = [row, row, row, row, row, seed_spec]
        operands = (q, k, v, g, o, seed)

        def body(q_r, k_r, v_r, do_r, o_r, seed_r, dq_r, dk_r, dv_r):
            return kern(q_r, k_r, v_r, do_r, o_r, None, seed_r,
                        dq_r, dk_r, dv_r)

    dq, dk, dv = pl.pallas_call(
        body,
        grid=(bh,),
        in_specs=ins,
        out_specs=[row, row, row],
        out_shape=[jax.ShapeDtypeStruct((bh, n, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, n, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, n, d), v.dtype)],
        interpret=_interpret(),
        compiler_params=_cp(n, d, q_blk, 9),
    )(*operands)
    return dq, dk, dv


# -------------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(q, k, v, seed, scale, rate):
    return _fused_fwd(q, k, v, seed, scale, rate)[0]


def _fused_vjp_fwd(q, k, v, seed, scale, rate):
    out, lse = _fused_fwd(q, k, v, seed, scale, rate)
    return out, (q, k, v, out, lse, seed)


def _fused_vjp_bwd(scale, rate, res, g):
    q, k, v, o, lse, seed = res
    dq, dk, dv = _fused_bwd_impl(q, k, v, o, lse, seed, g, scale, rate)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_attention(q, k, v, scale, dropout_rate=0.0, rng=None):
    """(B, H, N, D) fused attention with optional probability dropout.

    ``rng`` (a PRNG key) is required when ``dropout_rate > 0``. Falls back
    to the XLA composition off-TPU (different dropout bitstream, same
    distribution).
    """
    b, h, n, d = q.shape
    rate = float(dropout_rate) if rng is not None else 0.0
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if (not on_tpu and not INTERPRET) or not _mix_collision_free(n):
        return attention_xla(q, k, v, scale, rate, rng)
    bh = b * h
    if rate > 0.0:
        w = jax.random.bits(rng, (2,), jnp.uint32)
    else:
        w = jnp.zeros((2,), jnp.uint32)
    # Per-(batch*head) seed rows: the row coordinate is mixed HERE, not via
    # pl.program_id (see module docstring: vmap renumbers program ids).
    seed = jnp.stack(
        [jnp.broadcast_to(w[0], (bh,)),
         w[1] + jnp.arange(bh, dtype=jnp.uint32) * _ROW_MIX],
        axis=-1,
    ).reshape(bh, 1, 2)
    flat = lambda t: t.reshape(bh, n, d)
    # Under a device mesh (ops/meshctx.py) the kernel declares its own
    # batch-sharded partitioning. The seed rows are computed BEFORE the
    # island from the absolute (batch*head) index, so the dropout
    # bitstream is identical sharded and unsharded.
    from corrifnet_tpu.ops.meshctx import island

    fused = island(
        lambda qf, kf, vf, s: _fused(qf, kf, vf, s, float(scale), rate),
        (0, 0, 0, 0), 0,
    )
    out = fused(flat(q), flat(k), flat(v), seed)
    return out.reshape(b, h, n, d)
