"""Correlation-fusion op: XLA path vs NumPy oracle of the reference math,
plus Pallas kernel (interpreter mode on CPU) vs the XLA path.

The NumPy oracle reproduces inter_attn (mmvit4.py:481-491) at batch size 1,
where the reference's flatten/view round-trip is faithful (see
ops/correlation.py docstring for the B>1 scrambling analysis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import corrifnet_tpu.ops.correlation as corr_mod
from corrifnet_tpu.ops import correlation_fusion, correlation_fusion_xla


def np_reference_inter_attn(q_m, ks, vs):
    """Direct NumPy port of inter_attn at B=1 (mmvit4.py:481-487):
    scores -> concat flattened rows -> softmax over dim 0 / sqrt(3) ->
    view back -> weighted sum of values."""
    scores = [q_m * k for k in ks]
    concat = np.stack([s.reshape(-1) for s in scores], axis=0)  # (3, L)
    z = concat / np.sqrt(len(ks))
    z = z - z.max(axis=0, keepdims=True)
    e = np.exp(z)
    attn = e / e.sum(axis=0, keepdims=True)
    attn = attn.reshape(len(ks), *q_m.shape)
    return sum(attn[i] * v for i, v in enumerate(vs))


def test_xla_path_matches_reference_oracle_b1():
    rng = np.random.default_rng(0)
    shape = (3, 1, 64, 32)  # (modality, B=1, N, C)
    q, k, v = (rng.normal(0, 1, shape).astype(np.float32) for _ in range(3))
    got = np.asarray(correlation_fusion_xla(*map(jnp.asarray, (q, k, v))))
    for m in range(3):
        want = np_reference_inter_attn(
            q[m, 0], [k[i, 0] for i in range(3)], [v[i, 0] for i in range(3)]
        )
        np.testing.assert_allclose(got[m, 0], want, atol=1e-5)


def test_xla_path_is_batch_independent():
    """out[:, b] must only depend on inputs at batch b (unlike the
    reference's B>1 scrambled view)."""
    rng = np.random.default_rng(1)
    shape = (3, 4, 16, 8)
    q, k, v = (rng.normal(0, 1, shape).astype(np.float32) for _ in range(3))
    full = np.asarray(correlation_fusion_xla(*map(jnp.asarray, (q, k, v))))
    solo = np.asarray(
        correlation_fusion_xla(
            jnp.asarray(q[:, 2:3]), jnp.asarray(k[:, 2:3]), jnp.asarray(v[:, 2:3])
        )
    )
    np.testing.assert_allclose(full[:, 2:3], solo, atol=1e-6)


def test_pallas_kernel_interpret_matches_xla():
    rng = np.random.default_rng(2)
    shape = (3, 2, 16, 128)
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)) for _ in range(3)
    )
    corr_mod.INTERPRET = True
    try:
        got = correlation_fusion(q, k, v, use_pallas=True, block_rows=8)
    finally:
        corr_mod.INTERPRET = False
    want = correlation_fusion_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_kernel_interpret_grads_match_xla():
    rng = np.random.default_rng(3)
    shape = (3, 1, 8, 128)
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)) for _ in range(3)
    )

    def loss_pallas(q, k, v):
        return (correlation_fusion(q, k, v, True, block_rows=8) ** 2).sum()

    def loss_xla(q, k, v):
        return (correlation_fusion_xla(q, k, v) ** 2).sum()

    corr_mod.INTERPRET = True
    try:
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    finally:
        corr_mod.INTERPRET = False
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
