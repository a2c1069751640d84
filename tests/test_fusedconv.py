"""Fused conv+BN-stats kernels (ops/fusedconv.py): interpret-mode Pallas
vs the XLA reference composition, and the hand-written VJPs vs autodiff
of the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.ops import fusedconv as fc


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fc, "INTERPRET", True)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


# ---------------------------------------------------------------- pointwise


@pytest.mark.parametrize("n,ci,co", [(1024, 192, 768), (700, 64, 256), (48, 33, 40)])
@pytest.mark.parametrize("prologue", [False, True])
def test_pointwise_matches_xla(n, ci, co, prologue):
    x = _rand(0, (n, ci))
    w = _rand(1, (ci, co)) * 0.1
    a = jnp.abs(_rand(2, (ci,))) + 0.5 if prologue else None
    b = _rand(3, (ci,)) * 0.3 if prologue else None
    y, s, q = fc.pointwise_conv_stats(x, w, a, b)
    yr, sr, qr = fc.pointwise_conv_stats_xla(x, w, a, b)
    np.testing.assert_allclose(y, yr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s, sr, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(q, qr, rtol=1e-4, atol=1e-2)


def test_pointwise_leading_shape_and_bf16():
    x = _rand(0, (4, 3, 16, 16, 64), jnp.bfloat16)
    w = _rand(1, (64, 128), jnp.bfloat16) * 0.1
    y, s, q = fc.pointwise_conv_stats(x, w)
    assert y.shape == (4, 3, 16, 16, 128) and y.dtype == jnp.bfloat16
    yr, sr, qr = fc.pointwise_conv_stats_xla(x.reshape(-1, 64), w)
    np.testing.assert_allclose(
        y.reshape(-1, 128).astype(np.float32), yr.astype(np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(s, sr, rtol=2e-2, atol=2.0)


@pytest.mark.parametrize("prologue", [False, True])
def test_pointwise_grad_matches_reference_autodiff(prologue):
    n, ci, co = 260, 48, 96
    x = _rand(0, (n, ci))
    w = _rand(1, (ci, co)) * 0.1
    a = jnp.abs(_rand(2, (ci,))) + 0.5
    b = _rand(3, (ci,)) * 0.3

    def scal(fn):
        def f(x, w, a, b):
            y, s, q = fn(x, w, a if prologue else None, b if prologue else None)
            # exercise all three cotangents with distinct weights
            return (y * 0.7).sum() + (s * jnp.arange(co)).sum() * 1e-2 + (
                q * 0.3
            ).sum() * 1e-3
        return f

    g_fused = jax.grad(scal(fc.pointwise_conv_stats), argnums=(0, 1, 2, 3))(
        x, w, a, b
    )
    g_ref = jax.grad(scal(fc.pointwise_conv_stats_xla), argnums=(0, 1, 2, 3))(
        x, w, a, b
    )
    names = ["dx", "dw", "da", "db"]
    for i, (gf, gr) in enumerate(zip(g_fused, g_ref)):
        if not prologue and i >= 2:
            continue  # dummy a/b: reference autodiff sees no dependence
        np.testing.assert_allclose(
            gf, gr, rtol=1e-4, atol=1e-4, err_msg=names[i]
        )


# ------------------------------------------------------------------- 3x3


@pytest.mark.parametrize("bt,h,w,ci,co", [(5, 12, 12, 32, 48), (2, 7, 9, 16, 16)])
def test_conv3x3_matches_xla(bt, h, w, ci, co):
    x = _rand(0, (bt, h, w, ci))
    wk = _rand(1, (3, 3, ci, co)) * 0.1
    a = jnp.abs(_rand(2, (ci,))) + 0.5
    b = _rand(3, (ci,)) * 0.3
    y, s, q = fc.conv3x3_fma_relu_stats(x, wk, a, b)
    yr, sr, qr = fc.conv3x3_fma_relu_stats_xla(x, wk, a, b)
    np.testing.assert_allclose(y, yr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s, sr, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(q, qr, rtol=1e-4, atol=1e-2)


def test_conv3x3_partial_image_group():
    # batch not a multiple of the images-per-program pick
    bt, h, w, ci, co = 3, 10, 10, 24, 24
    x = _rand(0, (bt, h, w, ci))
    wk = _rand(1, (3, 3, ci, co)) * 0.1
    a = jnp.ones((ci,), jnp.float32)
    b = jnp.zeros((ci,), jnp.float32)
    y, s, q = fc.conv3x3_fma_relu_stats(x, wk, a, b)
    yr, sr, qr = fc.conv3x3_fma_relu_stats_xla(x, wk, a, b)
    np.testing.assert_allclose(y, yr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s, sr, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(q, qr, rtol=1e-4, atol=1e-2)


def test_conv3x3_grad_matches_reference_autodiff():
    bt, h, w, ci, co = 3, 9, 9, 16, 24
    x = _rand(0, (bt, h, w, ci))
    wk = _rand(1, (3, 3, ci, co)) * 0.1
    a = jnp.abs(_rand(2, (ci,))) + 0.5
    b = _rand(3, (ci,)) * 0.3

    def scal(fn):
        def f(x, wk, a, b):
            y, s, q = fn(x, wk, a, b)
            return (y * 0.7).sum() + (s * jnp.arange(co)).sum() * 1e-2 + (
                q * 0.3
            ).sum() * 1e-3
        return f

    g_fused = jax.grad(scal(fc.conv3x3_fma_relu_stats), argnums=(0, 1, 2, 3))(
        x, wk, a, b
    )
    g_ref = jax.grad(scal(fc.conv3x3_fma_relu_stats_xla), argnums=(0, 1, 2, 3))(
        x, wk, a, b
    )
    for name, gf, gr in zip(["dx", "dw", "da", "db"], g_fused, g_ref):
        np.testing.assert_allclose(gf, gr, rtol=1e-4, atol=1e-4, err_msg=name)


def test_vmap_pointwise():
    # layers 2-4 run per-modality under vmap; the kernel must batch
    m, n, ci, co = 3, 130, 32, 64
    x = _rand(0, (m, n, ci))
    w = _rand(1, (m, ci, co)) * 0.1
    y, s, q = jax.vmap(lambda xx, ww: fc.pointwise_conv_stats(xx, ww))(x, w)
    for j in range(m):
        yr, sr, qr = fc.pointwise_conv_stats_xla(x[j], w[j])
        np.testing.assert_allclose(y[j], yr, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s[j], sr, rtol=1e-4, atol=1e-3)


def test_fused_kernels_under_scan_vmap():
    """The encoder composition — fnn.scan over bottleneck bodies, under
    jax.vmap — differentiates through the Pallas kernels (interpret
    mode) and matches the standard Conv+BatchNorm tail's grads.

    remat is OFF here: the Pallas INTERPRETER's io-callback effect can't
    partial-eval under jax.checkpoint (compiled Pallas on TPU has no such
    effect — the remat composition is covered by the model-level grad
    equivalence on the XLA path, tests/test_pallas_block.py)."""
    from corrifnet_tpu.models.resnet3d import _BottleneckTail

    width, m = 4, 1
    in_ch = width * 4
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 3, 8, 8, in_ch))

    def build(fused):
        return _BottleneckTail(width=width, n=2, train=True,
                               remat_mode="none", pallas_fused=fused)

    v = jax.vmap(
        lambda xx: build(False).init({"params": jax.random.PRNGKey(1)}, xx)
    )(x)

    def loss(fused):
        mod = build(fused)

        def f(params, xx):
            y, _ = jax.vmap(
                lambda vv, bs, xi: mod.apply(
                    {"params": vv, "batch_stats": bs}, xi,
                    mutable=["batch_stats"],
                )
            )(params, v["batch_stats"], xx)
            return (y[0].astype(jnp.float32) ** 2).mean()
        return f

    l0, g0 = jax.value_and_grad(loss(False))(v["params"], x)
    l1, g1 = jax.value_and_grad(loss(True))(v["params"], x)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4, err_msg=str(p))
