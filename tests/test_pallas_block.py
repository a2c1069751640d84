"""Bottleneck3D(pallas_fused=True) vs the standard Conv+BatchNorm path:
identical parameter/stat pytrees, matching outputs, running stats, and
gradients (f32; the kernels themselves are covered by test_fusedconv.py —
off-TPU this exercises the XLA composition through the same code path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.models.resnet3d import Bottleneck3D


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(va, vb, err_msg=str(pa))


@pytest.mark.parametrize(
    "stride,down,m",
    [(1, False, 1), (1, True, 1), (2, True, 1), (1, True, 3)],
)
def test_fused_block_matches_standard(stride, down, m):
    width = 8
    in_ch = (width * 4 if not down else width * 2) * m
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 12, 12, in_ch))
    rng = jax.random.PRNGKey(1)

    std = Bottleneck3D(width=width, stride=stride, has_downsample=down,
                       modalities=m)
    fus = Bottleneck3D(width=width, stride=stride, has_downsample=down,
                       modalities=m, pallas_fused=True)

    v_std = std.init({"params": rng}, x, True)
    v_fus = fus.init({"params": rng}, x, True)
    _trees_equal(v_std, v_fus)  # bitwise: params AND batch_stats

    def run(mod, v):
        y, mut = mod.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            x, True, mutable=["batch_stats"],
        )
        return y, mut["batch_stats"]

    y_s, bs_s = run(std, v_std)
    y_f, bs_f = run(fus, v_std)
    np.testing.assert_allclose(y_f, y_s, rtol=1e-4, atol=1e-4)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(bs_s),
        jax.tree_util.tree_leaves_with_path(bs_f),
    ):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5, err_msg=str(p))

    # eval mode uses running averages through the same prologue/fold path
    e_s = std.apply(v_std, x, False)
    e_f = fus.apply(v_std, x, False)
    np.testing.assert_allclose(e_f, e_s, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m", [1, 3])
def test_fused_block_grads_match_standard(m):
    width = 8
    in_ch = width * 2 * m
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 10, 10, in_ch))
    rng = jax.random.PRNGKey(1)
    std = Bottleneck3D(width=width, stride=1, has_downsample=True,
                       modalities=m)
    fus = Bottleneck3D(width=width, stride=1, has_downsample=True,
                       modalities=m, pallas_fused=True)
    v = std.init({"params": rng}, x, True)

    def loss(mod):
        def f(params, x):
            y, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()
        return f

    gp_s, gx_s = jax.grad(loss(std), argnums=(0, 1))(v["params"], x)
    gp_f, gx_f = jax.grad(loss(fus), argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(gx_f, gx_s, rtol=1e-4, atol=1e-4)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gp_s),
        jax.tree_util.tree_leaves_with_path(gp_f),
    ):
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=1e-4, err_msg=str(p)
        )


def test_fused_block_bf16_stride2_grad_traces():
    """Regression: the stride-2 XLA-fallback conv used
    preferred_element_type=f32, whose transpose rule feeds the f32
    cotangent into a conv with the bf16 kernel — bf16 autodiff through a
    stride-2 fused block raised TypeError at trace time (would have burned
    a TPU measurement session)."""
    width = 8
    m = 1
    in_ch = width * 2 * m
    x = jax.random.normal(
        jax.random.PRNGKey(0), (1, 2, 8, 8, in_ch)
    ).astype(jnp.bfloat16)
    fus = Bottleneck3D(width=width, stride=2, has_downsample=True,
                       modalities=m, pallas_fused=True, dtype=jnp.bfloat16)
    v = fus.init({"params": jax.random.PRNGKey(1)}, x, True)

    def f(params, x):
        y, _ = fus.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, True, mutable=["batch_stats"],
        )
        return y.astype(jnp.float32).sum()

    gp, gx = jax.grad(f, argnums=(0, 1))(v["params"], x)
    assert gx.dtype == jnp.bfloat16
    assert all(
        bool(jnp.all(jnp.isfinite(l.astype(jnp.float32))))
        for l in jax.tree_util.tree_leaves(gp)
    )


def test_mmvit4_pallas_fused_model_level():
    from corrifnet_tpu.models.mmvit4 import MMVit4

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 3, 64, 64))
    rng = {"params": jax.random.PRNGKey(0)}
    base = MMVit4(use_pallas=False)
    fused = MMVit4(use_pallas=False, pallas_fused_blocks=True)
    v = base.init(rng, x, False)
    v2 = fused.init(rng, x, False)
    _trees_equal(v, v2)
    # Algebraic identity was verified in f64 (eval-mode outputs agree
    # BITWISE; train mode to 1e-15 once BN stat rounding is equalized).
    # In f32, low-bit reassociation noise gets amplified by the
    # EarlyFusionBlock InstanceNorms at init (near-constant channels:
    # rsqrt(var+eps) scales tiny diffs to percent level), so the
    # model-level f32 comparison is necessarily loose — the tight
    # guarantees live in the block-level tests above.
    y0 = base.apply(v, x, False)
    y1 = fused.apply(v, x, False)
    np.testing.assert_allclose(y1, y0, rtol=2e-2, atol=2e-2)
    # train mode adds the BN stat-rounding-point difference (f32
    # accumulator sums vs f32-cast outputs; f64 floor ~1e-6/block)
    rngs = {"dropout": jax.random.PRNGKey(3)}
    t0, _ = base.apply(v, x, True, mutable=["batch_stats"], rngs=rngs)
    t1, _ = fused.apply(v, x, True, mutable=["batch_stats"], rngs=rngs)
    np.testing.assert_allclose(t1, t0, rtol=2e-2, atol=2e-2)
