"""Packed modality-in-channels stage 1 (models/resnet3d.py PackedStage1).

The packed form must be numerically equivalent to the per-modality vmapped
encoder stage 1 with the SAME weights: cross-modality kernel entries are
exact zeros, so only f32 reassociation (conv/BN reduction order) may
differ. Verified at stage-1 level against a vmapped reference built from
the encoder's own submodules, and at full-model level through the
pack_stage1_variables tree converter (reference parity anchor:
mmvit4.py:441-460 — the three independent encoders).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as fnn

from corrifnet_tpu.models.mmvit4 import MMVit4
from corrifnet_tpu.models.resnet3d import (
    Bottleneck3D,
    PackedStage1,
    ResNet3DEncoder,
    _BottleneckTail,
    pack_stage1_variables,
)
from corrifnet_tpu.nn import BatchNorm, Conv, max_pool
from corrifnet_tpu.nn import init as tinit


class _Stage1Ref(fnn.Module):
    """The encoder's stem+layer1, verbatim submodule names (vmapped ref)."""

    @fnn.compact
    def __call__(self, x, train=True):
        y = Conv(
            64, (3, 7, 7), strides=(1, 2, 2), padding=(1, 3, 3),
            use_bias=False, kernel_init=tinit.kaiming_normal,
            name="stem_conv",
        )(x)
        y = jax.nn.relu(y)
        y = BatchNorm(name="stem_bn")(y, use_running_average=not train)
        x1 = max_pool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        y = Bottleneck3D(
            width=64, stride=1, has_downsample=True, name="layer1_block0"
        )(x1, train)
        y = _BottleneckTail(width=64, n=2, train=train, name="layer1_tail")(y)
        return x1, y


def _vmapped_ref():
    return fnn.vmap(
        _Stage1Ref,
        in_axes=(0, None),
        out_axes=0,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
    )()


@pytest.mark.parametrize("train", [True, False])
def test_stage1_packed_matches_vmapped(train):
    M, B = 3, 2
    x = jax.random.normal(jax.random.PRNGKey(1), (M, B, 3, 48, 48, 1))
    ref = _vmapped_ref()
    v = ref.init({"params": jax.random.PRNGKey(0)}, x, True)
    (x1r, yr), _ = ref.apply(v, x, train, mutable=["batch_stats"])

    conv = pack_stage1_variables(
        {"params": {"encoders": v["params"]},
         "batch_stats": {"encoders": v["batch_stats"]}}
    )
    vp = {"params": conv["params"]["packed_stage1"],
          "batch_stats": conv["batch_stats"]["packed_stage1"]}
    xp = jnp.moveaxis(x[..., 0], 0, -1)  # (B, D, H, W, M)
    (x1p, yp), mut = PackedStage1(modalities=3).apply(
        vp, xp, train, mutable=["batch_stats"]
    )

    def unpack(t, c):
        b, d, h, w, mc = t.shape
        return jnp.moveaxis(t.reshape(b, d, h, w, M, c), 4, 0)

    np.testing.assert_allclose(
        np.asarray(unpack(x1p, 64)), np.asarray(x1r), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(unpack(yp, 256)), np.asarray(yr), atol=2e-4, rtol=1e-4
    )

    if train:
        # running BN stats advance identically (packed stats are the
        # per-modality stats laid out modality-major)
        ref_stem = np.asarray(v["batch_stats"]["stem_bn"]["mean"])  # pre
        got = np.asarray(mut["batch_stats"]["stem_bn"]["mean"]).reshape(M, 64)
        want = np.asarray(
            ref.apply(v, x, True, mutable=["batch_stats"])[1]["batch_stats"][
                "stem_bn"]["mean"]
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        assert not np.allclose(got, ref_stem)  # actually updated


def test_full_model_pack_conversion_equivalence():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 64, 64))
    m_off = MMVit4(pack_stage1=False)
    m_on = MMVit4(pack_stage1=True)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(2)}
    v_off = m_off.init(rngs, x, False)
    v_on = pack_stage1_variables(v_off)

    # tree structure identical to a fresh pack-on init
    shapes = lambda t: jax.tree.map(lambda a: a.shape, t)
    fresh = jax.eval_shape(lambda: m_on.init(rngs, x, False))
    assert jax.tree_util.tree_structure(shapes(v_on)) == (
        jax.tree_util.tree_structure(shapes(fresh))
    )
    bad = jax.tree.leaves(
        jax.tree.map(lambda a, b: a.shape != b.shape, v_on, fresh)
    )
    assert not any(bad)

    y_off = m_off.apply(v_off, x, False)
    y_on = m_on.apply(v_on, x, False)
    np.testing.assert_allclose(
        np.asarray(y_on), np.asarray(y_off), atol=5e-3, rtol=1e-3
    )


def test_grads_flow_through_packed_params():
    xp = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32, 3))
    model = PackedStage1(modalities=3)
    v = model.init({"params": jax.random.PRNGKey(0)}, xp, True)

    def loss(p):
        (x1, y), _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, xp, True,
            mutable=["batch_stats"],
        )
        return (y.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all(), path
    nonzero = [float(np.abs(np.asarray(l)).max()) for _, l in leaves]
    assert all(nz > 0 for nz in nonzero), nonzero


def test_packed_conv_bias_matches_separate_convs():
    """Conv(modalities=M) with bias == M independent Convs with the same
    per-stream params (the stage-1 convs are bias-free; this covers the
    general path)."""
    from corrifnet_tpu.nn import Conv

    M, ci, co = 3, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 10, M * ci))
    packed = Conv(M * co, 3, padding=1, modalities=M)
    v = packed.init(jax.random.PRNGKey(1), x)
    y = packed.apply(v, x)
    assert y.shape == (2, 10, 10, M * co)

    single = Conv(co, 3, padding=1)
    for mi in range(M):
        vs = {"params": {
            "kernel": v["params"]["kernel"][mi],
            "bias": v["params"]["bias"][mi],
        }}
        ym = single.apply(vs, x[..., mi * ci:(mi + 1) * ci])
        np.testing.assert_allclose(
            np.asarray(y[..., mi * co:(mi + 1) * co]), np.asarray(ym),
            atol=1e-5, rtol=1e-5,
        )


def test_default_dropout_key_env_override(monkeypatch):
    from corrifnet_tpu.train import default_dropout_key

    monkeypatch.setenv("CORRIFNET_RNG_IMPL", "threefry2x32")
    k = default_dropout_key(7)
    assert str(jax.random.key_impl(k)) == "threefry2x32"
    monkeypatch.setenv("CORRIFNET_RNG_IMPL", "rbg")
    k2 = default_dropout_key(7)
    assert str(jax.random.key_impl(k2)) == "rbg"
    # keys are usable by the flax dropout machinery
    jax.random.bernoulli(jax.random.fold_in(k2, 3), 0.5, (4, 4))
