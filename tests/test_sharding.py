"""Multi-device sharding tests on the 8-virtual-CPU-device mesh:
dp+tp-sharded training step must match the unsharded step bitwise-closely.
Uses a tiny attention model so compile stays cheap on constrained CI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as fnn
from jax.sharding import PartitionSpec as P

from corrifnet_tpu.nn import Dense, LayerNorm
from corrifnet_tpu.parallel import (
    make_mesh,
    param_partition_spec,
    put_batch,
    shard_state,
)
from corrifnet_tpu.train import init_state, make_optimizer, make_train_step


class TinyAttn(fnn.Module):
    """Mini model with qkv/proj/fc1/fc2 params exercising the TP rules."""

    dim: int = 16

    @fnn.compact
    def __call__(self, x, train: bool = True):
        b, m, c, h, w = x.shape
        tokens = x.reshape(b, m * c, h * w).transpose(0, 2, 1)
        tokens = Dense(self.dim, name="embed")(tokens)
        y = LayerNorm(name="ln")(tokens)
        qkv = Dense(self.dim * 3, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = jax.nn.softmax(q @ k.transpose(0, 2, 1) / self.dim ** 0.5, axis=-1)
        y = tokens + Dense(self.dim, name="proj")(a @ v)
        y = y + Dense(self.dim, name="fc2")(jax.nn.relu(Dense(self.dim * 2, name="fc1")(y)))
        out = Dense(3, name="head")(y)
        out = jax.nn.sigmoid(out.transpose(0, 2, 1).reshape(b, 3, h, w))
        return out[:, :, None, :, :]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (8, 3, 3, 8, 8)).astype(np.float32))
    masks = jnp.asarray((rng.random((8, 3, 1, 8, 8)) > 0.5).astype(np.float32))
    valid = jnp.ones((8,), jnp.float32)
    return images, masks, valid


def test_mesh_has_8_devices():
    mesh = make_mesh((4, 2))
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_partition_rules():
    k = jnp.zeros((16, 48))
    assert param_partition_spec("model/qkv/kernel", k) == P(None, "model")
    assert param_partition_spec("model/proj/kernel", k) == P("model", None)
    assert param_partition_spec("model/fc1/kernel", k) == P(None, "model")
    assert param_partition_spec("model/fc2/kernel", k) == P("model", None)
    assert param_partition_spec("model/embed/kernel", k) == P()
    assert param_partition_spec("model/qkv/bias", jnp.zeros((48,))) == P()
    # vmapped stacked kernels keep the last-two-axes rule
    assert param_partition_spec("enc/qkv/kernel", jnp.zeros((3, 16, 48))) == P(
        None, None, "model"
    )


def test_sharded_train_step_matches_unsharded(data):
    images, masks, valid = data
    model = TinyAttn()
    optimizer = make_optimizer("Adam")
    rng = jax.random.PRNGKey(0)

    ref_state = init_state(model, rng, images, optimizer)
    step = make_train_step(model, optimizer)
    ref_state2, ref_metrics = step(
        ref_state, images, masks, valid, 1e-3, jax.random.PRNGKey(1)
    )

    mesh = make_mesh((4, 2))
    sh_state = init_state(model, rng, images, optimizer)
    sh_state = shard_state(sh_state, mesh)
    s_images, s_masks, s_valid = put_batch(mesh, images, masks, valid)
    step2 = make_train_step(model, optimizer)
    sh_state2, sh_metrics = step2(
        sh_state, s_images, s_masks, s_valid, 1e-3, jax.random.PRNGKey(1)
    )

    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(sh_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(ref_metrics["jaccard"]), float(sh_metrics["jaccard"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state2.params), jax.tree.leaves(sh_state2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # qkv kernel actually sharded over the model axis
    qkv = sh_state2.params["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec) or qkv.sharding.is_fully_replicated is False


@pytest.mark.parametrize("flag", ["fuse_expand_bn", "pallas_fused"])
def test_fused_bn_conv_matches_under_data_sharding(flag):
    """The fused-BN paths reduce batch statistics over the BATCH axis —
    under a data-sharded batch XLA must turn those contractions into
    psums, giving the same GLOBAL batch statistics as the unsharded step
    (matching BatchNorm's cross-device stats semantics). Covers both the
    Gram-folded path (fuse_expand_bn) and the fused-kernel path
    (pallas_fused — its XLA composition off-TPU, including the
    hand-written VJP's partitioning)."""
    from jax.sharding import NamedSharding

    from corrifnet_tpu.models.resnet3d import Bottleneck3D

    model = Bottleneck3D(width=8, stride=1, has_downsample=True,
                         **{flag: True})
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (8, 3, 4, 4, 8)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, True)

    def loss(params, xx):
        out, mut = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            xx, True, mutable=["batch_stats"],
        )
        return (out.astype(jnp.float32) ** 2).mean(), mut["batch_stats"]

    g = jax.jit(jax.value_and_grad(loss, has_aux=True))
    (ref_l, ref_bs), ref_g = g(v["params"], x)

    mesh = make_mesh((8, 1))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    (sh_l, sh_bs), sh_g = g(v["params"], xs)

    np.testing.assert_allclose(float(ref_l), float(sh_l), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_bs), jax.tree.leaves(sh_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(sh_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
