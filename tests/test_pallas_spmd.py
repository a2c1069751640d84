"""SPMD safety of the Pallas kernels (round-2 verdict #8).

The multichip dryrun exercises the XLA fallbacks (use_pallas=False); these
tests retire part of the remaining risk — ``pallas_call`` under a REAL
data-parallel mesh — by running each kernel call site under ``shard_map``
on the 8-virtual-device CPU mesh in interpret mode and asserting equality
with the unsharded kernel. Batch is the only sharded axis (the framework's
dp design, SURVEY §5.8): every kernel is batch-elementwise, so shard_map
over batch must be exact, not just allclose-after-collectives.

Also covers the jit-partitioner path (sharded inputs into a plain ``jit``
with no shard_map): that is what the model actually does under a mesh.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

import corrifnet_tpu.ops.attention as attn_mod
import corrifnet_tpu.ops.correlation as corr_mod
import corrifnet_tpu.ops.instancenorm as in_mod
from corrifnet_tpu.ops import attention_xla, fused_attention
from corrifnet_tpu.ops.correlation import correlation_fusion
from corrifnet_tpu.ops.instancenorm import relu_instancenorm
from corrifnet_tpu.parallel import make_mesh


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map with check_vma=False: pallas_call out_shapes carry no
    varying-mesh-axes annotation, and vma checking (jax 0.8 default) rejects
    them — the documented requirement for kernel call sites under shard_map."""
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


@pytest.fixture
def interpret(monkeypatch):
    """Force the Pallas kernel path (not the XLA fallback) on CPU."""
    monkeypatch.setattr(attn_mod, "INTERPRET", True)
    monkeypatch.setattr(corr_mod, "INTERPRET", True)
    monkeypatch.setattr(in_mod, "INTERPRET", True)


@pytest.fixture(scope="module")
def mesh():
    m = make_mesh((8, 1))
    if m.devices.size != 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    return m


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))


def test_attention_shard_map_matches_unsharded(interpret, mesh):
    q, k, v = (_rand((8, 2, 64, 128), s) for s in range(3))
    scale = 128 ** -0.5
    want = fused_attention(q, k, v, scale)

    f = _shard_map(
        lambda q, k, v: fused_attention(q, k, v, scale),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )
    got = f(q, k, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and it really took the kernel path, not the fallback
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(attention_xla(q, k, v, scale)), atol=1e-5
    )


def test_attention_shard_map_grads_match(interpret, mesh):
    q, k, v = (_rand((8, 1, 64, 128), s + 5) for s in range(3))
    scale = 0.125

    def loss(q, k, v):
        return (fused_attention(q, k, v, scale) ** 2).sum()

    def loss_sharded(q, k, v):
        f = _shard_map(
            lambda q, k, v: fused_attention(q, k, v, scale),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
        )
        return (f(q, k, v) ** 2).sum()

    want = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_correlation_shard_map_matches_unsharded(interpret, mesh):
    q, k, v = (_rand((3, 8, 64, 128), s + 9) for s in range(3))
    want = correlation_fusion(q, k, v, use_pallas=True)

    f = _shard_map(
        lambda q, k, v: correlation_fusion(q, k, v, use_pallas=True),
        mesh=mesh,
        in_specs=(P(None, "data"),) * 3,
        out_specs=P(None, "data"),
    )
    got = f(q, k, v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_correlation_shard_map_grads_match(interpret, mesh):
    q, k, v = (_rand((3, 8, 64, 128), s + 13) for s in range(3))

    def loss(q, k, v):
        return (correlation_fusion(q, k, v, use_pallas=True) ** 2).sum()

    def loss_sharded(q, k, v):
        f = _shard_map(
            lambda q, k, v: correlation_fusion(q, k, v, use_pallas=True),
            mesh=mesh,
            in_specs=(P(None, "data"),) * 3,
            out_specs=P(None, "data"),
        )
        return (f(q, k, v) ** 2).sum()

    want = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_instancenorm_shard_map_matches_unsharded(interpret, mesh):
    x = _rand((8, 4, 8, 8, 16), 21)
    want = relu_instancenorm(x)
    f = _shard_map(
        relu_instancenorm, mesh=mesh, in_specs=(P("data"),), out_specs=P("data")
    )
    got = f(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class _KernelSoup(nn.Module):
    """Tiny model exercising all three Pallas call sites (attention,
    correlation fusion, relu-instancenorm) through their REAL entry
    points, so the ambient kernel-mesh islands (ops/meshctx.py) are what
    this test drives — not hand-built shard_maps."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, m, c, h, w = x.shape  # (B, 3, C, H, W)
        y = x.transpose(0, 1, 3, 4, 2)  # (B, 3, H, W, C)
        y = nn.Dense(16, name="lift")(y)
        y = relu_instancenorm(y.reshape(b, m * h, w, 16)).reshape(y.shape)
        tok = y.reshape(b, m, h * w, 16)
        q = nn.Dense(16, name="q")(tok)
        k = nn.Dense(16, name="k")(tok)
        v = nn.Dense(16, name="v")(tok)
        fused = correlation_fusion(
            q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
            v.transpose(1, 0, 2, 3), use_pallas=True,
        ).transpose(1, 0, 2, 3)
        a = fused_attention(
            fused.reshape(b, m, h * w, 16), tok, tok, 0.25
        )
        out = nn.Dense(1, name="head")(a)  # (B, 3, H*W, 1)
        out = jax.nn.sigmoid(out).reshape(b, m, 1, h, w)
        return out.astype(jnp.float32)


def test_train_step_kernel_mesh_islands_match_unsharded(monkeypatch, mesh):
    """The REAL train step (jit + GSPMD + donated state) over a
    data-parallel mesh with ``use_pallas=True``: with the ambient
    ``kernel_mesh`` context the Pallas call sites wrap themselves in
    shard_map islands, and one full fwd+bwd+Adam step must match the
    unsharded single-device step (same batch, same rng).

    Interpret is enabled for the correlation/instancenorm kernels only:
    they use the plain Pallas interpreter (lowers to XLA ops — GSPMD-safe).
    The attention kernel's TPU-aware interpreter runs through host
    callbacks whose cross-core barrier can deadlock under a partitioned
    program on the CPU thread pool; its in-jit island path is covered by
    test_attention_jit_partitioner_with_sharded_inputs (one kernel, no
    concurrent callback storm)."""
    monkeypatch.setattr(corr_mod, "INTERPRET", True)
    monkeypatch.setattr(in_mod, "INTERPRET", True)
    from corrifnet_tpu.ops.meshctx import kernel_mesh
    from corrifnet_tpu.parallel import put_batch, shard_state
    from corrifnet_tpu.train import init_state, make_optimizer, make_train_step

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(0, 1, (8, 3, 3, 8, 8)).astype(np.float32))
    masks = jnp.asarray((rng.random((8, 3, 1, 8, 8)) > 0.5).astype(np.float32))
    valid = jnp.ones((8,), jnp.float32)
    model = _KernelSoup()
    optimizer = make_optimizer("Adam")

    ref_state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    ref_step = make_train_step(model, optimizer)
    ref_state, ref_metrics = ref_step(
        ref_state, images, masks, valid, 1e-3, jax.random.PRNGKey(1))

    sh_state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    sh_state = shard_state(sh_state, mesh)
    s_images, s_masks, s_valid = put_batch(mesh, images, masks, valid)
    step = make_train_step(model, optimizer)
    with kernel_mesh(mesh):
        sh_state, sh_metrics = step(
            sh_state, s_images, s_masks, s_valid, 1e-3, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(sh_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5)
    # atol 1e-5 as in test_sharding.py: the dp gradient is a psum of
    # per-shard reductions (reassociated f32), and Adam's rsqrt amplifies
    # the last-ulp difference.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        sh_state.params, ref_state.params)


def test_island_noop_without_context_and_on_indivisible_batch(interpret, mesh):
    """island() returns the raw fn outside a kernel_mesh context, and falls
    back to the unwrapped call when the batch does not divide the data
    axis (shard_map requires even shards)."""
    from corrifnet_tpu.ops.meshctx import island, kernel_mesh

    calls = []

    def fn(x):
        calls.append(x.shape)
        return x * 2

    x = jnp.ones((8, 4))
    assert island(fn, (0,), 0) is fn  # no ambient mesh: identity

    with kernel_mesh(mesh):
        wrapped = island(fn, (0,), 0)
        assert wrapped is not fn
        odd = jnp.ones((6, 4))  # 6 % 8 != 0 -> direct call
        np.testing.assert_array_equal(np.asarray(wrapped(odd)), 2.0)
        assert calls[-1] == (6, 4)
        np.testing.assert_array_equal(np.asarray(wrapped(x)), 2.0)
        assert calls[-1] == (1, 4)  # sharded: fn saw one row per device


def test_attention_jit_partitioner_with_sharded_inputs(interpret, mesh):
    """The model's real call pattern under a mesh: a plain jit sees
    batch-sharded operands flowing into the attention op. Without an
    ambient kernel_mesh, GSPMD cannot partition an interpret-mode
    pallas_call (it lowers to a host callback); WITH the context — which
    is what train_model/evaluate establish — the call site becomes a
    shard_map island and the partitioner succeeds. This pins down the
    end-to-end jit path, not a hand-built shard_map."""
    from corrifnet_tpu.ops.meshctx import kernel_mesh

    q, k, v = (_rand((8, 2, 64, 128), s + 30) for s in range(3))
    scale = 128 ** -0.5
    want = fused_attention(q, k, v, scale)

    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    with kernel_mesh(mesh):
        got = jax.jit(
            lambda q, k, v: fused_attention(q, k, v, scale))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
