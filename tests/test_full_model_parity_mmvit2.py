"""Full-model numerical parity: reference torch MMVit2 / mmformer vs the
TPU rebuild (the round-1 VERDICT asked for MMVit4 first, then these two).

Imports the actual reference implementations (/root/reference/mmmvit2.py,
/root/reference/mmformer.py — byte-identical apart from the correlation
stage), copies each state_dict into the JAX parameter pytree via
models.torch_import.mmvit2_variables_from_state_dict, and asserts the
end-to-end forward matches at B=1. Covers: the 5-stage residual conv
encoder with replicate padding, NEAREST x6 pyramid (mmmvit2.py:97-101),
stacked per-modality skips, correlation-replaces-tokens (mmmvit2.py:
433-461) vs its absence (mmformer), the (B,1536,512)->(B,8,8,8,1536)
reinterpreting view (mmmvit2.py:470), and the fixed-cube decoder.

Runs in eval mode (no dropout; InstanceNorm only, so no running stats)
on CPU at 64x64 input — every internal grid is fixed-size, so this
exercises identical code paths to 224 at a fraction of the cost.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DIR = "/root/reference"


def _load_reference(fname, modname):
    spec = importlib.util.spec_from_file_location(
        modname, f"{REFERENCE_DIR}/{fname}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def _input():
    return np.random.default_rng(11).normal(
        0, 1, (1, 3, 3, 64, 64)
    ).astype(np.float32)


@pytest.fixture(scope="module")
def ref_mmvit2():
    ref = _load_reference("mmmvit2.py", "ref_mmvit2")
    torch.manual_seed(0)
    model = ref.MMVit2(num_cls=1).eval()
    x = torch.from_numpy(_input())
    with torch.no_grad():
        out = model(x)
    return model, x.numpy(), out.numpy()


@pytest.fixture(scope="module")
def ref_mmformer():
    ref = _load_reference("mmformer.py", "ref_mmformer")
    torch.manual_seed(0)
    model = ref.mmformer(num_cls=1).eval()
    x = torch.from_numpy(_input())
    with torch.no_grad():
        out = model(x)
    return model, x.numpy(), out.numpy()


def test_state_dict_converts_to_full_param_tree(ref_mmvit2):
    """Every converted leaf matches the MMVit2 init tree's shape/location."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit2 import MMVit2
    from corrifnet_tpu.models.torch_import import (
        mmvit2_variables_from_state_dict,
    )

    model_t, x_np, _ = ref_mmvit2
    variables = mmvit2_variables_from_state_dict(model_t.state_dict())

    jm = MMVit2(use_pallas=False, depth_mode="full")
    expected = jax.eval_shape(
        lambda r, xx: jm.init({"params": r}, xx, False),
        jax.random.PRNGKey(0),
        jnp.zeros(x_np.shape, jnp.float32),
    )
    exp_flat = jax.tree_util.tree_flatten_with_path(expected["params"])[0]
    got_flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    exp = {jax.tree_util.keystr(p): v.shape for p, v in exp_flat}
    got = {jax.tree_util.keystr(p): np.shape(v) for p, v in got_flat}
    assert exp == got


def test_mmvit2_forward_matches_reference(ref_mmvit2):
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit2 import MMVit2
    from corrifnet_tpu.models.torch_import import (
        mmvit2_variables_from_state_dict,
    )

    model_t, x_np, ref_out = ref_mmvit2
    variables = mmvit2_variables_from_state_dict(model_t.state_dict())

    jm = MMVit2(use_pallas=False, depth_mode="full")
    out = np.asarray(jm.apply(variables, jnp.asarray(x_np), False))

    assert out.shape == ref_out.shape == (1, 3, 1, 224, 224)
    # f32 both sides; residual is op-order noise through ~40 InstanceNorms
    # (same tolerance rationale as the MMVit4 parity test).
    np.testing.assert_allclose(out, ref_out, atol=1.5e-3, rtol=0)
    assert float(np.abs(out - ref_out).mean()) < 5e-5


def test_mmformer_forward_matches_reference(ref_mmformer):
    """MMFormer == MMVit2(use_correlation=False): the reference ablation
    file's state_dict (no qkv convs) imports with dead-zero qkv leaves."""
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit2 import MMFormer
    from corrifnet_tpu.models.torch_import import (
        mmvit2_variables_from_state_dict,
    )

    model_t, x_np, ref_out = ref_mmformer
    variables = mmvit2_variables_from_state_dict(
        model_t.state_dict(), mmformer=True
    )

    jm = MMFormer(use_pallas=False, depth_mode="full")
    out = np.asarray(jm.apply(variables, jnp.asarray(x_np), False))

    assert out.shape == ref_out.shape == (1, 3, 1, 224, 224)
    np.testing.assert_allclose(out, ref_out, atol=1.5e-3, rtol=0)
    assert float(np.abs(out - ref_out).mean()) < 5e-5


def test_mmvit2_train_dynamics_match_reference(ref_mmvit2):
    """One train-mode step vs torch autograd (MMVit2 is InstanceNorm-based,
    so train mode differs from eval only by dropout — disabled on both
    sides): loss value and end-to-end gradient direction match. Same
    methodology and thresholds as the MMVit4 dynamics test."""
    import copy

    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit2 import MMVit2
    from corrifnet_tpu.models.torch_import import (
        mmvit2_variables_from_state_dict,
    )
    from corrifnet_tpu.train.state import _masked_loss_and_jaccard

    model_t, x_np, _ = ref_mmvit2
    model_t = copy.deepcopy(model_t).eval()  # eval: dropout off (no BN)

    rng = np.random.default_rng(13)
    target_np = (rng.random((1, 3, 1, 224, 224)) > 0.7).astype(np.float32)

    out_t = model_t(torch.from_numpy(x_np))
    loss_t = torch.nn.BCEWithLogitsLoss()(out_t, torch.from_numpy(target_np))
    loss_t.backward()
    named = dict(model_t.named_parameters())
    grad_sd = {
        k: (named[k].grad if k in named and named[k].grad is not None
            else torch.zeros_like(v) if k in named else v)
        for k, v in model_t.state_dict().items()
    }

    variables = mmvit2_variables_from_state_dict(model_t.state_dict())
    jm = MMVit2(use_pallas=False, depth_mode="full", transformer_dropout=0.0)

    def loss_fn(params):
        out = jm.apply(
            {"params": params}, jnp.asarray(x_np), True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        loss, _, _ = _masked_loss_and_jaccard(
            out.astype(jnp.float32), jnp.asarray(target_np),
            jnp.ones((1,), jnp.float32),
        )
        return loss

    loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-5)

    g_ref = mmvit2_variables_from_state_dict(grad_sd)["params"]
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    j_leaves = jax.tree_util.tree_leaves_with_path(grads_j)
    assert [p for p, _ in ref_leaves] == [p for p, _ in j_leaves]
    num = den_a = den_b = 0.0
    rows = []
    for (p, a), (_, b) in zip(ref_leaves, j_leaves):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        num += float(a @ b)
        den_a += float(a @ a)
        den_b += float(b @ b)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 0 and nb > 0:
            rows.append((na, float(a @ b) / (na * nb), str(p)))
    global_cos = num / (den_a ** 0.5 * den_b ** 0.5)
    assert global_cos > 0.998, global_cos
    rows.sort(reverse=True)
    for na, cos, p in rows[:40]:
        assert cos > 0.995, (p, cos, na)
