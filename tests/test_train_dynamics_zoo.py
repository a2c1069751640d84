"""Train-dynamics (one-step gradient) parity for the rest of the zoo.

The round-2 verdict: eval-forward parity alone misses training-path bugs
(the DeepLab inplace-ReLU aliasing and RFNet prm-gating divergences were
only caught by gradient comparison). This file extends the one-step
gradient parity methodology of tests/test_full_model_parity_zoo.py to the
seven models that only had eval-forward coverage: UNetV2, ENet, ELANet,
FASSDNet, mmformer, RobustMseg, MultiSenseSeg — completing 12/12.

Methodology per model: import the actual torch reference from
/root/reference, copy its state_dict into the JAX pytree, run ONE
train-mode forward+backward on both sides with the BCEWithLogits loss the
reference training loop uses (F4_TRAIN.py:58-60), and assert (a) the loss
matches, (b) the global gradient cosine > 0.998 and every high-norm leaf's
cosine > 0.995.

Determinism: dropout must be OFF while BatchNorm stays in batch-stats
train mode (the interesting backward path). Torch side: ``model.eval()``
then flip only the ``_BatchNorm`` modules back to train. JAX side: the
models derive dropout determinism from the same ``train`` flag as BN, so
a flax method interceptor forces every ``nn.Dropout`` call deterministic
without touching model code.
"""

from __future__ import annotations

import contextlib
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DIR = "/root/reference"


def _load_reference(fname, module_name, stubs=()):
    import types

    for stub in stubs:
        mod = types.ModuleType(stub)
        mod.__getattr__ = lambda name: (lambda *a, **k: None)
        sys.modules.setdefault(stub, mod)
    spec = importlib.util.spec_from_file_location(
        module_name, f"{REFERENCE_DIR}/{fname}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def _dropout_forced_off():
    """Force every flax Dropout deterministic (test-only): the zoo models
    gate dropout on the same ``train`` flag as BatchNorm, and this keeps
    BN in batch-stats mode while making the comparison deterministic."""
    import flax.linen as fnn

    from corrifnet_tpu.models.multisenseseg import DropPath

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, (fnn.Dropout, DropPath))
                and context.method_name == "__call__"):
            kwargs = dict(kwargs)
            if len(args) > 1:  # deterministic passed positionally
                args = args[:1]
            kwargs["deterministic"] = True
            return next_fun(*args, **kwargs)
        return next_fun(*args, **kwargs)

    with fnn.intercept_methods(interceptor):
        yield


def _torch_bn_train_dropout_off(model_t):
    """eval() everything (dropout/droppath off), then flip BatchNorm back
    to train so batch statistics are used and running stats update."""
    model_t.eval()
    for m in model_t.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.train()
    return model_t


def _torch_loss_and_grads(model_t, x_t, target_t):
    out_t = model_t(x_t)
    if isinstance(out_t, (tuple, list)):
        out_t = torch.stack(list(out_t), dim=1)
    loss_t = torch.nn.BCEWithLogitsLoss()(out_t, target_t)
    loss_t.backward()
    # remove_duplicate=False: shared modules (e.g. ENet's per-bottleneck
    # PReLU registered at several paths) must expose the accumulated grad
    # under EVERY state_dict alias, or the aliased keys silently fall back
    # to the parameter value below.
    named = dict(model_t.named_parameters(remove_duplicate=False))
    grad_sd = {
        k: (named[k].grad if k in named and named[k].grad is not None
            else torch.zeros_like(v) if k in named else v)
        for k, v in model_t.state_dict().items()
    }
    return float(loss_t), grad_sd


def _assert_grad_cosines(ref_params, jax_params, top_n=40):
    import jax

    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_params)
    j_leaves = jax.tree_util.tree_leaves_with_path(jax_params)
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
    for na, cos, p in rows[:top_n]:
        assert cos > 0.995, (p, cos, na)


def _jax_loss_and_grads(jm, variables, x_np, target_np, loss_atol, loss_t):
    """Train-mode (dropout forced off) loss+grad on the JAX side, loss
    checked against the torch value inside so every test shares it."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.metrics.losses import bce_with_logits

    x = jnp.asarray(x_np)
    target = jnp.asarray(target_np)
    has_bn = "batch_stats" in variables

    def loss_fn(params):
        vs = {"params": params}
        if has_bn:
            vs["batch_stats"] = variables["batch_stats"]
        with _dropout_forced_off():
            if has_bn:
                out, _ = jm.apply(
                    vs, x, True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
            else:
                out = jm.apply(
                    vs, x, True, rngs={"dropout": jax.random.PRNGKey(0)}
                )
        if isinstance(out, (tuple, list)):
            out = jnp.stack(list(out), axis=1)
        return bce_with_logits(
            out.astype(jnp.float32).reshape(target.shape), target
        ).mean()

    loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), loss_t, atol=loss_atol)
    return grads_j


# ---------------------------------------------------------------------------
# UNetV2 (F9_UNET_V2_3.py:113-141): BN batch stats + the 8 Dropout(0.5) sites
# ---------------------------------------------------------------------------


def test_unetv2_train_dynamics_match_reference():
    from corrifnet_tpu.models.torch_import import (
        unetv2_variables_from_state_dict,
    )
    from corrifnet_tpu.models.unet import UNetV2

    ref = _load_reference("F9_UNET_V2_3.py", "ref_unetv2_dyn")
    torch.manual_seed(0)
    model_t = _torch_bn_train_dropout_off(ref.UNetV2(classes=1))

    rng = np.random.default_rng(61)
    x_np = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((2, 1, 64, 64)) > 0.7).astype(np.float32)

    variables = unetv2_variables_from_state_dict(model_t.state_dict())
    loss_t, grad_sd = _torch_loss_and_grads(
        model_t, torch.from_numpy(x_np), torch.from_numpy(target_np)
    )
    grads_j = _jax_loss_and_grads(
        UNetV2(classes=1), variables, x_np, target_np, 2e-5, loss_t
    )
    _assert_grad_cosines(
        unetv2_variables_from_state_dict(grad_sd)["params"], grads_j
    )


# ---------------------------------------------------------------------------
# ENet (F29_ENet.py:278-437): shared PReLUs, unpool indices, dropout2d
# ---------------------------------------------------------------------------


def test_enet_train_dynamics_match_reference():
    from corrifnet_tpu.models.enet import ENet
    from corrifnet_tpu.models.torch_import import enet_variables_from_state_dict

    ref = _load_reference("F29_ENet.py", "ref_enet_dyn", stubs=("torchsummary",))
    torch.manual_seed(0)
    model_t = _torch_bn_train_dropout_off(ref.ENet(classes=1))

    rng = np.random.default_rng(67)
    x_np = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((2, 1, 64, 64)) > 0.7).astype(np.float32)

    variables = enet_variables_from_state_dict(model_t.state_dict())
    loss_t, grad_sd = _torch_loss_and_grads(
        model_t, torch.from_numpy(x_np), torch.from_numpy(target_np)
    )
    grads_j = _jax_loss_and_grads(
        ENet(classes=1), variables, x_np, target_np, 2e-5, loss_t
    )
    _assert_grad_cosines(
        enet_variables_from_state_dict(grad_sd)["params"], grads_j
    )


# ---------------------------------------------------------------------------
# ELANet (F30_ELANet.py:252-342): Conv1d channel attention, PReLUs, RFF
# ---------------------------------------------------------------------------


def test_elanet_train_dynamics_match_reference():
    from corrifnet_tpu.models.elanet import ELANet
    from corrifnet_tpu.models.torch_import import elanet_variables_from_state_dict

    ref = _load_reference(
        "F30_ELANet.py", "ref_elanet_dyn", stubs=("torchsummary",)
    )
    torch.manual_seed(0)
    model_t = _torch_bn_train_dropout_off(ref.ELANet(classes=1))

    rng = np.random.default_rng(71)
    x_np = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((2, 1, 64, 64)) > 0.7).astype(np.float32)

    variables = elanet_variables_from_state_dict(model_t.state_dict())
    loss_t, grad_sd = _torch_loss_and_grads(
        model_t, torch.from_numpy(x_np), torch.from_numpy(target_np)
    )
    grads_j = _jax_loss_and_grads(
        ELANet(classes=1), variables, x_np, target_np, 2e-5, loss_t
    )
    _assert_grad_cosines(
        elanet_variables_from_state_dict(grad_sd)["params"], grads_j
    )


# ---------------------------------------------------------------------------
# FASSDNet (F28_FASSDNet.py:272-377): HarDBlock links, DAPF, MDA (no dropout)
# ---------------------------------------------------------------------------


def test_fassdnet_train_dynamics_match_reference():
    from corrifnet_tpu.models.fassdnet import FASSDNet
    from corrifnet_tpu.models.torch_import import (
        fassdnet_variables_from_state_dict,
    )

    ref = _load_reference("F28_FASSDNet.py", "ref_fassdnet_dyn")
    torch.manual_seed(0)
    model_t = _torch_bn_train_dropout_off(ref.FASSDNet(n_classes=1))

    rng = np.random.default_rng(73)
    x_np = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((2, 1, 64, 64)) > 0.7).astype(np.float32)

    variables = fassdnet_variables_from_state_dict(model_t.state_dict())
    loss_t, grad_sd = _torch_loss_and_grads(
        model_t, torch.from_numpy(x_np), torch.from_numpy(target_np)
    )
    grads_j = _jax_loss_and_grads(
        FASSDNet(n_classes=1), variables, x_np, target_np, 2e-5, loss_t
    )
    _assert_grad_cosines(
        fassdnet_variables_from_state_dict(grad_sd)["params"], grads_j
    )


# ---------------------------------------------------------------------------
# mmformer (mmformer.py:349-435): MMVit2 minus correlation; InstanceNorm only
# ---------------------------------------------------------------------------


def test_mmformer_train_dynamics_match_reference():
    from corrifnet_tpu.models.mmvit2 import MMFormer
    from corrifnet_tpu.models.torch_import import (
        mmvit2_variables_from_state_dict,
    )

    ref = _load_reference("mmformer.py", "ref_mmformer_dyn")
    torch.manual_seed(0)
    # InstanceNorm only — eval differs from train only by dropout, which
    # is off on both sides
    model_t = ref.mmformer(num_cls=1).eval()

    rng = np.random.default_rng(79)
    x_np = rng.normal(0, 1, (1, 3, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((1, 3, 1, 224, 224)) > 0.7).astype(np.float32)

    variables = mmvit2_variables_from_state_dict(
        model_t.state_dict(), mmformer=True
    )
    loss_t, grad_sd = _torch_loss_and_grads(
        model_t, torch.from_numpy(x_np), torch.from_numpy(target_np)
    )
    jm = MMFormer(use_pallas=False, depth_mode="full", transformer_dropout=0.0)
    grads_j = _jax_loss_and_grads(
        jm, variables, x_np, target_np, 5e-5, loss_t
    )
    _assert_grad_cosines(
        mmvit2_variables_from_state_dict(grad_sd, mmformer=True)["params"],
        grads_j,
    )


# ---------------------------------------------------------------------------
# RobustMseg (RobustSeg.py:8-95): style/content split, AdaIN, ZeroLayer
# ---------------------------------------------------------------------------


def test_robustseg_train_dynamics_match_reference():
    from corrifnet_tpu.models.robustseg import RobustMseg
    from corrifnet_tpu.models.torch_import import (
        robustseg_variables_from_state_dict,
    )

    ref = _load_reference("RobustSeg.py", "ref_robustseg_dyn")
    torch.manual_seed(0)
    model_t = _torch_bn_train_dropout_off(ref.RobustMseg())

    rng = np.random.default_rng(83)
    x_np = rng.normal(0, 1, (1, 3, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((1, 3, 1, 64, 64)) > 0.7).astype(np.float32)

    variables = robustseg_variables_from_state_dict(model_t.state_dict())
    loss_t, grad_sd = _torch_loss_and_grads(
        model_t, torch.from_numpy(x_np), torch.from_numpy(target_np)
    )
    grads_j = _jax_loss_and_grads(
        RobustMseg(), variables, x_np, target_np, 5e-5, loss_t
    )
    _assert_grad_cosines(
        robustseg_variables_from_state_dict(grad_sd)["params"], grads_j
    )


# ---------------------------------------------------------------------------
# MultiSenseSeg (MultiSenseSeg.py:1137-1297): MSE/AMM fusion, Swin backbone
# ---------------------------------------------------------------------------


def _stub_timm():
    """timm is not installed; the reference only uses to_2tuple,
    trunc_normal_ and DropPath from timm.models.layers (same stub as
    tests/test_full_model_parity_zoo.py — duplicated because the tests
    directory is not a package)."""
    import types

    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    layers = types.ModuleType("timm.models.layers")
    layers.to_2tuple = lambda v: (
        tuple(v) if isinstance(v, (tuple, list)) else (v, v)
    )
    layers.trunc_normal_ = lambda t, std=1.0, **kw: (
        torch.nn.init.trunc_normal_(t, std=std)
    )
    layers.DropPath = DropPath
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm = types.ModuleType("timm")
    timm.models = models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


def test_multisenseseg_train_dynamics_match_reference():
    from corrifnet_tpu.models.multisenseseg import MultiSenseSeg
    from corrifnet_tpu.models.torch_import import (
        multisenseseg_variables_from_state_dict,
    )

    _stub_timm()
    ref = _load_reference("MultiSenseSeg.py", "ref_multisenseseg_dyn")
    torch.manual_seed(0)
    model_t = _torch_bn_train_dropout_off(
        ref.MultiSenseSeg(n_classes=1, n_branch=3, in_chans=(3, 3, 3))
    )

    rng = np.random.default_rng(89)
    x_np = rng.normal(0, 1, (1, 3, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((1, 3, 1, 64, 64)) > 0.7).astype(np.float32)

    variables = multisenseseg_variables_from_state_dict(model_t.state_dict())
    loss_t, grad_sd = _torch_loss_and_grads(
        model_t,
        [torch.from_numpy(x_np[:, i]) for i in range(3)],
        torch.from_numpy(target_np),
    )
    grads_j = _jax_loss_and_grads(
        MultiSenseSeg(n_classes=1), variables, x_np, target_np, 5e-5, loss_t
    )
    _assert_grad_cosines(
        multisenseseg_variables_from_state_dict(grad_sd)["params"], grads_j
    )
