"""Full-model numerical parity for the single-modality (4-D) zoo.

Same methodology as test_full_model_parity.py: import the actual torch
reference implementation from /root/reference, copy its state_dict into
the JAX parameter pytree via models.torch_import, and assert the
end-to-end eval forward matches at B=1 on a fixed random input. This
converts per-primitive parity (tests/test_nn_torch_parity.py) into an
executable whole-composition proof per model.

Eval mode (running BN stats, deterministic dropout) on CPU at reduced
spatial size where the architecture is size-independent.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DIR = "/root/reference"


def _load_reference(fname, module_name, stubs=()):
    """Import a reference module; ``stubs`` names absent third-party deps
    (zero-egress box) to replace with empty modules exposing any attribute."""
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


def _forward_pair(ref_model, jax_model, variables, x_np):
    """Eval-mode forwards on both sides; returns (ref_out, jax_out)."""
    import jax.numpy as jnp

    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x_np)).numpy()
    out = np.asarray(jax_model.apply(variables, jnp.asarray(x_np), False))
    return ref_out, out


# ---------------------------------------------------------------------------
# UNetV2 (F9_UNET_V2_3.py:113-141)
# ---------------------------------------------------------------------------


def test_unetv2_full_forward_parity():
    from corrifnet_tpu.models.torch_import import unetv2_variables_from_state_dict
    from corrifnet_tpu.models.unet import UNetV2

    ref = _load_reference("F9_UNET_V2_3.py", "ref_unetv2")
    torch.manual_seed(0)
    model_t = ref.UNetV2(classes=1)
    x_np = np.random.default_rng(3).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )

    variables = unetv2_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(model_t, UNetV2(classes=1), variables, x_np)

    assert out.shape == ref_out.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=0)


def test_unetv2_state_dict_covers_param_tree():
    """Every live torch parameter lands in the converted tree with the init
    tree's exact shape/location (dead ConvTranspose params excepted)."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.models.torch_import import unetv2_variables_from_state_dict
    from corrifnet_tpu.models.unet import UNetV2

    ref = _load_reference("F9_UNET_V2_3.py", "ref_unetv2")
    torch.manual_seed(0)
    model_t = ref.UNetV2(classes=1)
    variables = unetv2_variables_from_state_dict(model_t.state_dict())

    jm = UNetV2(classes=1)
    expected = jax.eval_shape(
        lambda r, xx: jm.init({"params": r}, xx, False),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, 64, 64), jnp.float32),
    )
    exp = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(
            {k: expected[k] for k in ("params", "batch_stats")}
        )[0]
    }
    got = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(
            {k: variables[k] for k in ("params", "batch_stats")}
        )[0]
    }
    assert exp == got


# ---------------------------------------------------------------------------
# ENet (F29_ENet.py:278-437)
# ---------------------------------------------------------------------------


def test_enet_full_forward_parity():
    """Exercises the shared-PReLU-per-bottleneck quirk, max-pool indices ->
    max-unpool round trip, dilated + asymmetric convs, and the transposed
    final conv in one composition."""
    from corrifnet_tpu.models.enet import ENet
    from corrifnet_tpu.models.torch_import import enet_variables_from_state_dict

    ref = _load_reference("F29_ENet.py", "ref_enet", stubs=("torchsummary",))
    torch.manual_seed(0)
    model_t = ref.ENet(classes=1)
    x_np = np.random.default_rng(5).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )

    variables = enet_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(model_t, ENet(classes=1), variables, x_np)

    assert out.shape == ref_out.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=0)


# ---------------------------------------------------------------------------
# Segformer (segformer.py:171-216)
# ---------------------------------------------------------------------------


def test_segformer_full_forward_parity():
    """Exercises the Unfold==conv patch-embed equivalence, the biased-std
    eps-outside-sqrt channel LayerNorm, spatial-reduction attention, and
    the fixed-224 align_corners=False decoder upsample."""
    from corrifnet_tpu.models.segformer import Segformer
    from corrifnet_tpu.models.torch_import import (
        segformer_variables_from_state_dict,
    )

    ref = _load_reference("segformer.py", "ref_segformer")
    torch.manual_seed(0)
    model_t = ref.Segformer(num_classes=1)
    x_np = np.random.default_rng(11).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )

    variables = segformer_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(
        model_t, Segformer(num_classes=1), variables, x_np
    )

    assert out.shape == ref_out.shape == (1, 1, 224, 224)
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=0)


def test_segformer_debug_variant_forward_parity(capsys):
    """The orphan F32_SEGFORMER.py debug variant (nothing imports it —
    rebuilt as ``Segformer(debug_variant=True)``): nearest scale-factor
    fusion upsample (output lands on the stride-4 grid, not 224), split
    to_segmentation1/2 head, raw logits without sigmoid, shape prints."""
    from corrifnet_tpu.models.segformer import Segformer
    from corrifnet_tpu.models.torch_import import (
        segformer_variables_from_state_dict,
    )

    ref = _load_reference("F32_SEGFORMER.py", "ref_segformer_f32")
    torch.manual_seed(0)
    model_t = ref.Segformer(num_classes=1)
    x_np = np.random.default_rng(12).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )

    variables = segformer_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(
        model_t, Segformer(num_classes=1, debug_variant=True), variables, x_np
    )

    assert out.shape == ref_out.shape == (1, 1, 16, 16)  # stride-4 grid
    assert (out < 0).any()  # raw logits, not sigmoided
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=0)
    assert "Output Size after Conv2:" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# ELANet (F30_ELANet.py:252-342)
# ---------------------------------------------------------------------------


def test_elanet_full_forward_parity():
    """Exercises the ECA-style Conv1d channel attention (kernel/stride
    derived from channel counts), dilated channelwise convs, per-channel
    PReLUs, and the dual-attention RFF decoder."""
    from corrifnet_tpu.models.elanet import ELANet
    from corrifnet_tpu.models.torch_import import elanet_variables_from_state_dict

    ref = _load_reference("F30_ELANet.py", "ref_elanet", stubs=("torchsummary",))
    torch.manual_seed(0)
    model_t = ref.ELANet(classes=1)
    x_np = np.random.default_rng(13).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )

    variables = elanet_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(model_t, ELANet(classes=1), variables, x_np)

    assert out.shape == ref_out.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=0)


# ---------------------------------------------------------------------------
# FASSDNet (F28_FASSDNet.py:272-377)
# ---------------------------------------------------------------------------


def test_fassdnet_full_forward_parity():
    """Exercises the HarDBlock harmonic link topology (concat indices),
    the DAPF asymmetric dilated pyramid, and the MDA decoder blocks."""
    from corrifnet_tpu.models.fassdnet import FASSDNet
    from corrifnet_tpu.models.torch_import import (
        fassdnet_variables_from_state_dict,
    )

    ref = _load_reference("F28_FASSDNet.py", "ref_fassdnet")
    torch.manual_seed(0)
    model_t = ref.FASSDNet(n_classes=1)
    x_np = np.random.default_rng(17).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )

    variables = fassdnet_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(
        model_t, FASSDNet(n_classes=1), variables, x_np
    )

    assert out.shape == ref_out.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=0)


# ---------------------------------------------------------------------------
# DeepLabv3_plus (F14_DEEPLABV3PLUS_V4_xception.py:445-494)
# ---------------------------------------------------------------------------


def test_deeplab_full_forward_parity():
    """Exercises the aligned-Xception entry/middle/exit flows (TF
    fixed-padding separable convs, skip BNs), 4-rate ASPP + global max
    image pool, and the two-stage bilinear decoder."""
    from corrifnet_tpu.models.deeplabv3p import DeepLabV3Plus
    from corrifnet_tpu.models.torch_import import (
        deeplab_variables_from_state_dict,
    )

    ref = _load_reference(
        "F14_DEEPLABV3PLUS_V4_xception.py", "ref_deeplab",
        stubs=("torchvision", "torchvision.models"),
    )
    torch.manual_seed(0)
    model_t = ref.DeepLabv3_plus(num_classes=1, pretrained=False)
    x_np = np.random.default_rng(19).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )

    # At random init the deep Xception stack amplifies activations until the
    # sigmoid saturates to exact 0/1 (identity running BN stats), making the
    # comparison degenerate. One momentum-1.0 train-mode forward writes the
    # batch statistics into the running buffers, so the eval forward is
    # normalized and the outputs carry real precision to compare.
    for m in model_t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    model_t.train()
    with torch.no_grad():
        model_t(torch.from_numpy(x_np))

    variables = deeplab_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(
        model_t, DeepLabV3Plus(num_classes=1), variables, x_np
    )

    assert out.shape == ref_out.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=0)


# ---------------------------------------------------------------------------
# RFNet (RFNet.py:287-317)
# ---------------------------------------------------------------------------


def test_rfnet_full_forward_parity():
    """Exercises the prm gating (constant softmax over num_cls=1, quirk),
    the gated modal_fusion weighted sum (+1e-7 math), region/shortcut
    fusion, and the fixed-size trilinear decode cascade."""
    from corrifnet_tpu.models.rfnet import RFNet
    from corrifnet_tpu.models.torch_import import rfnet_variables_from_state_dict

    ref = _load_reference("RFNet.py", "ref_rfnet")
    torch.manual_seed(0)
    model_t = ref.RFNet(num_cls=1)
    x_np = np.random.default_rng(23).normal(
        0, 1, (1, 3, 3, 224, 224)
    ).astype(np.float32)

    variables = rfnet_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(model_t, RFNet(num_cls=1), variables, x_np)

    assert out.shape == ref_out.shape == (1, 3, 1, 224, 224)
    np.testing.assert_allclose(out, ref_out, atol=5e-5, rtol=0)


# ---------------------------------------------------------------------------
# RobustMseg (RobustSeg.py:8-95)
# ---------------------------------------------------------------------------


def test_robustseg_full_forward_parity():
    """Exercises the shared-weight e{l}c1 double application, ZeroLayer
    drop masking, sigmoid content attention, AdaIN recon decoders (conv1
    branch overwritten quirk), and the U-Net mask decoder."""
    from corrifnet_tpu.models.robustseg import RobustMseg
    from corrifnet_tpu.models.torch_import import (
        robustseg_variables_from_state_dict,
    )

    ref = _load_reference("RobustSeg.py", "ref_robustseg")
    torch.manual_seed(0)
    model_t = ref.RobustMseg()
    x_np = np.random.default_rng(29).normal(
        0, 1, (1, 3, 3, 64, 64)
    ).astype(np.float32)

    variables = robustseg_variables_from_state_dict(model_t.state_dict())
    ref_out, out = _forward_pair(model_t, RobustMseg(), variables, x_np)

    assert out.shape == ref_out.shape == (1, 3, 1, 64, 64)
    np.testing.assert_allclose(out, ref_out, atol=5e-5, rtol=0)


# ---------------------------------------------------------------------------
# MultiSenseSeg (MultiSenseSeg.py:1137-1297)
# ---------------------------------------------------------------------------


def _stub_timm():
    """timm is not installed; the reference only uses to_2tuple,
    trunc_normal_ and DropPath from timm.models.layers."""
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
    layers.to_2tuple = lambda v: tuple(v) if isinstance(v, (tuple, list)) else (v, v)
    layers.trunc_normal_ = lambda t, std=1.0, **kw: torch.nn.init.trunc_normal_(
        t, std=std
    )
    layers.DropPath = DropPath
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm = types.ModuleType("timm")
    timm.models = models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


def test_multisenseseg_full_forward_parity():
    """Exercises the MSE angular-positional heads, AMM cosine channel
    attention (log-scaled logit temperature, continuous relative-position
    bias MLP, inverted double softmax), the Swin FC-attention / CNN-FFN
    backbone with the CNNMlp buffer-scramble quirk, PPM+FPN neck, and the
    gated decode head."""
    from corrifnet_tpu.models.multisenseseg import MultiSenseSeg
    from corrifnet_tpu.models.torch_import import (
        multisenseseg_variables_from_state_dict,
    )

    _stub_timm()
    ref = _load_reference("MultiSenseSeg.py", "ref_multisenseseg")
    torch.manual_seed(0)
    model_t = ref.MultiSenseSeg(n_classes=1, n_branch=3, in_chans=(3, 3, 3))
    x_np = np.random.default_rng(31).normal(
        0, 1, (1, 3, 3, 64, 64)
    ).astype(np.float32)

    # populate BN running stats (see the DeepLab test for why)
    for m in model_t.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.momentum = 1.0
    model_t.train()
    with torch.no_grad():
        model_t([torch.from_numpy(x_np[:, i]) for i in range(3)])

    variables = multisenseseg_variables_from_state_dict(model_t.state_dict())
    model_t.eval()
    with torch.no_grad():
        ref_out = model_t(
            [torch.from_numpy(x_np[:, i]) for i in range(3)]
        )
        if isinstance(ref_out, (tuple, list)):
            ref_out = torch.stack(list(ref_out), dim=1)
        ref_out = ref_out.numpy()

    import jax.numpy as jnp

    jm = MultiSenseSeg(n_classes=1)
    out = np.asarray(jm.apply(variables, jnp.asarray(x_np), False))

    assert out.shape[-2:] == ref_out.shape[-2:]
    np.testing.assert_allclose(
        out.reshape(ref_out.shape), ref_out, atol=5e-5, rtol=0
    )


def test_deeplab_train_dynamics_match_reference():
    """Training-mode parity vs torch autograd for DeepLabv3_plus: same
    loss, same BN running-stat updates, same gradient direction — proves
    the inplace-ReLU aliasing fixes carry into the BACKWARD pass (the
    relu'd skip/low-level paths change where gradient flows)."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.metrics.losses import bce_with_logits
    from corrifnet_tpu.models.deeplabv3p import DeepLabV3Plus
    from corrifnet_tpu.models.torch_import import (
        deeplab_variables_from_state_dict,
    )

    ref = _load_reference(
        "F14_DEEPLABV3PLUS_V4_xception.py", "ref_deeplab_dyn",
        stubs=("torchvision", "torchvision.models"),
    )
    torch.manual_seed(0)
    model_t = ref.DeepLabv3_plus(num_classes=1, pretrained=False)
    import copy

    sd0 = copy.deepcopy(model_t.state_dict())

    # BN train mode (batch stats + running update); dropout off
    model_t.eval()
    for m in model_t.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.train()

    rng = np.random.default_rng(43)
    x_np = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((2, 1, 64, 64)) > 0.7).astype(np.float32)

    out_t = model_t(torch.from_numpy(x_np))
    loss_t = torch.nn.BCEWithLogitsLoss()(out_t, torch.from_numpy(target_np))
    loss_t.backward()
    sd_after = model_t.state_dict()
    named = dict(model_t.named_parameters())
    grad_sd = {
        k: (named[k].grad if k in named and named[k].grad is not None
            else torch.zeros_like(v) if k in named else v)
        for k, v in sd_after.items()
    }

    variables = deeplab_variables_from_state_dict(sd0)
    jm = DeepLabV3Plus(num_classes=1, drop_rate=0.0)
    x = jnp.asarray(x_np)
    target = jnp.asarray(target_np)

    def loss_fn(params):
        out, mut = jm.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return (
            bce_with_logits(out.astype(jnp.float32), target).mean(),
            mut["batch_stats"],
        )

    (loss_j, bs_j), grads_j = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )

    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-5)

    bs_ref = deeplab_variables_from_state_dict(sd_after)["batch_stats"]
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(bs_ref),
        jax.tree_util.tree_leaves_with_path(bs_j),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=str(p),
        )

    g_ref = deeplab_variables_from_state_dict(grad_sd)["params"]
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


def test_rfnet_train_dynamics_match_reference():
    """One-step gradient parity for RFNet: InstanceNorm-only (no BN
    buffers), no dropout — train mode is deterministic on both sides.
    Proves the prm stop_gradient placement and the gated modal_fusion
    weighted sum backward-match torch autograd."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.metrics.losses import bce_with_logits
    from corrifnet_tpu.models.rfnet import RFNet
    from corrifnet_tpu.models.torch_import import rfnet_variables_from_state_dict

    ref = _load_reference("RFNet.py", "ref_rfnet_dyn")
    torch.manual_seed(0)
    model_t = ref.RFNet(num_cls=1).train()

    rng = np.random.default_rng(47)
    x_np = rng.normal(0, 1, (1, 3, 3, 224, 224)).astype(np.float32)
    target_np = (rng.random((1, 3, 1, 224, 224)) > 0.7).astype(np.float32)

    out_t = model_t(torch.from_numpy(x_np))
    loss_t = torch.nn.BCEWithLogitsLoss()(out_t, torch.from_numpy(target_np))
    loss_t.backward()
    named = dict(model_t.named_parameters())
    grad_sd = {
        k: (v.grad if v.grad is not None else torch.zeros_like(v))
        for k, v in named.items()
    }

    variables = rfnet_variables_from_state_dict(model_t.state_dict())

    def loss_fn(params):
        out = RFNet(num_cls=1).apply(
            {"params": params}, jnp.asarray(x_np), True
        )
        return bce_with_logits(
            out.astype(jnp.float32), jnp.asarray(target_np)
        ).mean()

    loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-5)

    g_ref = rfnet_variables_from_state_dict(grad_sd)["params"]
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


def test_segformer_train_dynamics_match_reference():
    """One-step gradient parity for Segformer (no BN buffers, no dropout —
    deterministic train mode): spatial-reduction attention, channel
    LayerNorm, and grouped depthwise FFN backward-match torch autograd."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.metrics.losses import bce_with_logits
    from corrifnet_tpu.models.segformer import Segformer
    from corrifnet_tpu.models.torch_import import (
        segformer_variables_from_state_dict,
    )

    ref = _load_reference("segformer.py", "ref_segformer_dyn")
    torch.manual_seed(0)
    model_t = ref.Segformer(num_classes=1).train()

    rng = np.random.default_rng(53)
    x_np = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    target_np = (rng.random((2, 1, 224, 224)) > 0.7).astype(np.float32)

    out_t = model_t(torch.from_numpy(x_np))
    loss_t = torch.nn.BCEWithLogitsLoss()(out_t, torch.from_numpy(target_np))
    loss_t.backward()
    named = dict(model_t.named_parameters())
    grad_sd = {
        k: (v.grad if v.grad is not None else torch.zeros_like(v))
        for k, v in named.items()
    }

    variables = segformer_variables_from_state_dict(model_t.state_dict())

    def loss_fn(params):
        out = Segformer(num_classes=1).apply(
            {"params": params}, jnp.asarray(x_np), True
        )
        return bce_with_logits(
            out.astype(jnp.float32), jnp.asarray(target_np)
        ).mean()

    loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-5)

    g_ref = segformer_variables_from_state_dict(grad_sd)["params"]
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
