"""Full-model numerical parity: reference torch MMVit4 vs the TPU rebuild.

Imports the actual reference implementation (/root/reference/mmvit4.py),
copies its entire state_dict into the JAX parameter pytree via
models.torch_import, and asserts the end-to-end forward matches at B=1
(where even the reference's B>1 correlation-softmax scramble coincides
with the per-element math). This converts every "quirk preserved" claim
into a single executable proof over the whole composition: inflated
encoders, early fusion, intra/inter formers, correlation softmax,
multimodal transformer, reinterpreting reshape, and the full-depth
decoder cascade (mmvit4.py:441-532).

Runs in eval mode (running BN stats, no dropout) on CPU at 64x64 input —
the reference model's internal grids (8^3 tokens, fixed decoder sizes,
up_to_224) are input-size independent, so this exercises identical code
paths to 224 at a fraction of the cost.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DIR = "/root/reference"


def _fake_resnet50():
    """Structural stand-in for torchvision.models.resnet50 (not installed on
    this box). The reference Encoder only reads conv1/bn1/relu/layer1..4 and
    each bottleneck's conv1-3/bn1-3/downsample (mmvit4.py:117-157), and
    MMVit4 kaiming-re-inits every conv anyway (mmvit4.py:437-439), so the
    pretrained weights never matter — only the exact module topology does.
    Matches torchvision's ResNet V1.5: stride on conv2, downsample on every
    layer's block 0, widths 64/128/256/512, blocks 3/4/6/3, expansion 4."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride, has_down):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if has_down:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(width * 4),
                )

    class ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            cin = 64
            for li, (blocks, width) in enumerate(
                ((3, 64), (4, 128), (6, 256), (3, 512)), start=1
            ):
                stride = 1 if li == 1 else 2
                layer = [Bottleneck(cin, width, stride, True)]
                cin = width * 4
                layer += [Bottleneck(cin, width, 1, False) for _ in range(blocks - 1)]
                setattr(self, f"layer{li}", nn.Sequential(*layer))

    return ResNet50()


def _load_reference_mmvit4():
    """Import the reference module with a stub torchvision (zero-egress box,
    torchvision not installed)."""
    import types

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet50 = lambda pretrained=False, **kw: _fake_resnet50()
    tv.models = tv_models
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv_models)

    spec = importlib.util.spec_from_file_location(
        "ref_mmvit4", f"{REFERENCE_DIR}/mmvit4.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mmvit4"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_model_and_output():
    ref = _load_reference_mmvit4()
    torch.manual_seed(0)
    model = ref.MMVit4(num_cls=1).eval()
    x = torch.from_numpy(
        np.random.default_rng(7).normal(0, 1, (1, 3, 3, 64, 64)).astype(np.float32)
    )
    with torch.no_grad():
        out = model(x)
    return model, x.numpy(), out.numpy()


def test_state_dict_converts_to_full_param_tree(ref_model_and_output):
    """Every converted leaf matches the MMVit4 init tree's shape/location."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.models.torch_import import mmvit4_variables_from_state_dict

    model_t, x_np, _ = ref_model_and_output
    variables = mmvit4_variables_from_state_dict(model_t.state_dict())

    jm = MMVit4(use_pallas=False, depth_mode="full", pack_stage1=False)
    expected = jax.eval_shape(
        lambda r, xx: jm.init({"params": r}, xx, False),
        jax.random.PRNGKey(0),
        jnp.zeros(x_np.shape, jnp.float32),
    )
    exp_flat = jax.tree_util.tree_flatten_with_path(
        {"params": expected["params"], "batch_stats": expected["batch_stats"]}
    )[0]
    got_flat = jax.tree_util.tree_flatten_with_path(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )[0]
    exp = {jax.tree_util.keystr(p): v.shape for p, v in exp_flat}
    got = {jax.tree_util.keystr(p): np.shape(v) for p, v in got_flat}
    assert exp == got


def test_full_forward_matches_reference(ref_model_and_output):
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.models.torch_import import mmvit4_variables_from_state_dict

    model_t, x_np, ref_out = ref_model_and_output
    variables = mmvit4_variables_from_state_dict(model_t.state_dict())
    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }

    jm = MMVit4(use_pallas=False, depth_mode="full", pack_stage1=False)
    out = np.asarray(jm.apply(variables, jnp.asarray(x_np), False))

    assert out.shape == ref_out.shape == (1, 3, 1, 224, 224)
    # f32 end to end on both sides; the residual is op-order noise amplified
    # by the ~17 InstanceNorms (rsqrt of 128^3-element variances). Measured
    # max |diff| on the sigmoid outputs: 7.2e-4 (99.6% of elements < 2e-4).
    np.testing.assert_allclose(out, ref_out, atol=1.5e-3, rtol=0)
    assert float(np.abs(out - ref_out).mean()) < 5e-5


def test_full_forward_matches_reference_packed(ref_model_and_output):
    """The default (pack_stage1=True) config ALSO matches the torch
    reference end-to-end: the packed stage 1 is the same math in a
    block-diagonal layout (models/resnet3d.py PackedStage1)."""
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.models.torch_import import mmvit4_variables_from_state_dict

    model_t, x_np, ref_out = ref_model_and_output
    variables = mmvit4_variables_from_state_dict(
        model_t.state_dict(), pack_stage1=True
    )
    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }

    jm = MMVit4(use_pallas=False, depth_mode="full", pack_stage1=True)
    out = np.asarray(jm.apply(variables, jnp.asarray(x_np), False))

    assert out.shape == ref_out.shape == (1, 3, 1, 224, 224)
    # same tolerance rationale as the unpacked test; the packed layout
    # only changes f32 reduction order
    np.testing.assert_allclose(out, ref_out, atol=1.5e-3, rtol=0)
    assert float(np.abs(out - ref_out).mean()) < 5e-5


def test_full_forward_matches_reference_pallas_fused(ref_model_and_output):
    """pallas_fused_blocks=True ALSO matches the torch reference: same
    param tree, the fused composition (ops/fusedconv.py — here the XLA
    reference path, CPU) is algebraically identical in eval mode
    (f64-bitwise vs the standard path, tests/test_pallas_block.py)."""
    import jax.numpy as jnp

    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.models.torch_import import mmvit4_variables_from_state_dict

    model_t, x_np, ref_out = ref_model_and_output
    variables = mmvit4_variables_from_state_dict(
        model_t.state_dict(), pack_stage1=True
    )
    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }

    jm = MMVit4(use_pallas=False, depth_mode="full", pack_stage1=True,
                pallas_fused_blocks=True)
    out = np.asarray(jm.apply(variables, jnp.asarray(x_np), False))

    assert out.shape == ref_out.shape == (1, 3, 1, 224, 224)
    np.testing.assert_allclose(out, ref_out, atol=1.5e-3, rtol=0)
    assert float(np.abs(out - ref_out).mean()) < 5e-5
