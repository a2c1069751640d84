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
