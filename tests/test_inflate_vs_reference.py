"""Inflation parity vs the reference's own ``inflate_conv``.

torchvision (and its pretrained checkpoints) are not available on this
zero-egress box, so "real weights" are stood in by a torch-initialized
ResNet50 with torchvision's exact module topology (the same stand-in the
full-model parity test uses). The test then:

  1. builds the reference ``Encoder`` (mmvit4.py:113-194), whose
     constructor runs the reference ``inflate_conv`` (mmvit4.py:83-111)
     over that ResNet50's tensors;
  2. runs our ``inflate_resnet50`` over the identical 2-D state_dict;
  3. asserts every inflated kernel in our pytree equals the corresponding
     Conv3d weight inside the reference encoder (axis order mapped
     torch (O,I,Kd,Kh,Kw) -> flax (Kd,Kh,Kw,I,O); scan tails unstacked);
  4. asserts the merged encoder forward differs from the kaiming init
     forward (the weights are live, not dead).

This closes the "inflation tested only against synthetic numpy shapes"
gap: the source tensors are real torch conv weights and the oracle is the
reference's own inflation code, not a numpy re-derivation.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_full_model_parity import _fake_resnet50, _load_reference_mmvit4

_LAYER_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}


@pytest.fixture(scope="module")
def ref_encoder_and_sd():
    ref = _load_reference_mmvit4()
    torch.manual_seed(11)
    res2d = _fake_resnet50()
    sd2d = {k: v.clone() for k, v in res2d.state_dict().items()}
    # Encoder() calls resnet50() internally; the reference bound the name at
    # import time (``from torchvision.models import resnet50``), so pin the
    # module-level binding to the instance whose state_dict we captured.
    ref.resnet50 = lambda pretrained=True, **kw: res2d
    enc = ref.Encoder(inflate_time=3).eval()
    return enc, sd2d


def _t2f(w):
    """torch Conv3d weight (O, I, Kd, Kh, Kw) -> flax kernel (Kd,Kh,Kw,I,O)."""
    return np.transpose(w.detach().numpy(), (2, 3, 4, 1, 0))


def test_every_inflated_kernel_matches_reference(ref_encoder_and_sd):
    from corrifnet_tpu.models.inflate import inflate_resnet50

    enc, sd2d = ref_encoder_and_sd
    ours = inflate_resnet50(sd2d)
    esd = enc.state_dict()

    np.testing.assert_allclose(
        ours["stem_conv"]["kernel"], _t2f(esd["e1_c1.weight"]), rtol=1e-6
    )

    for li, blocks in _LAYER_BLOCKS.items():
        e = f"e{li + 1}"  # reference names encoder stages e2..e5
        # block 0: conv1-3 + downsample (reference Bottleneck3D submodule
        # names follow its constructor args: conv1/conv2/conv3/downsample)
        b0 = ours[f"layer{li}_block0"]
        for ci in (1, 2, 3):
            np.testing.assert_allclose(
                b0[f"conv{ci}"]["kernel"],
                _t2f(esd[f"{e}.0.conv{ci}.weight"]),
                rtol=1e-6,
            )
        np.testing.assert_allclose(
            b0["down_conv"]["kernel"],
            _t2f(esd[f"{e}.0.downsample.0.weight"]),
            rtol=1e-6,
        )
        # tail blocks: stacked along axis 0 in scan order (block 1..n-1)
        tail = ours[f"layer{li}_tail"]["blocks"]["block"]
        for bi in range(1, blocks):
            for ci in (1, 2, 3):
                np.testing.assert_allclose(
                    tail[f"conv{ci}"]["kernel"][bi - 1],
                    _t2f(esd[f"{e}.{bi}.conv{ci}.weight"]),
                    rtol=1e-6,
                )


def test_merged_forward_differs_from_kaiming_init(ref_encoder_and_sd):
    """The inflated weights must actually change the computation when merged
    over a fresh init (i.e. merge_params wires them into the live tree)."""
    import jax
    import jax.numpy as jnp

    from corrifnet_tpu.models.inflate import inflate_resnet50, merge_params
    from corrifnet_tpu.models.resnet3d import ResNet3DEncoder

    _, sd2d = ref_encoder_and_sd
    enc = ResNet3DEncoder()
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (1, 3, 32, 32, 1)).astype(np.float32)
    )
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, False)
    merged = merge_params(variables["params"], inflate_resnet50(sd2d))

    out_init = enc.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x, False,
    )
    out_merged = enc.apply(
        {"params": merged, "batch_stats": variables["batch_stats"]}, x, False
    )
    # same structure, different numerics
    assert all(a.shape == b.shape for a, b in zip(out_init, out_merged))
    assert float(jnp.abs(out_init[0] - out_merged[0]).max()) > 1e-3
