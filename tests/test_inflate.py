"""Weight inflation: ResNet50-shaped state_dict -> ResNet3DEncoder params;
rule parity with mmvit4.py:83-111. torchvision is not in this image, so a
synthetic state_dict with resnet50's exact tensor shapes stands in."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.models.inflate import inflate_resnet50, merge_params
from corrifnet_tpu.models.resnet3d import ResNet3DEncoder


def _fake_resnet50_state_dict(seed=0):
    """Conv weights with torchvision resnet50's shapes/names."""
    rng = np.random.default_rng(seed)
    sd = {"conv1.weight": rng.normal(0, 1, (64, 3, 7, 7)).astype(np.float32)}
    layers = {1: (3, 64, 256, 64), 2: (4, 128, 512, 256),
              3: (6, 256, 1024, 512), 4: (3, 512, 2048, 1024)}
    for li, (blocks, width, out_ch, in_ch) in layers.items():
        for bi in range(blocks):
            cin = in_ch if bi == 0 else out_ch
            sd[f"layer{li}.{bi}.conv1.weight"] = rng.normal(
                0, 1, (width, cin, 1, 1)).astype(np.float32)
            sd[f"layer{li}.{bi}.conv2.weight"] = rng.normal(
                0, 1, (width, width, 3, 3)).astype(np.float32)
            sd[f"layer{li}.{bi}.conv3.weight"] = rng.normal(
                0, 1, (out_ch, width, 1, 1)).astype(np.float32)
        sd[f"layer{li}.0.downsample.0.weight"] = rng.normal(
            0, 1, (out_ch, in_ch, 1, 1)).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def sd():
    return _fake_resnet50_state_dict()


def test_stem_inflation_rule(sd):
    """Stem: mean over RGB, repeated over depth (mmvit4.py:100-102)."""
    inflated = inflate_resnet50(sd)
    k = inflated["stem_conv"]["kernel"]  # (3, 7, 7, 1, 64)
    assert k.shape == (3, 7, 7, 1, 64)
    w2d = sd["conv1.weight"]  # (64, 3, 7, 7)
    want = w2d.mean(axis=1)  # (64, 7, 7)
    for t in range(3):
        np.testing.assert_allclose(
            k[t, :, :, 0, :], want.transpose(1, 2, 0), rtol=1e-6
        )


def test_bottleneck_inflation_rule(sd):
    """time_dim=1 convs: unsqueeze / 1 (mmvit4.py:105)."""
    inflated = inflate_resnet50(sd)
    k = inflated["layer1_block0"]["conv2"]["kernel"]  # (1, 3, 3, 64, 64)
    w2d = sd["layer1.0.conv2.weight"]  # (64, 64, 3, 3)
    np.testing.assert_allclose(
        k[0], w2d.transpose(2, 3, 1, 0), rtol=1e-6
    )


def test_merge_into_encoder_params(sd):
    """Inflated kernels must slot into a fresh encoder tree with matching
    shapes (scan-tail kernels stacked) and BNs untouched."""
    enc = ResNet3DEncoder()
    x = jnp.zeros((1, 3, 32, 32, 1), jnp.float32)
    variables = jax.eval_shape(
        lambda: enc.init({"params": jax.random.PRNGKey(0)}, x, False)
    )
    shapes = jax.tree.map(lambda s: s.shape, variables["params"])

    inflated = inflate_resnet50(sd)
    # every inflated path must exist with the right shape
    def check(dst, src, path=""):
        for key, v in src.items():
            assert key in dst, (path, key)
            if isinstance(v, dict):
                check(dst[key], v, path + "/" + key)
            else:
                assert tuple(dst[key]) == tuple(v.shape), (path, key, dst[key], v.shape)

    check(shapes, inflated)
    # tail stacking: layer1 has 3 blocks -> 2 stacked
    assert inflated["layer1_tail"]["blocks"]["block"]["conv1"]["kernel"].shape[0] == 2
    assert inflated["layer3_tail"]["blocks"]["block"]["conv1"]["kernel"].shape[0] == 5
