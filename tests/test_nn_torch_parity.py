"""Building-block parity vs PyTorch layers (weights copied both ways)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.nn import BatchNorm, Conv, Dense, InstanceNorm, LayerNorm

torch = pytest.importorskip("torch")


def _vol(shape, seed=0):
    return np.random.default_rng(seed).normal(0, 1, shape).astype(np.float32)


def test_conv3d_matches_torch_zeros_pad():
    x = _vol((2, 3, 10, 10, 4))
    tconv = torch.nn.Conv3d(4, 6, (1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))
    conv = Conv(6, (1, 3, 3), strides=(1, 2, 2), padding=(0, 1, 1))
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # copy torch weights (O,I,kd,kh,kw) -> (kd,kh,kw,I,O)
    w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    params = {"kernel": jnp.asarray(w), "bias": jnp.asarray(tconv.bias.detach().numpy())}
    got = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))
    want = (
        tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
        .detach().numpy()
    )
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_conv3d_matches_torch_replicate_pad():
    x = _vol((1, 3, 8, 8, 4), seed=1)
    tconv = torch.nn.Conv3d(4, 5, 3, padding=1, padding_mode="replicate")
    conv = Conv(5, 3, padding=1, pad_mode="replicate")
    w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    params = {"kernel": jnp.asarray(w), "bias": jnp.asarray(tconv.bias.detach().numpy())}
    got = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))
    want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).detach().numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_conv3d_inflated_stem_shape():
    """The MMVit4 stem conv: (3,7,7)/(1,2,2)/(1,3,3) on (B,3,H,W,1)."""
    x = _vol((1, 3, 32, 32, 1), seed=2)
    tconv = torch.nn.Conv3d(1, 8, (3, 7, 7), stride=(1, 2, 2),
                            padding=(1, 3, 3), bias=False)
    conv = Conv(8, (3, 7, 7), strides=(1, 2, 2), padding=(1, 3, 3), use_bias=False)
    w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    got = np.asarray(conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x)))
    want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).detach().numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-4)


def test_conv3d_depth1_reduction_matches_torch():
    """Depth-1 input through a 3^3 conv (replicate and zeros padding) must
    equal torch despite the internal 2-D reduction."""
    for pad_mode, torch_mode in [("replicate", "replicate"), ("zeros", "zeros")]:
        x = _vol((2, 1, 6, 6, 4), seed=9)
        tconv = torch.nn.Conv3d(4, 5, 3, padding=1, padding_mode=torch_mode)
        conv = Conv(5, 3, padding=1, pad_mode=pad_mode)
        w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
        params = {"kernel": jnp.asarray(w),
                  "bias": jnp.asarray(tconv.bias.detach().numpy())}
        got = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))
        want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).detach().numpy()
        np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5,
                                   err_msg=pad_mode)


def test_batchnorm_train_and_eval_match_torch():
    x = _vol((4, 3, 6, 6, 5), seed=3)
    tbn = torch.nn.BatchNorm3d(5)
    bn = BatchNorm()
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    # train mode (batch stats + running-stat update)
    tbn.train()
    want = tbn(tx).detach().numpy()
    got, mut = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.moveaxis(want, 1, -1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        tbn.running_var.detach().numpy(), atol=1e-5,
    )

    # eval mode uses running stats
    tbn.eval()
    want_eval = tbn(tx).detach().numpy()
    got_eval = bn.apply(
        {"params": v["params"], "batch_stats": mut["batch_stats"]},
        jnp.asarray(x), True,
    )
    np.testing.assert_allclose(
        np.asarray(got_eval), np.moveaxis(want_eval, 1, -1), atol=1e-5
    )


def test_instancenorm_matches_torch():
    x = _vol((2, 4, 5, 5, 6), seed=4)
    tin = torch.nn.InstanceNorm3d(6)  # defaults: no affine, batch stats
    norm = InstanceNorm()
    got = norm.apply({}, jnp.asarray(x))
    want = tin(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), np.moveaxis(want, 1, -1), atol=1e-5)


def test_layernorm_matches_torch():
    x = _vol((2, 7, 16), seed=5)
    tln = torch.nn.LayerNorm(16)
    ln = LayerNorm()
    v = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = ln.apply(v, jnp.asarray(x))
    want = tln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_dense_matches_torch_linear():
    x = _vol((3, 9), seed=6)
    tlin = torch.nn.Linear(9, 4)
    dense = Dense(4)
    params = {
        "kernel": jnp.asarray(tlin.weight.detach().numpy().T),
        "bias": jnp.asarray(tlin.bias.detach().numpy()),
    }
    got = dense.apply({"params": params}, jnp.asarray(x))
    want = tlin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gelu_exact_matches_torch():
    x = jnp.asarray(_vol((100,), seed=7))
    want = torch.nn.functional.gelu(torch.from_numpy(np.asarray(x))).numpy()
    got = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_conv3d_1x1_equals_dense_token_projection():
    """The reference's 1x1x1 token convs (encode/qkv/decode convs,
    mmvit4.py:398-426) are per-token Linear layers — our Dense realization
    must match torch Conv3d exactly under weight mapping."""
    rng = np.random.default_rng(8)
    b, d, h, w, cin, cout = 2, 2, 3, 3, 16, 24
    x = rng.normal(0, 1, (b, cin, d, h, w)).astype(np.float32)
    tconv = torch.nn.Conv3d(cin, cout, 1)
    want = tconv(torch.from_numpy(x)).detach().numpy()
    # tokens in (B, N, C) with N = d*h*w in (d, h, w) row-major order —
    # exactly torch .permute(0,2,3,4,1).view(B,-1,C)
    tokens = np.moveaxis(x, 1, -1).reshape(b, -1, cin)
    dense = Dense(cout)
    params = {
        "kernel": jnp.asarray(tconv.weight.detach().numpy()[:, :, 0, 0, 0].T),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    got_tokens = np.asarray(dense.apply({"params": params}, jnp.asarray(tokens)))
    want_tokens = np.moveaxis(want, 1, -1).reshape(b, -1, cout)
    np.testing.assert_allclose(got_tokens, want_tokens, atol=1e-5)


def test_reinterpreting_reshape_matches_torch_view():
    """(B, N, C) -> (B, p, p, p, C*) row-major reuse (mmvit4.py:525-529):
    jnp.reshape must equal torch .view on contiguous tensors."""
    rng = np.random.default_rng(9)
    b, p, c = 2, 4, 8
    tokens = rng.normal(0, 1, (b, 2 * p ** 3, c)).astype(np.float32)
    want = torch.from_numpy(tokens).view(b, p, p, p, 2 * c).numpy()
    got = np.asarray(jnp.asarray(tokens).reshape(b, p, p, p, 2 * c))
    np.testing.assert_array_equal(got, want)


def test_conv3d_depth3_stride2_matches_torch():
    """Stride-2 depth decomposition (MMVit2/RFNet encoder downsamplers)."""
    for D in (2, 3, 5):
        for mode in ("replicate", "zeros"):
            x = _vol((2, D, 8, 8, 4), seed=D)
            tconv = torch.nn.Conv3d(4, 5, 3, stride=2, padding=1,
                                    padding_mode=mode)
            conv = Conv(5, 3, strides=2, padding=1, pad_mode=mode)
            w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
            params = {"kernel": jnp.asarray(w),
                      "bias": jnp.asarray(tconv.bias.detach().numpy())}
            got = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))
            want = np.moveaxis(
                tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
                .detach().numpy(), 1, -1)
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"D={D} {mode}")


@pytest.mark.parametrize(
    "shape,kh,kw,pad,cin",
    [
        ((2, 224, 224, 9), 7, 7, (3, 3), 9),     # tap-folded MMVit4 stem
        ((2, 33, 31, 3), 3, 3, (1, 1), 3),       # odd H/W RGB stem
        ((1, 20, 20, 16), 5, 5, (2, 1), 16),     # asymmetric padding
        ((1, 18, 18, 4), 4, 4, (1, 1), 4),       # even kernel
        ((1, 16, 16, 32), 2, 2, (0, 0), 32),     # eligibility edge: cin=32
    ],
)
def test_space_to_depth_stride2_conv_exact(shape, kh, kw, pad, cin):
    """The space-to-depth rewrite of a stride-(2,2) small-cin conv must be
    EXACT vs the direct lax conv (same math, reassociated only across the
    2x2 pixel blocks -> f32 tolerance at reassociation noise level)."""
    from corrifnet_tpu.nn.conv import _conv2d, _s2d_eligible

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    k = jnp.asarray(
        rng.normal(0, 0.1, (kh, kw, cin, 24)).astype(np.float32)
    )
    padding = (pad, pad)
    assert _s2d_eligible(x, k, (2, 2), padding, (1, 1), 1)
    got = _conv2d(x, k, (2, 2), padding, (1, 1), 1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding=list(padding),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_space_to_depth_not_applied_when_ineligible():
    from corrifnet_tpu.nn.conv import _s2d_eligible

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (3, 3, 8, 8)).astype(np.float32))
    pad = ((1, 1), (1, 1))
    assert not _s2d_eligible(x, k, (1, 1), pad, (1, 1), 1)    # stride 1
    assert not _s2d_eligible(x, k, (2, 2), pad, (2, 2), 1)    # dilated
    assert not _s2d_eligible(x, k, (2, 2), pad, (1, 1), 2)    # grouped
    k_wide = jnp.zeros((3, 3, 64, 8), jnp.float32)
    x_wide = jnp.zeros((1, 16, 16, 64), jnp.float32)
    assert not _s2d_eligible(x_wide, k_wide, (2, 2), pad, (1, 1), 1)  # cin


@pytest.mark.parametrize("pad_mode", ["zeros", "replicate"])
@pytest.mark.parametrize("d,depth_pad", [(5, 1), (3, 1), (2, 1), (5, (1, 0))])
def test_depth3_banded_matches_decomposed(pad_mode, d, depth_pad):
    """The depth-in-channels banded conv (small-cout fast path) must equal
    the tap-concat decomposition (torch-verified) for every depth pad mode
    the decoder uses, including the (1,0) top-edge-only variant."""
    from corrifnet_tpu.nn.conv import Conv

    cin, cout = 16, 8
    x = jnp.asarray(
        np.random.default_rng(11).normal(0, 1, (2, d, 12, 10, cin))
        .astype(np.float32)
    )
    pads = (depth_pad, 1, 1)
    m = Conv(cout, (3, 3, 3), 1, pads, pad_mode=pad_mode)
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x)
    want = m.apply(
        v, x,
        method=lambda self, xx: self._depth3_decomposed(
            xx.astype(jnp.float32),
            v["params"]["kernel"],
            v["params"]["bias"],
            (1, 1, 1),
            tuple((p, p) if isinstance(p, int) else tuple(p) for p in pads),
            (1, 1, 1),
            jnp.float32,
        ),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("pad_mode", ["zeros", "replicate"])
@pytest.mark.parametrize("depth_pad", [1, (1, 0)])
def test_depth3_shift_add_tapout_matches_decomposed(pad_mode, depth_pad):
    """The large-depth shift-add path (full-depth decoder convs) — with the
    3 depth-tap kernels folded along OUTPUT channels into one 2-D conv —
    must equal the tap-concat decomposition (torch-verified). D=20 forces
    the out_d>16 branch the full-depth decoder takes."""
    from corrifnet_tpu.nn.conv import Conv

    cin, cout, d = 12, 8, 20
    x = jnp.asarray(
        np.random.default_rng(13).normal(0, 1, (2, d, 9, 9, cin))
        .astype(np.float32)
    )
    pads = (depth_pad, 1, 1)
    m = Conv(cout, (3, 3, 3), 1, pads, pad_mode=pad_mode)
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x)  # dispatches to _depth3_shift_add at D=20
    want = m.apply(
        v, x,
        method=lambda self, xx: self._depth3_decomposed(
            xx.astype(jnp.float32),
            v["params"]["kernel"],
            v["params"]["bias"],
            (1, 1, 1),
            tuple((p, p) if isinstance(p, int) else tuple(p) for p in pads),
            (1, 1, 1),
            jnp.float32,
        ),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


