"""Orphan-library blocks (extras): shape contracts + basic semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from corrifnet_tpu.models.extras import (
    Bag,
    BasicBlock2d,
    Bottleneck2d,
    CrossAttention,
    CrossAttentionBlock,
    DAPPM,
    PagFM,
    SegmentHead,
)


def _init_apply(mod, *args, **kw):
    variables = mod.init({"params": jax.random.PRNGKey(0)}, *args, **kw)
    return mod.apply(variables, *args, **kw)


def test_basicblock_and_bottleneck():
    x = jnp.ones((2, 8, 8, 16))
    out = _init_apply(BasicBlock2d(planes=32, stride=2), x, False)
    assert out.shape == (2, 4, 4, 32)
    out = _init_apply(Bottleneck2d(planes=16), x, False)
    assert out.shape == (2, 8, 8, 32)  # expansion 2


def test_segmenthead_scaleup():
    x = jnp.ones((1, 8, 8, 32))
    out = _init_apply(SegmentHead(interplanes=16, outplanes=2, scale_factor=4), x, False)
    assert out.shape == (1, 32, 32, 2)


def test_dappm():
    x = jnp.ones((1, 32, 32, 64))
    out = _init_apply(DAPPM(branch_planes=24, outplanes=64), x, False)
    assert out.shape == (1, 32, 32, 64)


def test_pagfm_blends_between_inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
    out = _init_apply(PagFM(mid_channels=4), x, y, False)
    assert out.shape == x.shape
    # output is a convex blend of x and upsampled y -> bounded by their range
    assert float(jnp.abs(out).max()) < float(jnp.abs(x).max() + jnp.abs(y).max())


def test_bag():
    x = jnp.ones((1, 8, 8, 16))
    out = _init_apply(Bag(out_channels=16), x, x * 2, x * 0.5, False)
    assert out.shape == (1, 8, 8, 16)


def test_cross_attention_outputs_cls_token():
    x = jnp.ones((2, 10, 32))
    out = _init_apply(CrossAttention(dim=32, num_heads=4), x)
    assert out.shape == (2, 1, 32)
    out = _init_apply(CrossAttentionBlock(dim=32, num_heads=4), x)
    assert out.shape == (2, 1, 32)


def test_pappm_shape():
    from corrifnet_tpu.models.extras import PAPPM

    x = jnp.ones((1, 64, 64, 32))
    out = _init_apply(PAPPM(branch_planes=16, outplanes=40), x, False)
    assert out.shape == (1, 64, 64, 40)


def test_multiscale_block_shapes():
    from corrifnet_tpu.models.extras import MultiScaleBlock

    xs = (jnp.ones((2, 17, 32)), jnp.ones((2, 25, 48)))
    mod = MultiScaleBlock(dims=(32, 48), depths=(1, 1, 1),
                          num_heads=(4, 6), mlp_ratios=(2.0, 2.0, 2.0))
    variables = mod.init({"params": jax.random.PRNGKey(0)}, xs)
    outs = mod.apply(variables, xs)
    assert outs[0].shape == (2, 17, 32) and outs[1].shape == (2, 25, 48)
    # the dead per-branch Blocks still create their params (state-dict parity)
    assert "block0_0" in variables["params"] and "block1_0" in variables["params"]


# ---------------------------------------------------------------------------
# torch parity (same methodology as tests/test_full_model_parity_zoo.py:
# import the actual reference module, convert its state-dict, compare
# eval forwards)
# ---------------------------------------------------------------------------

import importlib.util
import sys

import pytest

REFERENCE_DIR = "/root/reference"


def _load_ref(fname, module_name):
    spec = importlib.util.spec_from_file_location(
        module_name, f"{REFERENCE_DIR}/{fname}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def _conv2(sd, key):
    import numpy as _np_mod
    out = {"kernel": _np_mod.transpose(sd[f"{key}.weight"].numpy(), (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"].numpy()
    return out


def _lin(sd, key):
    out = {"kernel": sd[f"{key}.weight"].numpy().T}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"].numpy()
    return out


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"].numpy(),
            "bias": sd[f"{key}.bias"].numpy()}


def test_pappm_torch_parity():
    torch = pytest.importorskip("torch")
    mu = _load_ref("model_utils.py", "ref_model_utils_extras")
    ref = mu.PAPPM(32, 16, 40)
    rng = np.random.default_rng(0)
    sd = ref.state_dict()
    for k in list(sd):
        v = sd[k]
        if v.dtype != torch.float32:
            continue
        if "running_var" in k:
            sd[k] = torch.from_numpy(
                rng.uniform(0.5, 2.0, tuple(v.shape)).astype(np.float32))
        else:
            sd[k] = torch.from_numpy(
                rng.normal(0, 0.5, tuple(v.shape)).astype(np.float32))
    ref.load_state_dict(sd)
    ref.eval()
    x = rng.normal(0, 1, (1, 32, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    from corrifnet_tpu.models.torch_import import _bn

    params, stats = {}, {}

    def seq(name, bn_i, conv_i):
        p, s = _bn(sd, f"{name}.{bn_i}")
        params[f"{name}_bn"], stats[f"{name}_bn"] = p, s
        params[f"{name}_conv"] = _conv2(sd, f"{name}.{conv_i}")

    seq("scale0", 0, 2)
    for i in (1, 2, 3):
        seq(f"scale{i}", 1, 3)
    seq("scale4", 1, 3)
    seq("scale_process", 0, 2)
    seq("compression", 0, 2)
    seq("shortcut", 0, 2)

    from corrifnet_tpu.models.extras import PAPPM

    out = PAPPM(branch_planes=16, outplanes=40).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(x, 1, -1)), False)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref_out, atol=5e-5, rtol=1e-4)


def _install_timm(torch):
    """Functional timm stand-in: the reference's utils.py imports Block/Mlp
    from timm.models.vision_transformer (utils.py:7-8); timm is absent on
    this box, and the generic attribute-stub other tests use cannot RUN.
    This installs the standard timm ViT Block (the definition
    extras.Block mirrors) so the orphan MultiScaleBlock can execute."""
    import types

    nn = torch.nn

    class _Mlp(nn.Module):
        def __init__(self, in_features, hidden_features, act_layer=nn.GELU,
                     drop=0.0):
            super().__init__()
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class _Attention(nn.Module):
        def __init__(self, dim, num_heads, qkv_bias):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            b, n, c = x.shape
            qkv = self.qkv(x).reshape(
                b, n, 3, self.num_heads, c // self.num_heads
            ).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(b, n, c))

    class _Block(nn.Module):
        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                     drop=0.0, attn_drop=0.0, drop_path=0.0,
                     act_layer=nn.GELU, norm_layer=nn.LayerNorm):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = _Attention(dim, num_heads, qkv_bias)
            self.norm2 = norm_layer(dim)
            self.mlp = _Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    def _mk(name):
        m = types.ModuleType(name)
        m.__getattr__ = lambda attr: (lambda *a, **k: None)
        sys.modules[name] = m
        return m

    timm = _mk("timm")
    models = _mk("timm.models")
    vt = _mk("timm.models.vision_transformer")
    vt.Block, vt.Mlp, vt._cfg = _Block, _Mlp, (lambda **k: {})
    layers = _mk("timm.models.layers")
    layers.DropPath = lambda p=0.0: nn.Identity()
    layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    layers.trunc_normal_ = lambda *a, **k: None
    timm.models = models
    models.vision_transformer, models.layers = vt, layers


def test_multiscale_block_torch_parity():
    torch = pytest.importorskip("torch")
    _install_timm(torch)
    utils = _load_ref("utils.py", "ref_utils_extras")

    dims, depths, heads = (32, 48), (1, 1, 1), (4, 6)
    mlp = (2.0, 2.0, 2.0)
    ref = utils.MultiScaleBlock(
        dim=dims, patches=(16, 24), depth=depths, num_heads=heads,
        mlp_ratio=mlp, qkv_bias=True, drop_path=[0.0, 0.0])
    ref.eval()
    sd = ref.state_dict()
    rng = np.random.default_rng(1)
    x0 = rng.normal(0, 1, (2, 17, 32)).astype(np.float32)
    x1 = rng.normal(0, 1, (2, 25, 48)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref([torch.from_numpy(x0), torch.from_numpy(x1)])
    ref_outs = [t.numpy() for t in ref_outs]

    params = {}
    for d in range(2):
        params[f"proj{d}_norm"] = _ln(sd, f"projs.{d}.0")
        params[f"proj{d}_fc"] = _lin(sd, f"projs.{d}.2")
        params[f"revert{d}_norm"] = _ln(sd, f"revert_projs.{d}.0")
        params[f"revert{d}_fc"] = _lin(sd, f"revert_projs.{d}.2")
        # fusion: Sequential of depth[-1] CrossAttentionBlocks
        for j in range(depths[-1]):
            fp = {"norm1": _ln(sd, f"fusion.{d}.{j}.norm1"),
                  "attn": {n: _lin(sd, f"fusion.{d}.{j}.attn.{n}")
                           for n in ("wq", "wk", "wv", "proj")}}
            params[f"fusion{d}_{j}"] = fp
        # dead per-branch Blocks
        for i in range(depths[d]):
            params[f"block{d}_{i}"] = {
                "norm1": _ln(sd, f"blocks.{d}.{i}.norm1"),
                "qkv": _lin(sd, f"blocks.{d}.{i}.attn.qkv"),
                "proj": _lin(sd, f"blocks.{d}.{i}.attn.proj"),
                "norm2": _ln(sd, f"blocks.{d}.{i}.norm2"),
                "fc1": _lin(sd, f"blocks.{d}.{i}.mlp.fc1"),
                "fc2": _lin(sd, f"blocks.{d}.{i}.mlp.fc2"),
            }

    from corrifnet_tpu.models.extras import MultiScaleBlock

    outs = MultiScaleBlock(
        dims=dims, depths=depths, num_heads=heads, mlp_ratios=mlp,
        qkv_bias=True,
    ).apply({"params": params}, (jnp.asarray(x0), jnp.asarray(x1)))
    for mine, theirs in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(mine), theirs,
                                   atol=2e-5, rtol=1e-4)
