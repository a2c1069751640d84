"""Full Transformer block vs a NumPy oracle of the reference structure
(mmvit4.py:360-388): x += pos; x += Drop(Attn(LN(x))); x += FFN(LN(x)).

The oracle re-implements the documented math independently (pre-norm MHA
with qkv bias-free / proj biased, exact GELU FFN) using the module's own
extracted parameters — catching composition-order or reshape mistakes that
per-layer parity tests cannot."""

import jax
import jax.numpy as jnp
import numpy as np

from corrifnet_tpu.nn import Transformer


def np_layernorm(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_gelu(x):
    from scipy.stats import norm  # exact GELU via the normal CDF

    return x * norm.cdf(x)


def np_transformer(x, pos, p, heads):
    x = x + pos
    # attention (depth 0 names)
    ln = p["attn_norm_0"]
    y = np_layernorm(x, np.asarray(ln["scale"]), np.asarray(ln["bias"]))
    a = p["attn_0"]
    qkv = y @ np.asarray(a["qkv"]["kernel"])
    b_, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    qkv = qkv.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = np_softmax((q @ k.transpose(0, 1, 3, 2)) * hd ** -0.5)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    o = o @ np.asarray(a["proj"]["kernel"]) + np.asarray(a["proj"]["bias"])
    x = x + o
    # ffn
    ln2 = p["ffn_norm_0"]
    y = np_layernorm(x, np.asarray(ln2["scale"]), np.asarray(ln2["bias"]))
    f = p["ffn_0"]
    h = y @ np.asarray(f["fc1"]["kernel"]) + np.asarray(f["fc1"]["bias"])
    h = np_gelu(h)
    h = h @ np.asarray(f["fc2"]["kernel"]) + np.asarray(f["fc2"]["bias"])
    return x + h


def test_transformer_matches_numpy_oracle():
    try:
        import scipy  # noqa: F401
    except ImportError:
        import pytest

        pytest.skip("scipy unavailable")
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 6, 32)).astype(np.float32)
    pos = rng.normal(0, 0.1, (1, 6, 32)).astype(np.float32)
    model = Transformer(32, depth=1, heads=4, mlp_dim=48, dropout_rate=0.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(pos)
    )
    got = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(pos)))
    want = np_transformer(
        x.astype(np.float64), pos.astype(np.float64), variables["params"], heads=4
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
