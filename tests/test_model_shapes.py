"""Shape/param-structure contracts for the full model zoo via
jax.eval_shape — tracing only, no XLA compile (fast on constrained CI).

Each model must accept the reference's input layout and emit the
reference's output layout:
  5-D models: (B, 3, 3, 224, 224) -> (B, 3, 1, 224, 224)
  4-D models: (B, 3, 224, 224)    -> (B, 1, 224, 224)
"""

import jax
import jax.numpy as jnp
import pytest

from corrifnet_tpu.models import available_models, create_model, get_spec

B = 2
LIM = 224


def _shapes(modeltype):
    spec = get_spec(modeltype)
    model = create_model(modeltype) if modeltype != "MMVit4" else create_model(
        modeltype, use_pallas=False
    )
    if spec.input_kind == "5d":
        x = jnp.zeros((B, 3, 3, LIM, LIM), jnp.float32)
    else:
        x = jnp.zeros((B, 3, LIM, LIM), jnp.float32)

    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, False)
    )
    out = jax.eval_shape(
        lambda v: model.apply(v, x, False),
        variables,
    )
    n_params = sum(
        int(jnp.prod(jnp.asarray(p.shape))) for p in jax.tree.leaves(variables["params"])
    )
    return out.shape, n_params


EXPECTED = {
    # modeltype: (output shape, min params, max params)
    "MMVit4": ((B, 3, 1, LIM, LIM), 80e6, 95e6),
    "MMVit2": ((B, 3, 1, LIM, LIM), 8e6, 20e6),
    "mmformer": ((B, 3, 1, LIM, LIM), 5e6, 18e6),
    "RFNet": ((B, 3, 1, LIM, LIM), 1e6, 15e6),
    "RobustMseg": ((B, 3, 1, LIM, LIM), 3e6, 30e6),
    "MultiSenseSeg": ((B, 3, 1, LIM, LIM), 20e6, 80e6),
    "UNetV2": ((B, 1, LIM, LIM), 10e6, 18e6),
    "DeepLabv3_plus": ((B, 1, LIM, LIM), 30e6, 60e6),
    "Segformer": ((B, 1, LIM, LIM), 5e6, 12e6),
    "FASSDNet": ((B, 1, LIM, LIM), 2e6, 4e6),
    "ENet": ((B, 1, LIM, LIM), 0.2e6, 0.6e6),
    "ELANet": ((B, 1, LIM, LIM), 0.3e6, 3e6),
}


@pytest.mark.parametrize("modeltype", sorted(EXPECTED))
def test_model_shape_contract(modeltype):
    out_shape, n_params = _shapes(modeltype)
    want_shape, lo, hi = EXPECTED[modeltype]
    assert tuple(out_shape) == want_shape, (modeltype, out_shape)
    assert lo <= n_params <= hi, (modeltype, n_params)


def test_every_available_model_covered():
    assert set(available_models()) == set(EXPECTED)


def test_multisenseseg_use_faster_and_aux():
    """use_faster CNN backbone (MultiSenseSeg.py:1231,845-892) + aux head
    (MultiSenseSeg.py:1251-1256): same output contract, aux map sown."""
    from corrifnet_tpu.models.multisenseseg import MultiSenseSeg

    model = MultiSenseSeg(use_faster=True, aux=True)
    x = jnp.zeros((B, 3, 3, LIM, LIM), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, False)
    )
    out, inter = jax.eval_shape(
        lambda v: model.apply(v, x, False, mutable=["intermediates"]),
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )
    assert tuple(out.shape) == (B, 3, 1, LIM, LIM)
    (aux,) = inter["intermediates"]["aux_out"]
    # penultimate CNN level: H/16, channels n_classes
    assert tuple(aux.shape) == (B, 1, LIM // 16, LIM // 16)
    # the Swin stages are gone: no backbone window-attention params
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    assert not any("stage0_block0" in n for n in names)
    assert any("layer4_block2" in n for n in names)


def test_robustseg_style_noise_path():
    """style_noise == the reference's valid=True branch (RobustSeg.py:61-62):
    forward runs with noise-replaced style codes; output contract unchanged."""
    from corrifnet_tpu.models.robustseg import RobustMseg

    model = RobustMseg(style_noise=True)
    x = jnp.zeros((B, 3, 3, LIM, LIM), jnp.float32)
    out = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "style_noise": jax.random.PRNGKey(1)},
            x,
            False,
        )
    )
    o = jax.eval_shape(
        lambda v: model.apply(
            v, x, False, rngs={"style_noise": jax.random.PRNGKey(2)}
        ),
        out,
    )
    assert tuple(o.shape) == (B, 3, 1, LIM, LIM)
