"""remat_mode is a scheduling knob, not a math knob: gradients through the
scanned bottleneck tail must agree across 'all' / 'mid' / 'early' / 'none'
(mid saves the named post-relu mid activations — zero in-block recompute)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.models.resnet3d import _BottleneckTail


def _grads(mode, v, x):
    model = _BottleneckTail(width=8, n=2, train=True, remat_mode=mode)

    def loss(params, xx):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            xx, mutable=["batch_stats"],
        )
        return (out.astype(jnp.float32) ** 2).mean()

    return jax.jit(jax.grad(loss, argnums=(0, 1)))(v["params"], x)


@pytest.mark.parametrize("mode", ["mid", "early", "none"])
def test_grads_match_remat_all(mode):
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 3, 6, 6, 32)).astype(np.float32)
    )
    base = _BottleneckTail(width=8, n=2, train=True, remat_mode="all")
    v = base.init({"params": jax.random.PRNGKey(1)}, x)
    ref = _grads("all", v, x)
    got = _grads(mode, v, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        ),
        ref, got,
    )
