"""Batch re-evaluation (allJaccardResults equivalent): per-image Jaccard/F1
from a restored final checkpoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as fnn

from corrifnet_tpu.data import synthetic_dstl
from corrifnet_tpu.metrics import jaccard2, jaccard_and_f1
from corrifnet_tpu.run.evaluate import per_image_metrics, read_manifest


class TinySeg5D(fnn.Module):
    @fnn.compact
    def __call__(self, x, train: bool = True):
        b, m, c, h, w = x.shape
        y = jnp.moveaxis(x.reshape(b, m * c, h, w), 1, -1)
        y = fnn.Conv(3, (1, 1))(y)
        y = jax.nn.sigmoid(y)
        return jnp.moveaxis(y, -1, 1)[:, :, None, :, :]


def test_per_image_metrics_match_direct_computation():
    d = synthetic_dstl(6, lim=16, seed=0)
    model = TinySeg5D()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(d.images[:1]), False)
    idx = np.arange(6)
    jacks, f1s = per_image_metrics(
        model, variables["params"], {}, d.images, d.masks, idx, batch_size=4
    )
    assert jacks.shape == (6,) and f1s.shape == (6,)

    # direct per-image oracle (batch size 1, allJaccardResults:208-240)
    for i in range(6):
        out = model.apply(variables, jnp.asarray(d.images[i : i + 1]), False)
        m0 = np.asarray(d.masks[i : i + 1, 0]).reshape(-1, 1)
        o0 = np.asarray(out[:, 0]).reshape(-1, 1)
        want_j = float(jaccard2(jnp.asarray(m0), jnp.asarray(o0))[0])
        want_f = float(jaccard_and_f1(jnp.asarray(m0), jnp.asarray(o0))[0])
        np.testing.assert_allclose(jacks[i], want_j, rtol=1e-5)
        np.testing.assert_allclose(f1s[i], want_f, rtol=1e-5)


def test_read_manifest(tmp_path):
    """Alternating run-name / run-dir lines (allJaccardResults:45-52)."""
    p = tmp_path / "irem-input-dstl.txt"
    p.write_text("runA\n/path/a\nrunB\n/path/b\n")
    assert read_manifest(p) == [("runA", "/path/a"), ("runB", "/path/b")]


def test_per_image_metrics_sharded_equals_unsharded():
    """Data-parallel evaluation over an 8-virtual-device ('data','model')
    mesh produces the same per-image metrics as single-device."""
    from corrifnet_tpu.parallel import make_mesh

    d = synthetic_dstl(12, lim=16, seed=3)
    model = TinySeg5D()
    variables = model.init({"params": jax.random.PRNGKey(1)},
                           jnp.asarray(d.images[:1]), False)
    idx = np.arange(12)
    base_j, base_f = per_image_metrics(
        model, variables["params"], {}, d.images, d.masks, idx, batch_size=8
    )
    mesh = make_mesh((4, 2))
    sh_j, sh_f = per_image_metrics(
        model, variables["params"], {}, d.images, d.masks, idx,
        batch_size=8, mesh=mesh,
    )
    np.testing.assert_allclose(sh_j, base_j, rtol=1e-6)
    np.testing.assert_allclose(sh_f, base_f, rtol=1e-6)
