"""Golden tests for metrics vs a NumPy oracle of the reference functions.

Oracle is a direct NumPy port of F5_JACCARD2.py:4-37 (including the
all-background inversion) — written here independently so the jnp
implementation is cross-checked, not self-checked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrifnet_tpu.metrics import (
    bce_with_logits,
    jaccard,
    jaccard2,
    jaccard_and_f1,
    jaccard_f1_pair,
)


def np_jaccard(y, y_pred, epsilon=1e-8):
    TP = (y_pred * y).sum(0)
    FP = ((1 - y_pred) * y).sum(0)
    FN = ((1 - y) * y_pred).sum(0)
    return (TP + epsilon) / (TP + FP + FN + epsilon)


def np_jaccard2(y, y_pred, epsilon=1e-8):
    if y.sum(0) == 0:
        y = 1 - y
        y_pred = 1 - y_pred
    return np_jaccard(y, y_pred, epsilon)


def np_f1(y, y_pred, epsilon=1e-8):
    if y.sum(0) == 0:
        y = 1 - y
        y_pred = 1 - y_pred
    TP = (y_pred * y).sum(0)
    FP = ((1 - y_pred) * y).sum(0)
    FN = ((1 - y) * y_pred).sum(0)
    recall = TP / (TP + FN + epsilon)
    prec = TP / (TP + FP + epsilon)
    return 2 * (recall * prec) / (recall + prec + epsilon)


@pytest.fixture
def rand_pair():
    rng = np.random.default_rng(0)
    y = (rng.random((1000, 1)) > 0.7).astype(np.float32)
    y_pred = rng.random((1000, 1)).astype(np.float32)
    return y, y_pred


def test_jaccard_matches_oracle(rand_pair):
    y, y_pred = rand_pair
    np.testing.assert_allclose(
        np.asarray(jaccard(jnp.asarray(y), jnp.asarray(y_pred))),
        np_jaccard(y, y_pred),
        rtol=1e-6,
    )


def test_jaccard2_matches_oracle(rand_pair):
    y, y_pred = rand_pair
    np.testing.assert_allclose(
        np.asarray(jaccard2(jnp.asarray(y), jnp.asarray(y_pred))),
        np_jaccard2(y, y_pred),
        rtol=1e-6,
    )


def test_jaccard2_all_background_inversion():
    """F5_JACCARD2.py:12-14 — empty GT scores on the background class."""
    rng = np.random.default_rng(1)
    y = np.zeros((500, 1), np.float32)
    y_pred = rng.random((500, 1)).astype(np.float32)
    ours = np.asarray(jaccard2(jnp.asarray(y), jnp.asarray(y_pred)))
    np.testing.assert_allclose(ours, np_jaccard2(y, y_pred), rtol=1e-6)
    # inversion means a perfect all-background prediction scores ~1
    perfect = np.asarray(jaccard2(jnp.asarray(y), jnp.zeros_like(y)))
    assert perfect[0] > 0.999


def test_jaccard2_is_jittable(rand_pair):
    y, y_pred = rand_pair
    f = jax.jit(jaccard2)
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(y), jnp.asarray(y_pred))),
        np_jaccard2(y, y_pred),
        rtol=1e-6,
    )


def test_f1_matches_oracle(rand_pair):
    y, y_pred = rand_pair
    np.testing.assert_allclose(
        np.asarray(jaccard_and_f1(jnp.asarray(y), jnp.asarray(y_pred))),
        np_f1(y, y_pred),
        rtol=1e-6,
    )
    jac, f1 = jaccard_f1_pair(jnp.asarray(y), jnp.asarray(y_pred))
    np.testing.assert_allclose(np.asarray(f1), np_f1(y, y_pred), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jac), np_jaccard2(y, y_pred), rtol=1e-6)


def test_bce_with_logits_matches_torch_formula():
    """Check against torch.nn.BCEWithLogitsLoss (CPU torch is available)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(0, 3, size=(64, 7)).astype(np.float32)
    y = rng.random((64, 7)).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(x), torch.from_numpy(y))
    got = bce_with_logits(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_double_sigmoid_composition():
    """Parity: loss(σ(z), y) should equal torch's BCEWithLogits(σ(z), y)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    z = rng.normal(0, 2, size=(32, 4)).astype(np.float32)
    y = (rng.random((32, 4)) > 0.5).astype(np.float32)
    probs = 1 / (1 + np.exp(-z))
    want = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(probs), torch.from_numpy(y))
    got = bce_with_logits(jnp.asarray(probs), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_jaccard2_masked_all_background_with_padding():
    """The all-background inversion must not count padded rows as background
    (padding interacts with the inversion: inverted y would be 1 there)."""
    from corrifnet_tpu.metrics import jaccard2, jaccard2_masked

    rng = np.random.default_rng(4)
    y = np.zeros((100, 1), np.float32)  # all background
    y_pred = rng.random((100, 1)).astype(np.float32)
    want = np_jaccard2(y, y_pred)

    pad = np.zeros((40, 1), np.float32)
    y_p = np.concatenate([y, pad])
    yp_p = np.concatenate([y_pred, np.full((40, 1), 0.9, np.float32)])
    valid = np.concatenate([np.ones((100, 1)), np.zeros((40, 1))]).astype(np.float32)
    got = jaccard2_masked(jnp.asarray(y_p), jnp.asarray(yp_p), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    # and with a non-empty mask
    y2 = (rng.random((100, 1)) > 0.6).astype(np.float32)
    want2 = np_jaccard2(y2, y_pred)
    y2_p = np.concatenate([y2, pad])
    got2 = jaccard2_masked(jnp.asarray(y2_p), jnp.asarray(yp_p), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-6)
