"""Soft-Jaccard metrics (reference: F5_JACCARD.py, F5_JACCARD2.py).

All metrics operate on *un-thresholded* probabilities, flattened to
``(N, 1)`` columns, exactly as the reference does
(F4_TRAIN.py:68-71: ``torch.reshape(masks, (batchLoad, 1))``).

Semantics preserved bit-for-bit:
  * ``jaccard``  — F5_JACCARD.py:4-9 / F5_JACCARD2.py:4-9: soft IoU with
    epsilon smoothing, sums over axis 0.
  * ``jaccard2`` — F5_JACCARD2.py:11-20: when the ground truth is
    all-background (``y.sum(0) == 0``) BOTH masks are inverted so empty
    patches are scored on the background class.
  * ``jaccard_and_f1`` — F5_JACCARD2.py:22-37: same inversion, returns F1.

These are pure jnp functions (jit/vmap/grad friendly). The all-background
branch is implemented branchlessly with ``jnp.where`` so it traces under
``jax.jit`` (no data-dependent Python control flow — XLA-compatible).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "jaccard",
    "jaccard2",
    "jaccard_and_f1",
    "jaccard_f1_pair",
    "jaccard2_masked",
]


def jaccard(y: jnp.ndarray, y_pred: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Soft Jaccard over axis 0. Mirrors F5_JACCARD2.py:4-9."""
    tp = (y_pred * y).sum(0)
    fp = ((1 - y_pred) * y).sum(0)
    fn = ((1 - y) * y_pred).sum(0)
    return (tp + epsilon) / (tp + fp + fn + epsilon)


def _maybe_invert(y: jnp.ndarray, y_pred: jnp.ndarray):
    """All-background inversion (F5_JACCARD2.py:12-14), branchless."""
    empty = y.sum(0) == 0  # shape (1,) for (N,1) inputs, broadcasts below
    y_eff = jnp.where(empty, 1.0 - y, y)
    y_pred_eff = jnp.where(empty, 1.0 - y_pred, y_pred)
    return y_eff, y_pred_eff


def jaccard2(y: jnp.ndarray, y_pred: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Soft Jaccard with all-background inversion. Mirrors F5_JACCARD2.py:11-20."""
    y, y_pred = _maybe_invert(y, y_pred)
    return jaccard(y, y_pred, epsilon)


def jaccard2_masked(
    y: jnp.ndarray,
    y_pred: jnp.ndarray,
    valid: jnp.ndarray,
    epsilon: float = 1e-8,
) -> jnp.ndarray:
    """``jaccard2`` over the subset where ``valid`` is 1 (same shape as y).

    Used by the jitted train/eval steps: XLA needs static batch shapes, so
    ragged final batches are padded and masked out here. Identical to
    ``jaccard2`` restricted to valid rows: all sums are masked (including the
    all-background check and the post-inversion masks).
    """
    y_v = y * valid
    empty = y_v.sum(0) == 0
    y_eff = jnp.where(empty, 1.0 - y, y) * valid
    y_pred_eff = jnp.where(empty, 1.0 - y_pred, y_pred) * valid
    tp = (y_pred_eff * y_eff).sum(0)
    fp = ((valid - y_pred_eff) * y_eff).sum(0)
    fn = ((valid - y_eff) * y_pred_eff).sum(0)
    return (tp + epsilon) / (tp + fp + fn + epsilon)


def jaccard_and_f1(y: jnp.ndarray, y_pred: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """F1 (dice-style) with all-background inversion. Mirrors F5_JACCARD2.py:22-37.

    Note: despite its name, the reference function returns *only* F1.
    Use :func:`jaccard_f1_pair` to get both in one pass.
    """
    y, y_pred = _maybe_invert(y, y_pred)
    tp = (y_pred * y).sum(0)
    fp = ((1 - y_pred) * y).sum(0)
    fn = ((1 - y) * y_pred).sum(0)
    recall = tp / (tp + fn + epsilon)
    prec = tp / (tp + fp + epsilon)
    return 2 * (recall * prec) / (recall + prec + epsilon)


def jaccard_f1_pair(y: jnp.ndarray, y_pred: jnp.ndarray, epsilon: float = 1e-8):
    """(jaccard2, f1) computed in a single fused pass (used by run.evaluate)."""
    y, y_pred = _maybe_invert(y, y_pred)
    tp = (y_pred * y).sum(0)
    fp = ((1 - y_pred) * y).sum(0)
    fn = ((1 - y) * y_pred).sum(0)
    jack = (tp + epsilon) / (tp + fp + fn + epsilon)
    recall = tp / (tp + fn + epsilon)
    prec = tp / (tp + fp + epsilon)
    f1 = 2 * (recall * prec) / (recall + prec + epsilon)
    return jack, f1
