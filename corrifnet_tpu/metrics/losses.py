"""Loss functions (reference: F4_TRAIN.py:58-60, F7_TEST2.py:167-168).

The reference applies ``nn.BCEWithLogitsLoss`` to model outputs that already
went through a ``nn.Sigmoid`` head (e.g. mmvit4.py:291), i.e. a *double
sigmoid*. This quirk is load-bearing for loss parity (committed losses are
~0.60-0.66, see trainFile.txt) so the default training loss here takes the
model's sigmoid output as its "logits" input. A corrected single-sigmoid
mode is available behind ``double_sigmoid=False``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bce_with_logits", "reference_bce_loss"]


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable mean BCE-with-logits, identical to torch's
    ``nn.BCEWithLogitsLoss`` (mean reduction):

        l = max(x, 0) - x*y + log(1 + exp(-|x|))
    """
    x, y = logits, targets
    per_elem = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return per_elem.mean()


def reference_bce_loss(
    model_out: jnp.ndarray, targets: jnp.ndarray, double_sigmoid: bool = True
) -> jnp.ndarray:
    """Training/eval loss with the reference's double-sigmoid composition.

    ``model_out`` is the model head output. In parity mode (default) models
    end in sigmoid and that probability is fed to BCE-with-logits as if it
    were a logit (F4_TRAIN.py:58-60). With ``double_sigmoid=False`` the
    caller passes raw logits instead.
    """
    del double_sigmoid  # composition is decided by what the caller feeds in
    return bce_with_logits(model_out, targets)
