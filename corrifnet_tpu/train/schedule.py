"""LR schedule matching the reference's StepLR usage (F4_TRAIN.py:46).

The reference calls ``scheduler.step()`` at the *start* of every epoch (a
known torch anti-pattern kept for parity), so during epoch ``e`` torch's
``last_epoch`` equals ``e+1`` and the LR actually applied by the optimizer is

    lr(e) = base_lr * gamma ** ((e + 1) // step_size)

Verified against the committed lrFile.txt: epoch 69 runs at
1e-4 * 0.9^14 = 2.287e-5 while the *printed* ``scheduler.get_lr()`` value is
2.059e-5 = 1e-4 * 0.9^15 — torch's chainable ``get_lr()`` returns an extra
``*gamma`` when called outside ``step()`` at boundary epochs
(``last_epoch % step_size == 0``). Both values are exposed so the log files
byte-match the reference format.
"""

from __future__ import annotations

__all__ = ["step_lr", "step_lr_reported"]


def step_lr(base_lr: float, step_size: int, gamma: float, epoch: int) -> float:
    """The LR the optimizer actually uses during ``epoch`` (0-based)."""
    return base_lr * gamma ** ((epoch + 1) // step_size)


def step_lr_reported(base_lr: float, step_size: int, gamma: float, epoch: int) -> float:
    """What the reference prints/logs for ``epoch`` (get_lr() anomaly incl.)."""
    last_epoch = epoch + 1
    lr = base_lr * gamma ** (last_epoch // step_size)
    if last_epoch % step_size == 0 and last_epoch > 0:
        lr *= gamma
    return lr
