from corrifnet_tpu.train.checkpoint import (
    Checkpointer,
    epoch_ckpt_name,
    final_ckpt_name,
)
from corrifnet_tpu.train.loop import (
    default_dropout_key,
    test_model,
    train_model,
    validate,
)
from corrifnet_tpu.train.schedule import step_lr, step_lr_reported
from corrifnet_tpu.train.state import (
    TrainState,
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_multi_step,
    make_train_step,
)

__all__ = [
    "Checkpointer",
    "epoch_ckpt_name",
    "final_ckpt_name",
    "default_dropout_key",
    "test_model",
    "train_model",
    "validate",
    "step_lr",
    "step_lr_reported",
    "TrainState",
    "init_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_multi_step",
    "make_train_step",
]
