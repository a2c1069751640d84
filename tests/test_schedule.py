"""StepLR schedule vs the committed lrFile.txt values."""

from corrifnet_tpu.train.schedule import step_lr, step_lr_reported

BASE, STEP, GAMMA = 1e-4, 5, 0.9


def test_actual_lr_matches_torch_epoch_start_step():
    # epochs 0-3 run at base LR (last_epoch = e+1 in [1..4])
    for e in range(4):
        assert abs(step_lr(BASE, STEP, GAMMA, e) - 1e-4) < 1e-12
    # epoch 4: last_epoch=5 -> one decay (actual 9e-5)
    assert abs(step_lr(BASE, STEP, GAMMA, 4) - 9e-5) < 1e-12
    # epoch 69: last_epoch=70 -> gamma^14
    assert abs(step_lr(BASE, STEP, GAMMA, 69) - 1e-4 * 0.9 ** 14) < 1e-15


def test_reported_lr_matches_committed_lrfile():
    # lrFile.txt prints get_lr() which applies an extra gamma at boundaries:
    # Epoch: 4 LR: [8.1e-05]; Epoch: 5 LR: [9e-05]; Epoch: 69 LR: [2.0589...e-05]
    assert abs(step_lr_reported(BASE, STEP, GAMMA, 0) - 1e-4) < 1e-15
    assert abs(step_lr_reported(BASE, STEP, GAMMA, 4) - 8.1e-5) < 1e-12
    assert abs(step_lr_reported(BASE, STEP, GAMMA, 5) - 9e-5) < 1e-12
    assert abs(
        step_lr_reported(BASE, STEP, GAMMA, 69) - 2.0589113209464913e-05
    ) < 1e-15
