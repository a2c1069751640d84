"""Mid-training resume through the experiment driver (run.main --resume).

Capability the reference lacks (it saves weights only, F4_TRAIN.py:84):
with ``extended_checkpoints=true`` the full TrainState is saved each epoch
and a killed run continues bitwise-identically — a 2-epoch run resumed for
2 more must equal an uninterrupted 4-epoch run in final weights, metrics,
and log-file contents, even when the kill left a partial epoch in the logs.
"""

import numpy as np
import pytest
from flax import linen as fnn
import jax
import jax.numpy as jnp

from corrifnet_tpu.config import ExperimentConfig
from corrifnet_tpu.models import registry
from corrifnet_tpu.run.main import run_experiment


class TinySeg5D(fnn.Module):
    dtype: object = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        b, m, c, h, w = x.shape
        y = jnp.moveaxis(x.reshape(b, m * c, h, w), 1, -1)
        y = fnn.Conv(4, (3, 3), padding="SAME")(y)
        y = jax.nn.relu(y)
        y = fnn.Conv(3, (1, 1))(y)
        y = jax.nn.sigmoid(y)
        return jnp.moveaxis(y, -1, 1)[:, :, None, :, :]


@pytest.fixture(autouse=True)
def _register_tiny():
    registry._REGISTRY["TinySeg5D"] = registry.ModelSpec(
        "TinySeg5D", TinySeg5D, "5d", "test stand-in", True
    )
    yield
    registry._REGISTRY.pop("TinySeg5D", None)


def _cfg(n_epochs):
    return ExperimentConfig(
        train_set_size=24, fno=1, fsiz=4, mini_batch_size=4,
        n_epochs=n_epochs, learn_rate=1e-3, modeltype="TinySeg5D",
        lim=224, synthetic_seed=0, dtype="float32",
        extended_checkpoints=True,
        # pinned ON: resume through the CLI must keep exercising the
        # auto-layout canary path (the r3 aliasing crash) now that the
        # config default is off
        auto_layout=True,
    )


def _restore_final(run_dir):
    import orbax.checkpoint as ocp
    from pathlib import Path

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(run_dir).resolve() / "Finaliremmodel0")


def test_resume_matches_uninterrupted(tmp_path):
    from corrifnet_tpu.data import write_permutation
    import corrifnet_tpu.data.crossval as cv

    write_permutation(24, tmp_path, seed=0)
    old = cv._SPLITS_DIR
    cv._SPLITS_DIR = tmp_path
    try:
        # A: uninterrupted 4 epochs
        res_a = run_experiment(_cfg(4), run_root=tmp_path / "a", index=0)
        # B: 2 epochs ...
        res_b = run_experiment(_cfg(2), run_root=tmp_path / "b", index=0)
        run_b = res_b["run_dir"]
        # ... simulate a kill mid-epoch-3: train lines written, no val yet
        from pathlib import Path

        for name, junk in [("trainFile.txt", "0.123\n"),
                           ("trainaccFile.txt", "0.456\n"),
                           ("trainepochFile.txt", "2\n"),
                           ("lrFile.txt", "Epoch: 2 LR: [0.001]\n{}\n")]:
            with open(Path(run_b) / name, "a") as f:
                f.write(junk)
        # ... resumed to 4
        res_b2 = run_experiment(_cfg(4), index=0, resume_dir=run_b)
        assert res_b2["run_dir"] == run_b
    finally:
        cv._SPLITS_DIR = old

    # final weights bitwise identical
    fa, fb = _restore_final(res_a["run_dir"]), _restore_final(run_b)
    for pa, pb in zip(jax.tree_util.tree_leaves(fa),
                      jax.tree_util.tree_leaves(fb)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    # metrics and merged history identical
    assert res_b2["test_jaccard"] == res_a["test_jaccard"]
    assert res_b2["test_loss"] == res_a["test_loss"]
    for k in ("train_loss", "train_jac", "val_loss", "val_jac"):
        assert res_b2["history"][k] == res_a["history"][k], k
        assert len(res_b2["history"][k]) == 4

    # log files byte-identical (partial epoch truncated, continuation clean)
    from pathlib import Path

    for name in ("trainFile.txt", "trainaccFile.txt", "trainepochFile.txt",
                 "valFile.txt", "valaccFile.txt", "testFile.txt",
                 "testaccFile.txt", "lrFile.txt"):
        a = (Path(res_a["run_dir"]) / name).read_text()
        b = (Path(run_b) / name).read_text()
        assert a == b, name


def test_resume_requires_extended_checkpoint(tmp_path):
    from corrifnet_tpu.data import write_permutation
    import corrifnet_tpu.data.crossval as cv

    write_permutation(24, tmp_path, seed=0)
    old = cv._SPLITS_DIR
    cv._SPLITS_DIR = tmp_path
    try:
        cfg = _cfg(1)
        cfg.extended_checkpoints = False
        res = run_experiment(cfg, run_root=tmp_path / "plain", index=0)
        with pytest.raises(FileNotFoundError, match="extended_checkpoints"):
            run_experiment(_cfg(2), index=0, resume_dir=res["run_dir"])
    finally:
        cv._SPLITS_DIR = old


def test_deadline_stops_at_epoch_boundary_and_still_tests(tmp_path):
    """A wall-clock training deadline (run.main --train-deadline-s) stops at
    an epoch boundary, still runs the test phase (testaccFile non-empty),
    and leaves a resumable run that continues to the full protocol."""
    from pathlib import Path

    from corrifnet_tpu.data import write_permutation
    import corrifnet_tpu.data.crossval as cv

    write_permutation(24, tmp_path, seed=0)
    old = cv._SPLITS_DIR
    cv._SPLITS_DIR = tmp_path
    try:
        # deadline already expired at start -> exactly one epoch runs
        res = run_experiment(_cfg(3), run_root=tmp_path / "d", index=0,
                             deadline_s=1e-3)
        run_dir = Path(res["run_dir"])
        assert len(res["history"]["train_loss"]) == 1
        assert len(res["history"]["val_jac"]) == 1
        # complete artifact set despite the early stop
        assert (run_dir / "testaccFile.txt").read_text().strip()
        assert (run_dir / "fpsfile.txt").exists()
        assert list(run_dir.glob("state0@*"))  # resumable (crash-safe name)

        # resumed (no deadline) -> completes the 3-epoch protocol
        res2 = run_experiment(_cfg(3), index=0, resume_dir=run_dir)
        assert len(res2["history"]["train_loss"]) == 3
        assert (run_dir / "trainepochFile.txt").read_text().split() == [
            "0", "1", "2"
        ]
    finally:
        cv._SPLITS_DIR = old
