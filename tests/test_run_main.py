"""End-to-end experiment driver test: the F2_MAIN-equivalent pipeline on
synthetic data with a tiny registered model (full path: config -> crossval
-> data -> train -> checkpoints -> test -> logs -> summary -> segplot)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as fnn

from corrifnet_tpu.config import ExperimentConfig, load_config, load_text_config
from corrifnet_tpu.models import registry
from corrifnet_tpu.run.main import run_experiment


class TinySeg5D(fnn.Module):
    """Stand-in 5-D model honoring the zoo I/O contract."""

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


def test_run_experiment_end_to_end(tmp_path):
    # permutation file for N=24
    from corrifnet_tpu.data import write_permutation

    write_permutation(24, tmp_path, seed=0)
    import corrifnet_tpu.data.crossval as cv

    cfg = ExperimentConfig(
        train_set_size=24, fno=1, fsiz=4, mini_batch_size=4, n_epochs=2,
        learn_rate=1e-3, modeltype="TinySeg5D", lim=224,
        synthetic_seed=0, dtype="float32",
    )
    # point the permutation search at tmp_path
    old = cv._SPLITS_DIR
    cv._SPLITS_DIR = tmp_path
    try:
        result = run_experiment(cfg, run_root=tmp_path, index=0)
        run_dir = Path(result["run_dir"])

        # batch re-evaluation (allJaccardResults path) with per-image segplots
        from corrifnet_tpu.run.evaluate import evaluate_run

        seg_dir = run_dir / "overlays"
        r = evaluate_run(run_dir, cfg, index=0, segplot_dir=seg_dir)
        assert r["n_images"] == 6  # 24/4 test fold
        assert 0 <= r["jaccard_mean"] <= 1 and 0 <= r["f1_mean"] <= 1
        assert len(list(seg_dir.glob("segmentation_image_*.png"))) == 6
    finally:
        cv._SPLITS_DIR = old
    # seven log files + fps + checkpoints + summary + overlay
    for f in ["trainFile.txt", "valFile.txt", "testFile.txt", "trainaccFile.txt",
              "valaccFile.txt", "testaccFile.txt", "trainepochFile.txt",
              "lrFile.txt", "fpsfile.txt"]:
        assert (run_dir / f).exists(), f
    assert (run_dir / "iremmodel0").exists()
    assert (run_dir / "Finaliremmodel0").exists()
    assert (run_dir / "segmentation_image.png").exists()
    assert len((run_dir / "trainFile.txt").read_text().splitlines()) == 2
    assert 0.0 <= result["test_jaccard"] <= 1.0
    assert np.isfinite(result["test_loss"])
    # a dated summary log exists with the model type recorded
    summaries = [p for p in run_dir.iterdir() if p.name[0].isdigit() and p.suffix == ".txt"]
    assert summaries and "TinySeg5D" in summaries[0].read_text()


def test_run_experiment_distributed_mesh(tmp_path):
    """The same driver path under a (4,2) dp+tp mesh on the 8 virtual CPU
    devices — distributed training as a first-class CLI capability."""
    from corrifnet_tpu.data import write_permutation
    import corrifnet_tpu.data.crossval as cv

    write_permutation(16, tmp_path, seed=1)
    cfg = ExperimentConfig(
        train_set_size=16, fno=1, fsiz=4, mini_batch_size=4, n_epochs=1,
        learn_rate=1e-3, modeltype="TinySeg5D", lim=224,
        synthetic_seed=1, dtype="float32", mesh_shape=[4, 2],
    )
    old = cv._SPLITS_DIR
    cv._SPLITS_DIR = tmp_path
    try:
        result = run_experiment(cfg, run_root=tmp_path, index=0)
    finally:
        cv._SPLITS_DIR = old
    assert np.isfinite(result["test_loss"])
    assert 0 <= result["test_jaccard"] <= 1


def test_text_config_roundtrip(tmp_path):
    """18-line positional parser must match F2_MAIN.py:62-83 field order."""
    lines = ["5985", "2", "5", "0.1", "4", "70", "0.0001", "Adam",
             "BCEWithLogitsLoss", "BCEWithLogitsLoss", "Jaccard",
             "kaiming_normal_", "5", "0.9", "224", "MMVit4", "0", "notr"]
    p = tmp_path / "model0.txt"
    p.write_text("\n".join(lines) + "\n")
    cfg = load_text_config(p)
    assert cfg.train_set_size == 5985 and cfg.fno == 2 and cfg.fsiz == 5
    assert cfg.mini_batch_size == 4 and cfg.n_epochs == 70
    assert cfg.learn_rate == 1e-4 and cfg.optimizer_type == "Adam"
    assert cfg.step_size == 5 and cfg.gamma == 0.9 and cfg.lim == 224
    assert cfg.modeltype == "MMVit4" and cfg.transfertype == "notr"


def test_json_config(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"modeltype": "UNetV2", "n_epochs": 3}))
    cfg = load_config(p)
    assert cfg.modeltype == "UNetV2" and cfg.n_epochs == 3


def test_short_text_config_raises_clean_valueerror(tmp_path):
    p = tmp_path / "model0.txt"
    p.write_text("5985\n2\n5\n")
    with pytest.raises(ValueError, match="expected 18 config lines, got 3"):
        load_text_config(p)


def test_unknown_modeltype_lists_known_ids():
    from corrifnet_tpu.models import get_spec

    with pytest.raises(KeyError, match="unknown modeltype 'NoSuchNet'.*MMVit4"):
        get_spec("NoSuchNet")
