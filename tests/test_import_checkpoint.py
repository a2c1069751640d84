"""Checkpoint-migration CLI: reference torch .pt -> framework Orbax
checkpoint, round-tripped through the real Checkpointer and verified
against the torch forward (the product-path version of the parity tests)."""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DIR = "/root/reference"


def _load_reference_unetv2():
    spec = importlib.util.spec_from_file_location(
        "ref_unetv2_ic", f"{REFERENCE_DIR}/F9_UNET_V2_3.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_unetv2_ic"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_import_cli_roundtrip_unetv2(tmp_path):
    """torch.save -> CLI main() -> Checkpointer.restore -> forward matches
    the torch reference."""
    import jax.numpy as jnp

    from corrifnet_tpu.models.unet import UNetV2
    from corrifnet_tpu.run.import_checkpoint import main
    from corrifnet_tpu.train.checkpoint import Checkpointer

    ref = _load_reference_unetv2()
    torch.manual_seed(0)
    model_t = ref.UNetV2(classes=1).eval()
    pt = tmp_path / "Finaliremmodel0.pt"
    torch.save(model_t.state_dict(), pt)

    run_dir = tmp_path / "run"
    rc = main([
        "UNetV2", str(pt), str(run_dir), "--name", "Finaliremmodel0",
        "--lim", "64",
    ])
    assert rc == 0

    ck = Checkpointer(str(run_dir))
    params, batch_stats = ck.restore("Finaliremmodel0")
    ck.close()

    x_np = np.random.default_rng(41).normal(0, 1, (1, 3, 64, 64)).astype(
        np.float32
    )
    with torch.no_grad():
        want = model_t(torch.from_numpy(x_np)).numpy()
    got = np.asarray(
        UNetV2(classes=1).apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(x_np), False,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_import_cli_rejects_unknown_model(tmp_path):
    from corrifnet_tpu.run.import_checkpoint import import_checkpoint

    with pytest.raises(KeyError, match="no torch converter"):
        import_checkpoint("LoRA_ViT", "/nonexistent.pt", str(tmp_path))


def test_import_cli_rejects_wrong_shapes(tmp_path):
    """A state_dict from a different classes count fails shape validation
    BEFORE anything is written."""
    from corrifnet_tpu.run.import_checkpoint import import_checkpoint

    ref = _load_reference_unetv2()
    torch.manual_seed(0)
    model_t = ref.UNetV2(classes=4)
    pt = tmp_path / "bad.pt"
    torch.save(model_t.state_dict(), pt)
    run_dir = tmp_path / "run"
    with pytest.raises(ValueError, match="does not match"):
        import_checkpoint("UNetV2", str(pt), str(run_dir), lim=64)
    assert not (run_dir / "Finaliremmodel0").exists()


def test_imported_checkpoint_flows_through_evaluate(tmp_path):
    """Full migration workflow: reference .pt -> import CLI -> run.evaluate
    recomputes per-image Jaccard2+F1 on the imported weights (the
    allJaccardResults surface, allJaccardResults:197-240)."""
    from corrifnet_tpu.config import ExperimentConfig
    from corrifnet_tpu.run.evaluate import evaluate_run
    from corrifnet_tpu.run.import_checkpoint import import_checkpoint

    ref = _load_reference_unetv2()
    torch.manual_seed(2)
    model_t = ref.UNetV2(classes=1)
    pt = tmp_path / "Finaliremmodel0.pt"
    torch.save(model_t.state_dict(), pt)

    run_dir = tmp_path / "imported"
    import_checkpoint("UNetV2", str(pt), str(run_dir))

    from corrifnet_tpu.data import crossval as cv
    from corrifnet_tpu.data import write_permutation

    write_permutation(16, tmp_path, seed=1)
    cfg = ExperimentConfig(
        train_set_size=16, fno=1, fsiz=4, modeltype="UNetV2",
        synthetic_seed=0, dtype="float32",
    )
    old_dir = cv._SPLITS_DIR
    cv._SPLITS_DIR = tmp_path
    try:
        r = evaluate_run(str(run_dir), cfg, index=0)
    finally:
        cv._SPLITS_DIR = old_dir
    assert r["n_images"] == 4
    assert 0.0 <= r["jaccard_mean"] <= 1.0
    assert 0.0 <= r["f1_mean"] <= 1.0


def _build_reference_model(modeltype):
    """Construct the torch reference implementation for any zoo model id
    (stubbing absent third-party deps)."""
    import types

    def load(fname, name, stubs=()):
        for stub in stubs:
            mod = types.ModuleType(stub)
            mod.__getattr__ = lambda n: (lambda *a, **k: None)
            sys.modules.setdefault(stub, mod)
        spec = importlib.util.spec_from_file_location(
            name, f"{REFERENCE_DIR}/{fname}"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    torch.manual_seed(0)
    if modeltype == "MMVit4":
        from test_full_model_parity import _load_reference_mmvit4

        return _load_reference_mmvit4().MMVit4(num_cls=1)
    if modeltype in ("MMVit2", "mmformer"):
        fname = "mmmvit2.py" if modeltype == "MMVit2" else "mmformer.py"
        mod = load(fname, f"ref_ic_{modeltype}")
        return getattr(mod, "MMVit2" if modeltype == "MMVit2" else "mmformer")(
            num_cls=1
        )
    if modeltype == "RFNet":
        return load("RFNet.py", "ref_ic_rfnet").RFNet(num_cls=1)
    if modeltype == "RobustMseg":
        return load("RobustSeg.py", "ref_ic_robustseg").RobustMseg()
    if modeltype == "MultiSenseSeg":
        from test_full_model_parity_zoo import _stub_timm

        _stub_timm()
        return load("MultiSenseSeg.py", "ref_ic_mss").MultiSenseSeg(
            n_classes=1, n_branch=3, in_chans=(3, 3, 3)
        )
    if modeltype == "UNetV2":
        return load("F9_UNET_V2_3.py", "ref_ic_unet").UNetV2(classes=1)
    if modeltype == "DeepLabv3_plus":
        return load(
            "F14_DEEPLABV3PLUS_V4_xception.py", "ref_ic_dl",
            stubs=("torchvision", "torchvision.models"),
        ).DeepLabv3_plus(num_classes=1, pretrained=False)
    if modeltype == "Segformer":
        return load("segformer.py", "ref_ic_seg").Segformer(num_classes=1)
    if modeltype == "FASSDNet":
        return load("F28_FASSDNet.py", "ref_ic_fassd").FASSDNet(n_classes=1)
    if modeltype == "ENet":
        return load("F29_ENet.py", "ref_ic_enet",
                    stubs=("torchsummary",)).ENet(classes=1)
    if modeltype == "ELANet":
        return load("F30_ELANet.py", "ref_ic_ela",
                    stubs=("torchsummary",)).ELANet(classes=1)
    raise KeyError(modeltype)


@pytest.mark.parametrize("modeltype", [
    "MMVit4", "MMVit2", "mmformer", "RFNet", "RobustMseg", "MultiSenseSeg",
    "UNetV2", "DeepLabv3_plus", "Segformer", "FASSDNet", "ENet", "ELANet",
])
def test_import_cli_accepts_every_zoo_model(modeltype, tmp_path):
    """Every zoo model's reference checkpoint imports and shape-validates
    against the framework model's init tree (lim=64 keeps this fast; the
    trees are input-size independent)."""
    from corrifnet_tpu.run.import_checkpoint import import_checkpoint

    model_t = _build_reference_model(modeltype)
    pt = tmp_path / "ref.pt"
    torch.save(model_t.state_dict(), pt)
    path = import_checkpoint(
        modeltype, str(pt), str(tmp_path / "out"), lim=64
    )
    assert (tmp_path / "out" / "Finaliremmodel0").exists(), path
