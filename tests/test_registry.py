"""Registry behavior: available IDs construct, missing IDs error cleanly."""

import pytest

from corrifnet_tpu.models import (
    UnavailableModelError,
    all_models,
    available_models,
    create_model,
    get_spec,
)


def test_reference_model_ids_present():
    """Every modeltype the reference dispatches on must have a slot
    (F2_MAIN.py:114-129, F4_TRAIN.py:96-177, calculate.py:76-126)."""
    ids = set(all_models())
    for name in [
        "UNetV2", "MultiSenseSeg", "Segformer", "MMVit2", "MMVit4",
        "mmformer", "RFNet", "DeepLabv3_plus", "RobustMseg", "FASSDNet",
        "ENet", "ELANet", "MMVit1", "MMVit5", "LoRA_ViT", "LoRA_ViT9",
    ]:
        assert name in ids, name


def test_unavailable_ids_error_cleanly():
    """MMVit1/MMVit5/LoRA_ViT* modules are absent from the reference
    snapshot (F2_MAIN.py:26-28, F4_TRAIN.py:9-10) — must raise, not crash."""
    for name in ["MMVit1", "MMVit5", "LoRA_ViT", "LoRA_ViT5"]:
        with pytest.raises(UnavailableModelError):
            create_model(name)


def test_unknown_id_raises_keyerror():
    with pytest.raises(KeyError):
        get_spec("NoSuchModel")


def test_flagship_constructs():
    m = create_model("MMVit4")
    assert type(m).__name__ == "MMVit4"
    assert get_spec("MMVit4").input_kind == "5d"


def test_available_listing():
    av = available_models()
    assert "MMVit4" in av and "MMVit1" not in av
