"""Model registry keyed by the reference's ``modeltype`` strings.

Dispatch sites in the reference: F2_MAIN.py:114-129, F4_TRAIN.py:96-177,
F7_TEST2.py:41-122, calculate.py:76-126, allJaccardResults:110-185.

Model IDs whose source modules are missing from the reference snapshot
(``MMVit1``, ``MMVit5``, the ``LoRA_ViT*`` family — F2_MAIN.py:26-28,
F4_TRAIN.py:9-10,116-177 import modules not present in the repo) register
as :class:`UnavailableModel` so the capability (swappable IDs, clean error
for unreproducible ones) is preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

__all__ = [
    "ModelSpec",
    "UnavailableModelError",
    "register",
    "register_unavailable",
    "create_model",
    "get_spec",
    "available_models",
    "all_models",
]


class UnavailableModelError(NotImplementedError):
    """Raised for model IDs the reference declares but cannot construct."""


@dataclasses.dataclass
class ModelSpec:
    name: str
    factory: Optional[Callable[..., Any]]  # returns a linen Module
    input_kind: str  # '5d' (B,3,3,H,W multimodal) or '4d' (B,3,H,W RGB)
    note: str = ""
    available: bool = True


_REGISTRY: Dict[str, ModelSpec] = {}


def register(name: str, input_kind: str, note: str = ""):
    def deco(factory):
        _REGISTRY[name] = ModelSpec(name, factory, input_kind, note, True)
        return factory

    return deco


def register_unavailable(name: str, note: str):
    _REGISTRY[name] = ModelSpec(name, None, "?", note, False)


def get_spec(name: str) -> ModelSpec:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown modeltype {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def create_model(name: str, **kwargs):
    spec = get_spec(name)
    if not spec.available:
        raise UnavailableModelError(
            f"modeltype {name!r} is declared by the reference but its source "
            f"module is missing from the snapshot: {spec.note}"
        )
    return spec.factory(**kwargs)


def available_models():
    return sorted(n for n, s in _REGISTRY.items() if s.available)


def all_models():
    return dict(_REGISTRY)


# ---------------------------------------------------------------------------
# Registrations
# ---------------------------------------------------------------------------

def _register_builtin():
    from corrifnet_tpu.models.mmvit4 import MMVit4

    _REGISTRY["MMVit4"] = ModelSpec(
        "MMVit4", MMVit4, "5d", "CorrIFNet flagship (mmvit4.py:391-532)", True
    )

    def _lazy(name, modpath, clsname, kind, note):
        def factory(**kw):
            import importlib

            cls = getattr(importlib.import_module(modpath), clsname)
            return cls(**kw)

        _REGISTRY[name] = ModelSpec(name, factory, kind, note, True)

    _lazy("MMVit2", "corrifnet_tpu.models.mmvit2", "MMVit2", "5d",
          "MMVit4 with plain conv encoder (mmmvit2.py:345-477)")
    _lazy("mmformer", "corrifnet_tpu.models.mmformer", "MMFormer", "5d",
          "MMVit2 without correlation attention (mmformer.py:349-435)")
    _lazy("RFNet", "corrifnet_tpu.models.rfnet", "RFNet", "5d",
          "region-aware modal fusion (RFNet.py:287-317)")
    _lazy("RobustMseg", "corrifnet_tpu.models.robustseg", "RobustMseg", "5d",
          "style/content disentanglement (RobustSeg.py:8-95)")
    _lazy("MultiSenseSeg", "corrifnet_tpu.models.multisenseseg", "MultiSenseSeg",
          "5d", "MSE+AMM multi-branch (MultiSenseSeg.py:1137-1297)")
    _lazy("UNetV2", "corrifnet_tpu.models.unet", "UNetV2", "4d",
          "classic UNet (F9_UNET_V2_3.py:113-141)")
    _lazy("DeepLabv3_plus", "corrifnet_tpu.models.deeplabv3p", "DeepLabV3Plus",
          "4d", "Xception+ASPP (F14_DEEPLABV3PLUS_V4_xception.py:445-494)")
    _lazy("Segformer", "corrifnet_tpu.models.segformer", "Segformer", "4d",
          "MiT encoder (segformer.py:171-216)")
    _lazy("FASSDNet", "corrifnet_tpu.models.fassdnet", "FASSDNet", "4d",
          "HarDNet+DAPF+MDA (F28_FASSDNet.py:272-377)")
    _lazy("ENet", "corrifnet_tpu.models.enet", "ENet", "4d",
          "canonical ENet, WITH the return the reference forward lost "
          "(F29_ENet.py:435-437)")
    _lazy("ELANet", "corrifnet_tpu.models.elanet", "ELANet", "4d",
          "efficient lightweight attention net (F30_ELANet.py:252-342)")

    for name, note in [
        ("MMVit1", "mmvit1.py absent from snapshot (F4_TRAIN.py:9)"),
        ("MMVit5", "mmvit5.py absent from snapshot (F4_TRAIN.py:10)"),
    ] + [
        (f"LoRA_ViT{i if i > 1 else ''}",
         "lora/base_vit/seg_vit modules absent (F2_MAIN.py:26-28)")
        for i in range(1, 10)
    ] + [
        # calculate2.py's single-modality zoo whose modules are absent from
        # the snapshot (calculate2.py:15-40 imports)
        (n, f"{src} absent from snapshot (calculate2.py:15-40)")
        for n, src in [
            ("UNetV1", "F1_UNET_V1_1.py"),
            ("SegNet", "F10_SEGNET_V1.py"),
            ("DinkNet101", "F12_DLINKNET_V3.py"),
            ("CamDUNet", "F20_DILATEDUNET.py"),
            ("DFANet", "F15_DFANET.py"),
            ("R2U_Net", "F21_GENERAL_UNET.py"),
            ("AttU_Net", "F21_GENERAL_UNET.py"),
            ("R2AttU_Net", "F21_GENERAL_UNET.py"),
            ("NestedUNet", "F22_NESTEDUNET.py"),
            ("DualNorm_Unet", "F23_DULANORM_UNET.py"),
            ("InceptionUNet", "F24_INCEPTION_UNET.py"),
            ("AttU_Net_with_scAG", "F25_SCAG_UNET.py"),
            ("FSFNet", "F26_FSFNet.py"),
            ("LMFFNet", "F27_LMFFNet.py"),
            ("LMFFNet2", "LMFFNet_IREM.py"),
            ("LMFFNet3", "LMFFNet_IREM3.py"),
            ("UNetFormer", "F16_UNETFORMER2.py"),
        ]
    ]:
        register_unavailable(name, note)


_register_builtin()
