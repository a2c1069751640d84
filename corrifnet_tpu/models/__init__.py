from corrifnet_tpu.models.registry import (
    ModelSpec,
    UnavailableModelError,
    all_models,
    available_models,
    create_model,
    get_spec,
)

__all__ = [
    "ModelSpec",
    "UnavailableModelError",
    "all_models",
    "available_models",
    "create_model",
    "get_spec",
]
