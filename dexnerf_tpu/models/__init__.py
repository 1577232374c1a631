"""NeRF model zoo (flax) + registry + SG PBR shading."""

from dexnerf_tpu.models import sg
from dexnerf_tpu.models.mlp import (
    Dense,
    FlexibleNeRFModel,
    MultiHeadNeRFModel,
    PaperNeRFModel,
    ReplicateNeRFModel,
    VeryTinyNeRFModel,
)
from dexnerf_tpu.models.registry import (
    MODEL_REGISTRY,
    build_model,
    get_model_cls,
    register_model,
)

__all__ = [
    "sg",
    "Dense",
    "FlexibleNeRFModel",
    "MultiHeadNeRFModel",
    "PaperNeRFModel",
    "ReplicateNeRFModel",
    "VeryTinyNeRFModel",
    "MODEL_REGISTRY",
    "build_model",
    "get_model_cls",
    "register_model",
]
