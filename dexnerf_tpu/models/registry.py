"""Explicit model registry.

Replaces the reference's reflection-based model selection
(``getattr(models, cfg.models.coarse.type)``, reference
``train_nerf_rgb.py:122``) with a declared name -> constructor map, so typos
fail loudly and the registry is introspectable.
"""

from __future__ import annotations

from typing import Dict, Type

import flax.linen as nn

from dexnerf_tpu.models.mlp import (
    FlexibleNeRFModel,
    MultiHeadNeRFModel,
    PaperNeRFModel,
    ReplicateNeRFModel,
    VeryTinyNeRFModel,
)

MODEL_REGISTRY: Dict[str, Type[nn.Module]] = {}


def register_model(name: str, cls: Type[nn.Module]) -> None:
    if name in MODEL_REGISTRY and MODEL_REGISTRY[name] is not cls:
        raise ValueError(f"model name already registered: {name}")
    MODEL_REGISTRY[name] = cls


def get_model_cls(name: str) -> Type[nn.Module]:
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model type {name!r}; registered: {sorted(MODEL_REGISTRY)}"
        ) from None


def build_model(name: str, **kwargs) -> nn.Module:
    """Instantiate a registered model, dropping kwargs it doesn't declare.

    The reference configs carry a superset of each model's constructor args
    (e.g. ``num_layers`` for ``VeryTinyNeRFModel``); we filter to the model's
    dataclass fields instead of crashing.
    """
    cls = get_model_cls(name)
    fields = {f for f in cls.__dataclass_fields__}  # flax modules are dataclasses
    return cls(**{k: v for k, v in kwargs.items() if k in fields})


for _name, _cls in [
    ("VeryTinyNeRFModel", VeryTinyNeRFModel),
    ("MultiHeadNeRFModel", MultiHeadNeRFModel),
    ("ReplicateNeRFModel", ReplicateNeRFModel),
    ("PaperNeRFModel", PaperNeRFModel),
    ("FlexibleNeRFModel", FlexibleNeRFModel),
]:
    register_model(_name, _cls)
