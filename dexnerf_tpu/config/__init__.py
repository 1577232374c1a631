"""Experiment configuration: CfgNode (YAML tree) + typed schema helpers."""

from dexnerf_tpu.config.cfgnode import CfgNode
from dexnerf_tpu.config.schema import (
    load_config,
    m_thres_candidates,
    model_from_cfg,
    models_from_cfg,
    render_settings_from_cfg,
)

__all__ = [
    "CfgNode",
    "load_config",
    "m_thres_candidates",
    "model_from_cfg",
    "models_from_cfg",
    "render_settings_from_cfg",
]
