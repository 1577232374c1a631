"""Hierarchical NeRF renderer (fused XLA coarse→fine pipeline)."""

from dexnerf_tpu.render.renderer import (
    FieldFn,
    ModelFn,
    RayBatch,
    RenderResult,
    RenderSettings,
    encode_points,
    make_mlp_field,
    make_ray_batch,
    render_image,
    render_rays,
)

__all__ = [
    "FieldFn",
    "ModelFn",
    "RayBatch",
    "RenderResult",
    "RenderSettings",
    "encode_points",
    "make_mlp_field",
    "make_ray_batch",
    "render_image",
    "render_rays",
]
