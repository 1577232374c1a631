"""Hierarchical NeRF renderer (fused XLA coarse→fine pipeline)."""

from dexnerf_tpu.render.occupancy import (
    OccupancyGrid,
    build_occupancy_grid,
    eval_sigma_grid,
    tighten_image_intervals,
    tighten_ray_intervals,
)
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
    "OccupancyGrid",
    "build_occupancy_grid",
    "eval_sigma_grid",
    "tighten_image_intervals",
    "tighten_ray_intervals",
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
