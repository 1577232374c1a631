"""Shared utilities."""

from dexnerf_tpu.utils.images import (
    apply_jet_colormap,
    cast_to_disparity_image,
    cast_to_gray_image,
    cast_to_image,
)
from dexnerf_tpu.utils.pointcloud import (
    depth_to_points,
    read_ply,
    write_ply,
)

__all__ = [
    "apply_jet_colormap",
    "cast_to_disparity_image",
    "cast_to_gray_image",
    "cast_to_image",
    "depth_to_points",
    "read_ply",
    "write_ply",
]
