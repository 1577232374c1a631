"""Shared utilities."""

from dexnerf_tpu.utils.images import (
    apply_jet_colormap,
    cast_to_disparity_image,
    cast_to_gray_image,
    cast_to_image,
)

__all__ = [
    "apply_jet_colormap",
    "cast_to_disparity_image",
    "cast_to_gray_image",
    "cast_to_image",
]
