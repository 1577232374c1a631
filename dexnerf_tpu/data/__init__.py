"""Dataset loaders (blender / LLFF / messytable), synthetic scenes, and the
on-device ray pipeline."""

from dexnerf_tpu.data.blender import (
    load_blender_data,
    load_blender_depths,
    pose_spherical,
    spherical_render_poses,
)
from dexnerf_tpu.data.llff import load_llff_data, load_llff_depths
from dexnerf_tpu.data.messytable import load_messytable_data
from dexnerf_tpu.data.host_store import (
    HostRayLoader,
    build_host_ray_rows,
)
from dexnerf_tpu.data.pipeline import (
    RayStore,
    build_ray_store,
    build_ray_store_from_cache,
    sample_ray_batch,
    sample_ray_batch_per_image,
    take_ray_batch,
    with_full_intervals,
)
from dexnerf_tpu.data.synthetic import (
    analytic_field,
    make_synthetic_scene,
    render_analytic_image,
    write_blender_dataset,
    write_messytable_dataset,
)

__all__ = [
    "load_blender_data",
    "load_blender_depths",
    "pose_spherical",
    "spherical_render_poses",
    "load_llff_data",
    "load_llff_depths",
    "load_messytable_data",
    "HostRayLoader",
    "RayStore",
    "build_host_ray_rows",
    "build_ray_store",
    "build_ray_store_from_cache",
    "sample_ray_batch",
    "sample_ray_batch_per_image",
    "take_ray_batch",
    "with_full_intervals",
    "analytic_field",
    "make_synthetic_scene",
    "render_analytic_image",
    "write_blender_dataset",
    "write_messytable_dataset",
]
