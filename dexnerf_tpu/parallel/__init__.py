"""Multi-chip parallelism: device mesh + shard_map train/render + multi-host."""

from dexnerf_tpu.parallel import multihost
from dexnerf_tpu.parallel.mesh import (
    RAY_AXIS,
    make_mesh,
    ray_sharding,
    replicated,
)
from dexnerf_tpu.parallel.sharding import (
    make_parallel_render,
    make_parallel_pose_train_step,
    make_parallel_train_step,
    render_image_parallel,
)

__all__ = [
    "multihost",
    "RAY_AXIS",
    "make_mesh",
    "ray_sharding",
    "replicated",
    "make_parallel_render",
    "make_parallel_pose_train_step",
    "make_parallel_train_step",
    "render_image_parallel",
]
