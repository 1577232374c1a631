"""Multi-chip parallelism: device mesh + shard_map train/render + multi-host."""

from dexnerf_tpu.parallel import multihost
from dexnerf_tpu.parallel.mesh import (
    RAY_AXIS,
    make_mesh,
    ray_sharding,
    replicated,
)
from dexnerf_tpu.parallel.multiscene import (
    SCENE_AXIS,
    MultiSceneStore,
    init_multi_scene_state,
    make_multi_scene_parallel_train_step,
    make_multi_scene_train_step,
    make_scene_data_mesh,
    make_scene_mesh,
    scene_params,
    scene_store,
    shard_multi_scene,
    stack_params,
    stack_ray_stores,
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
    "SCENE_AXIS",
    "MultiSceneStore",
    "init_multi_scene_state",
    "make_mesh",
    "make_multi_scene_parallel_train_step",
    "make_multi_scene_train_step",
    "make_scene_data_mesh",
    "make_scene_mesh",
    "make_parallel_render",
    "make_parallel_pose_train_step",
    "make_parallel_train_step",
    "ray_sharding",
    "render_image_parallel",
    "replicated",
    "scene_params",
    "scene_store",
    "shard_multi_scene",
    "stack_params",
    "stack_ray_stores",
]
