"""Training: jitted step, unified loop, checkpoints, logging."""

from dexnerf_tpu.train.checkpoints import (
    import_torch_checkpoint,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from dexnerf_tpu.train.logging import (
    MetricsLogger,
    load_depth_png_mm,
    profiler_trace,
    save_depth_png_mm,
)
from dexnerf_tpu.train.loop import SceneData, load_scene, run_training, validate
from dexnerf_tpu.train.pose_opt import (
    PoseRayStore,
    build_pose_ray_store,
    init_pose_params,
    make_pose_optimizer,
    make_pose_train_step,
    pose_rays,
    refined_c2w,
)
from dexnerf_tpu.train.step import (
    TrainState,
    exponential_decay_schedule,
    init_train_state,
    luminance,
    make_optimizer,
    make_train_step,
    nerf_loss,
)

__all__ = [
    "import_torch_checkpoint",
    "latest_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
    "MetricsLogger",
    "load_depth_png_mm",
    "profiler_trace",
    "save_depth_png_mm",
    "SceneData",
    "load_scene",
    "run_training",
    "validate",
    "PoseRayStore",
    "build_pose_ray_store",
    "init_pose_params",
    "make_pose_optimizer",
    "make_pose_train_step",
    "pose_rays",
    "refined_c2w",
    "TrainState",
    "exponential_decay_schedule",
    "init_train_state",
    "luminance",
    "make_optimizer",
    "make_train_step",
    "nerf_loss",
]
