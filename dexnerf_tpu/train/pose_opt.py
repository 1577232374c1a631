"""Camera pose refinement: SE(3) pose optimization as a training mode.

The reference ships ``lieutils.py`` — SO(3)/SE(3) exp/log maps with
hand-written ``torch.autograd.Function`` gradients (PointNetLK-derived) —
as DEAD code kept "for planned pose-optimization work" (SURVEY.md §1:
imported by nothing). This module is that capability made live, the JAX
way: each training image carries a trainable se(3) correction twist, world
rays are re-generated from the corrected pose INSIDE the jitted train
step, and the photometric-loss gradient flows into the twists through ray
generation by ordinary autodiff — ``core.lie.se3_exp`` is differentiable
for free, where the reference would have had to thread its hand-written
autograd Functions through the whole ray pipeline.

Math: the corrected camera-to-world transform of train image ``i`` is

    T_i = se3_exp(xi_i) @ T0_i

a LEFT-multiplicative (world-frame) correction, ``xi_i`` zero-initialized
so training starts exactly at the dataset poses. Rays are then the usual
``o = T_i[:3, 3]``, ``d = T_i[:3, :3] @ d_cam`` with ``d_cam`` the fixed
camera-frame pixel direction (both reference camera conventions
supported: c2w+focal — upstream blender/llff, ``nerf_helpers.py:67`` 4-arg
form — and w2c+K with the fx-for-both-axes quirk, ``nerf_helpers.py:89-112``;
for the latter the base transform is ``inv(w2c)``, identical to the
reference's on-the-fly inversion for rigid extrinsics). NDC
reparameterization (LLFF) is applied after ray generation inside the step,
so its gradient also reaches the twists.

Contract: pose optimization requires gradients w.r.t. ray origins and
directions, so it always uses the XLA render path — the fused Pallas train
kernels declare zero cotangents for ray inputs by design
(``ops/fused_train_loss.py`` "Integration contract") and are automatically
bypassed in this mode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dexnerf_tpu.core.lie import se3_exp
from dexnerf_tpu.core.rays import ndc_rays, pixel_grid
from dexnerf_tpu.render.renderer import RayBatch, RenderSettings
from dexnerf_tpu.train.step import TrainState


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "base_c2w"),
    meta_fields=(
        "near", "far", "rays_per_image", "use_ndc", "height", "width",
        "focal",
    ),
)
@dataclasses.dataclass(frozen=True)
class PoseRayStore:
    """Per-pixel CAMERA-frame directions + targets, plus base poses.

    Unlike :class:`~dexnerf_tpu.data.pipeline.RayStore` (which bakes world
    rays at build time), world rays here are a function of the trainable
    twists and are produced inside the step by :func:`pose_rays`.
    """

    data: jnp.ndarray  # [N, 6]: cam_dir(3) rgb(3); N = n_images * H * W
    base_c2w: jnp.ndarray  # [n_images, 4, 4] camera-to-world
    near: float
    far: float
    rays_per_image: int
    use_ndc: bool = False
    height: int = 0
    width: int = 0
    focal: float = 0.0

    @property
    def num_rays(self) -> int:
        return self.data.shape[0]

    @property
    def num_images(self) -> int:
        return self.data.shape[0] // self.rays_per_image


def init_pose_params(num_images: int) -> jnp.ndarray:
    """Zero twists [n_images, 6]: training starts at the dataset poses."""
    return jnp.zeros((num_images, 6), jnp.float32)


def refined_c2w(
    base_c2w: jnp.ndarray, twists: jnp.ndarray
) -> jnp.ndarray:
    """``se3_exp(xi_i) @ T0_i`` for every image — [n_images, 4, 4].

    HIGHEST precision: the TPU default bf16 matmul would put ~1e-2
    absolute error on camera origins ~4.0 — the same order as the
    corrections being optimized (see ``core.lie._mm``)."""
    return jnp.matmul(
        se3_exp(twists), base_c2w, precision=jax.lax.Precision.HIGHEST
    )


def build_pose_ray_store(
    images: np.ndarray,
    poses: np.ndarray,
    hwf,
    near: float,
    far: float,
    *,
    intrinsics: Optional[np.ndarray] = None,
    use_ndc: bool = False,
) -> PoseRayStore:
    """Camera-frame analog of ``build_ray_store`` (same conventions).

    ``poses`` are c2w (blender/llff) unless ``intrinsics`` is given, in
    which case they are w2c and the base transform becomes ``inv(w2c)``
    (messytable convention, reference ``nerf_helpers.py:89-112`` incl. the
    fx-for-both-axes quirk).
    """
    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    images = jnp.asarray(images[..., :3], dtype=jnp.float32)
    poses = jnp.asarray(poses, dtype=jnp.float32)
    n = images.shape[0]
    ii, jj = pixel_grid(H, W)

    if intrinsics is not None:
        Ks = jnp.asarray(intrinsics, dtype=jnp.float32)

        def cam_dirs_for(K):
            # reference quirk: K[0, 0] (fx) for BOTH axes; +z forward
            return jnp.stack(
                [
                    (ii - K[0, 2]) / K[0, 0],
                    (jj - K[1, 2]) / K[0, 0],
                    jnp.ones_like(ii),
                ],
                axis=-1,
            )

        cam_dirs = jax.vmap(cam_dirs_for)(Ks)  # [n, H, W, 3]
        base_c2w = jnp.linalg.inv(poses)
    else:
        d = jnp.stack(
            [
                (ii - W * 0.5) / focal,
                -(jj - H * 0.5) / focal,
                -jnp.ones_like(ii),
            ],
            axis=-1,
        )
        cam_dirs = jnp.broadcast_to(d, (n, H, W, 3))
        base_c2w = poses[:, :4, :4]

    data = jnp.concatenate(
        [cam_dirs.reshape(-1, 3), images.reshape(-1, 3)], axis=-1
    )
    return PoseRayStore(
        data=jax.device_put(data),
        base_c2w=jax.device_put(base_c2w),
        near=float(near),
        far=float(far),
        rays_per_image=H * W,
        use_ndc=bool(use_ndc),
        height=H,
        width=W,
        focal=focal,
    )


def pose_rays(
    store: PoseRayStore, twists: jnp.ndarray, idx: jnp.ndarray
) -> Tuple[RayBatch, jnp.ndarray]:
    """World rays + targets for flat ray indices ``idx``, differentiable
    w.r.t. ``twists``. Returns (RayBatch, target_rgb [B, 3])."""
    rows = jnp.take(store.data, idx, axis=0)
    cam_dir, target = rows[:, 0:3], rows[:, 3:6]
    img = idx // store.rays_per_image

    T = refined_c2w(store.base_c2w, twists)  # [n_images, 4, 4]
    Ti = jnp.take(T, img, axis=0)  # [B, 4, 4]
    # d_world[r] = sum_c R[r, c] * d_cam[c]  (matches core.rays._rotate)
    rd = jnp.sum(Ti[:, :3, :3] * cam_dir[:, None, :], axis=-1)
    ro = Ti[:, :3, 3]
    viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    if store.use_ndc:
        ro, rd = ndc_rays(
            store.height, store.width, store.focal, 1.0, ro, rd
        )
    n = idx.shape[0]
    rays = RayBatch(
        origins=ro,
        directions=rd,
        viewdirs=viewdirs,
        near=jnp.full((n,), store.near, jnp.float32),
        far=jnp.full((n,), store.far, jnp.float32),
    )
    return rays, target


def sample_pose_indices(
    store: PoseRayStore, key: jax.Array, batch_size: int, sampling: str
) -> jnp.ndarray:
    """Flat ray indices per the sampling mode (jit-safe)."""
    if sampling == "uniform":
        return jax.random.randint(key, (batch_size,), 0, store.num_rays)
    if sampling == "per_image":
        # reference semantics: ONE random image, then batch_size pixels
        # within it (train_nerf_rgb.py:222-241)
        k_img, k_pix = jax.random.split(key)
        img = jax.random.randint(k_img, (), 0, store.num_images)
        pix = jax.random.randint(
            k_pix, (batch_size,), 0, store.rays_per_image
        )
        return img * store.rays_per_image + pix
    raise ValueError(f"unknown sampling mode: {sampling}")


def make_pose_optimizer(
    model_tx: optax.GradientTransformation,
    pose_tx: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Model params ride ``model_tx``; the top-level ``"pose"`` leaf rides
    ``pose_tx`` (its own lr — pose twists live on a different scale than
    MLP weights)."""

    def labels(params):
        return {
            k: ("pose" if k == "pose" else "model")
            for k in params
        }

    return optax.multi_transform(
        {"model": model_tx, "pose": pose_tx}, labels
    )


def make_pose_train_step(
    coarse_fn,
    fine_fn,
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    batch_size: int,
    *,
    supervision: str = "rgb",
    sampling: str = "uniform",
    steps_per_call: int = 1,
) -> Callable[[TrainState, PoseRayStore, jax.Array], Tuple[TrainState, Dict]]:
    """Pose-refining variant of ``train.step.make_train_step``: the same
    step scaffolding with rays re-generated from the trainable twists
    (``ray_source`` hook). ``state.params`` must carry a ``"pose"`` leaf
    ([n_images, 6] twists, see :func:`init_pose_params`) alongside
    ``"coarse"``/``"fine"``; the XLA render path is used unconditionally
    (see module contract)."""
    from dexnerf_tpu.train.step import make_train_step

    def ray_source(params, store: PoseRayStore, k_sample):
        idx = sample_pose_indices(store, k_sample, batch_size, sampling)
        return pose_rays(store, params["pose"], idx)

    return make_train_step(
        coarse_fn, fine_fn, tx, settings, batch_size,
        supervision=supervision,
        steps_per_call=steps_per_call,
        ray_source=ray_source,
    )
