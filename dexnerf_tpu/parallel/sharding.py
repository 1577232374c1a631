"""Multi-chip training & rendering via ``shard_map`` over the device mesh.

Design (SURVEY.md §2.2 "TPU-native equivalent"):

* **Training**: each device samples its own sub-batch of rays from the
  (replicated) ray store using a per-device folded PRNG key, computes local
  gradients, and joins them with ``psum`` over the ICI mesh axis. Parameters
  and optimizer state are replicated; the update is computed identically on
  every device (no broadcast needed).
* **Rendering**: full frames are tiled across chips — each device renders a
  contiguous block of rays; results concatenate along the ray axis
  (``all_gather``-free: outputs stay sharded and the host assembles).

Everything works on any 1-D mesh — including a CPU mesh created with
``--xla_force_host_platform_device_count`` (how the tests run, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from dexnerf_tpu.data.pipeline import RayStore
from dexnerf_tpu.parallel.mesh import RAY_AXIS
from dexnerf_tpu.render.renderer import (
    ModelFn,
    RayBatch,
    RenderSettings,
    render_rays,
)
from dexnerf_tpu.train.step import TrainState, nerf_loss


def make_parallel_train_step(
    mesh: Mesh,
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    global_batch_size: int,
    *,
    supervision: str = "rgb",
    sampling: str = "uniform",
    steps_per_call: int = 1,
    coarse_field=None,
    fine_field=None,
    fused_loss=None,
    index_to_batch: Optional[Callable] = None,
    depth_loss_weight: float = 0.0,
    depth_valid_max: Optional[float] = None,
) -> Callable[[TrainState, RayStore, jax.Array], Tuple[TrainState, Dict]]:
    """Data-parallel train step: per-device ray sampling, gradient psum.

    ``global_batch_size`` must divide by the mesh size; each device renders
    ``global/num_devices`` rays. The returned function is jitted with
    replicated in/out shardings for params and store.
    ``sampling``/``steps_per_call`` mirror
    :func:`dexnerf_tpu.train.step.make_train_step` (for "per_image", every
    device samples pixels from the SAME random image — reference semantics,
    ``train_nerf_rgb.py:222-241`` — via a pre-fold image key).
    ``coarse_field``/``fine_field``: optional fused Pallas field functions
    (the kernels run per device inside shard_map on each chip's ray shard).
    ``fused_loss``: optional combined loss+gradients kernel path
    (``ops.fused_train_loss``) replacing the whole render+loss body per
    device; supersedes the field functions.
    ``index_to_batch(params, store, idx) -> (rays, target)`` overrides the
    default row gather — the pose-refinement variant re-generates rays
    from the trainable twists this way (a ``"pose"`` leaf in params is
    kept away from the model functions and reported as a
    ``pose_twist_norm`` metric, mirroring ``train.step.make_train_step``).
    ``depth_loss_weight``/``depth_valid_max`` mirror
    ``train.step.make_train_step`` (XLA path or a depth-built fused loss
    kernel; the per-device depth term pmean's with the rest of the
    metrics).
    """
    n_dev = mesh.devices.size
    if global_batch_size % n_dev:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n_dev} devices"
        )
    local_batch = global_batch_size // n_dev
    use_depth = depth_loss_weight > 0.0
    fused_depth = use_depth and getattr(fused_loss, "supports_depth", False)
    if use_depth and fused_loss is not None and not fused_depth:
        raise ValueError(
            "depth supervision with a fused loss kernel requires the "
            "kernel to be built with depth_loss_weight > 0 "
            "(see train.step.make_train_step)"
        )
    if use_depth and index_to_batch is not None:
        raise ValueError(
            "depth supervision and a custom index_to_batch (pose "
            "refinement) are mutually exclusive"
        )

    if index_to_batch is None:
        def index_to_batch(params, store, idx):
            from dexnerf_tpu.data.pipeline import take_ray_batch

            return take_ray_batch(store, idx)

    def local_grads(params, store, key):
        if sampling == "per_image":
            # same image on every device (the image key is taken BEFORE the
            # per-device fold), distinct pixels per device
            k_img, key = jax.random.split(key)
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            k_pix, k_render = jax.random.split(key)
            img = jax.random.randint(k_img, (), 0, store.num_images)
            pix = jax.random.randint(
                k_pix, (local_batch,), 0, store.rays_per_image
            )
            idx = img * store.rays_per_image + pix
        else:
            # distinct stream per device (same draws sample_ray_batch makes)
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            k_sample, k_render = jax.random.split(key)
            idx = jax.random.randint(
                k_sample, (local_batch,), 0, store.num_rays
            )
        rays, target = index_to_batch(params, store, idx)
        model_params = {k: v for k, v in params.items() if k != "pose"}
        if fused_loss is not None:
            if fused_depth:
                from dexnerf_tpu.data.pipeline import _take_depth

                return fused_loss(
                    model_params, rays, target, k_render,
                    _take_depth(store, idx),
                )
            return fused_loss(model_params, rays, target, k_render)
        result = render_rays(
            coarse_fn, fine_fn, model_params, rays, k_render, settings,
            coarse_field=coarse_field, fine_field=fine_field,
        )
        loss, metrics = nerf_loss(result, target, supervision=supervision)
        if use_depth:
            from dexnerf_tpu.data.pipeline import _take_depth
            from dexnerf_tpu.train.step import masked_depth_mse

            d_pred = (
                result.fine.depth if result.fine is not None
                else result.coarse.depth
            )
            d_loss = masked_depth_mse(
                d_pred, _take_depth(store, idx), depth_valid_max
            )
            loss = loss + depth_loss_weight * d_loss
            metrics["depth_loss"] = d_loss
            metrics["loss"] = loss
        return loss, metrics

    def one_step(state: TrainState, store: RayStore, key: jax.Array):
        (_, metrics), grads = jax.value_and_grad(
            local_grads, has_aux=True
        )(state.params, store, key)
        grads = jax.lax.pmean(grads, RAY_AXIS)
        metrics = jax.lax.pmean(metrics, RAY_AXIS)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # PSNR from the PHOTOMETRIC part (== total loss unless an auxiliary
        # term like depth supervision is active)
        photometric = (
            metrics["coarse_loss"] + metrics["fine_loss"]
            if "coarse_loss" in metrics
            else metrics["loss"]
        )
        metrics["psnr"] = -10.0 * jnp.log10(jnp.maximum(photometric, 1e-10))
        if "pose" in params:
            metrics["pose_twist_norm"] = jnp.mean(
                jnp.linalg.norm(params["pose"], axis=-1)
            )
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    def sharded_step(state: TrainState, store: RayStore, key: jax.Array):
        if steps_per_call == 1:
            return one_step(state, store, key)

        def body(carry, k):
            st, metrics = one_step(carry, store, k)
            return st, metrics

        keys = jax.random.split(key, steps_per_call)
        state, metrics_seq = jax.lax.scan(body, state, keys)
        return state, jax.tree.map(lambda x: x[-1], metrics_seq)

    shard_mapped = jax.shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_mapped)


def make_parallel_pose_train_step(
    mesh: Mesh,
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    global_batch_size: int,
    *,
    supervision: str = "rgb",
    sampling: str = "uniform",
    steps_per_call: int = 1,
):
    """Data-parallel SE(3) pose-refinement step (``train/pose_opt.py``).

    Same sharding design as :func:`make_parallel_train_step` — replicated
    params (the pose twists are parameters and replicate with the rest),
    per-device ray-index sampling, gradient ``pmean`` over ICI — except
    rays are re-generated per device from the refined poses (the
    ``index_to_batch`` hook), so the photometric gradient reaches the
    twists. Always the XLA render path (the fused kernels'
    zero-ray-cotangent contract excludes pose optimization).
    """
    from dexnerf_tpu.train.pose_opt import pose_rays

    return make_parallel_train_step(
        mesh, coarse_fn, fine_fn, tx, settings, global_batch_size,
        supervision=supervision,
        sampling=sampling,
        steps_per_call=steps_per_call,
        index_to_batch=lambda params, store, idx: pose_rays(
            store, params["pose"], idx
        ),
    )


def make_parallel_render(
    mesh: Mesh,
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    settings: RenderSettings,
) -> Callable[[Any, RayBatch], Any]:
    """Frame renderer tiling rays across the mesh.

    Input RayBatch arrays must have a leading axis divisible by the mesh
    size (pad first — see ``render_image``'s padding logic). Each device
    renders its shard; outputs come back sharded along the ray axis and
    device_get assembles them.
    """

    def render_shard(params, rays: RayBatch):
        return render_rays(coarse_fn, fine_fn, params, rays, None, settings)

    shard_mapped = jax.shard_map(
        render_shard,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS)),
        out_specs=_render_out_specs(settings, has_fine=fine_fn is not None),
        check_vma=False,
    )
    return jax.jit(shard_mapped)


def render_image_parallel(
    mesh: Mesh,
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    params: Any,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    near: float,
    far: float,
    settings: RenderSettings,
    *,
    block_size: int = 4096,
    use_ndc: bool = False,
    height: Optional[int] = None,
    width: Optional[int] = None,
    focal_length: Optional[float] = None,
):
    """Full-frame render tiled across the mesh (SURVEY.md §2.2 "full-frame
    eval tiling"): the [H, W] ray bundle is padded and split evenly over the
    ray axis; each device runs the same blocked ``render_image`` program on
    its shard, and the host reassembles the frame. Multi-chip drop-in for
    :func:`dexnerf_tpu.render.renderer.render_image` (deterministic path)."""
    import numpy as np

    from dexnerf_tpu.render.renderer import render_image

    img_shape = ray_directions.shape[:-1]
    ro = ray_origins.reshape(-1, 3)
    rd = ray_directions.reshape(-1, 3)
    n = ro.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        # pad with unit-z directions so norms stay finite
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], rd.dtype), (pad, 1))]
        )
    shard_n = (n + pad) // n_dev

    def render_shard(p, ro_s, rd_s):
        return render_image(
            coarse_fn,
            fine_fn,
            p,
            ro_s,
            rd_s,
            near,
            far,
            settings.eval_variant(),
            block_size=min(block_size, shard_n),
            use_ndc=use_ndc,
            height=height,
            width=width,
            focal_length=focal_length,
        )

    shard_mapped = jax.shard_map(
        render_shard,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=_render_out_specs(settings, has_fine=fine_fn is not None),
        check_vma=False,
    )
    out = jax.jit(shard_mapped)(params, ro, rd)

    def unflatten(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n + pad:
            return x[:n].reshape(*img_shape, *x.shape[1:])
        if x.ndim >= 2 and x.shape[1] == n + pad:  # dex [T, N]
            return x[:, :n].reshape(x.shape[0], *img_shape, *x.shape[2:])
        return x

    return jax.tree.map(unflatten, out)


def _render_out_specs(settings: RenderSettings, *, has_fine: bool):
    """Output PartitionSpecs for RenderResult: everything sharded on rays
    (dex depth has a leading threshold axis -> shard axis 1)."""
    from dexnerf_tpu.core.volrend import VolumeRenderOutputs
    from dexnerf_tpu.render.renderer import RenderResult

    ray_spec = P(RAY_AXIS)
    dex_spec = P(None, RAY_AXIS)

    def vol(with_dex: bool):
        return VolumeRenderOutputs(
            rgb=ray_spec,
            disparity=ray_spec,
            accumulation=ray_spec,
            weights=ray_spec,
            depth=ray_spec,
            depth_dex=dex_spec if with_dex else None,
        )

    has_dex = bool(settings.m_thres_cand)
    return RenderResult(
        coarse=vol(False),
        fine=vol(has_dex) if (has_fine and settings.num_fine > 0) else None,
    )
