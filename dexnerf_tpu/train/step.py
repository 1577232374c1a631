"""Jitted training step: sample rays → render → loss → optax update.

Replaces the reference's per-iteration Python orchestration
(``train_nerf_rgb.py:178-301``) with one compiled program: the random ray
gather, the full coarse→fine render, the photometric loss (RGB MSE, or
Rec.601-luminance MSE for IR supervision — reference
``train_nerf_ir.py:260-263``), gradient computation, and the Adam update with
exponential LR decay all run on device; the host only feeds the step counter
and reads back scalars for logging.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dexnerf_tpu.data.pipeline import RayStore, sample_ray_batch
from dexnerf_tpu.render.renderer import ModelFn, RenderSettings, render_rays

# Rec.601 luminance (reference train_nerf_ir.py:260-263) — defined once in
# core.metrics; re-exported here for the train-facing API.
from dexnerf_tpu.core.metrics import luminance  # noqa: F401


def exponential_decay_schedule(
    init_lr: float, lr_decay: float, lr_decay_factor: float
) -> optax.Schedule:
    """``lr * factor ** (step / (lr_decay * 1000))`` — the reference's manual
    schedule (``train_nerf_rgb.py:281-286``)."""
    return optax.exponential_decay(
        init_value=init_lr,
        transition_steps=int(lr_decay * 1000),
        decay_rate=lr_decay_factor,
        staircase=False,
    )


# Explicit optimizer registry, replacing the reference's
# ``getattr(torch.optim, cfg.optimizer.type)`` reflection
# (``train_nerf_rgb.py:146``).
OPTIMIZER_REGISTRY: Dict[str, Callable[..., optax.GradientTransformation]] = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    "RMSprop": optax.rmsprop,
    "Adagrad": optax.adagrad,
}


def make_optimizer(
    lr: float,
    lr_decay: float = 250.0,
    lr_decay_factor: float = 0.1,
    opt_type: str = "Adam",
) -> optax.GradientTransformation:
    try:
        ctor = OPTIMIZER_REGISTRY[opt_type]
    except KeyError:
        raise KeyError(
            f"unknown optimizer type {opt_type!r}; "
            f"registered: {sorted(OPTIMIZER_REGISTRY)}"
        ) from None
    return ctor(
        learning_rate=exponential_decay_schedule(lr, lr_decay, lr_decay_factor)
    )


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Any  # {"coarse": ..., "fine": ...}
    opt_state: Any


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def nerf_loss(
    result, target_rgb: jnp.ndarray, *, supervision: str = "rgb"
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Coarse + fine photometric MSE (reference ``train_nerf_rgb.py:262-278``;
    IR/luminance variant ``train_nerf_ir.py:260-263``)."""
    if supervision == "rgb":
        coarse_loss = jnp.mean((result.coarse.rgb - target_rgb) ** 2)
        fine_loss = (
            jnp.mean((result.fine.rgb - target_rgb) ** 2)
            if result.fine is not None
            else 0.0
        )
    elif supervision == "luminance":
        target_y = luminance(target_rgb)
        coarse_loss = jnp.mean((luminance(result.coarse.rgb) - target_y) ** 2)
        fine_loss = (
            jnp.mean((luminance(result.fine.rgb) - target_y) ** 2)
            if result.fine is not None
            else 0.0
        )
    else:
        raise ValueError(f"unknown supervision mode: {supervision}")
    loss = coarse_loss + fine_loss
    return loss, {
        "loss": loss,
        "coarse_loss": coarse_loss,
        "fine_loss": jnp.asarray(fine_loss),
    }


def masked_depth_mse(
    depth_pred: jnp.ndarray,
    depth_gt: jnp.ndarray,
    valid_max: Optional[float] = None,
) -> jnp.ndarray:
    """Mean squared depth error over the valid-GT mask.

    Valid = ``gt > 0`` (missing GT encodes as 0 in the depth PNGs), and
    optionally ``gt < valid_max`` — the reference's metric mask is
    ``0 < d < 1.25`` m (``train_nerf_rgb.py:390``, metric-only there; here
    it can supervise)."""
    mask = depth_gt > 0.0
    if valid_max is not None:
        mask = jnp.logical_and(mask, depth_gt < valid_max)
    mask = mask.astype(depth_pred.dtype)
    err = mask * (depth_pred - depth_gt) ** 2
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    batch_size: int,
    *,
    supervision: str = "rgb",
    coarse_field=None,
    fine_field=None,
    fused_loss=None,
    sampling: str = "uniform",
    steps_per_call: int = 1,
    ray_source: Optional[Callable] = None,
    depth_loss_weight: float = 0.0,
    depth_valid_max: Optional[float] = None,
) -> Callable[[TrainState, RayStore, jax.Array], Tuple[TrainState, Dict]]:
    """Build the single-device jitted train step.

    ``coarse_field``/``fine_field`` optionally replace the XLA
    encode+MLP path with fused Pallas field functions (see
    ``dexnerf_tpu.ops.fused_mlp_train`` for the training-capable one).
    ``fused_loss`` goes further: a ``(params, rays, target, key) ->
    (loss, metrics)`` callable (``ops.fused_train_loss``) that replaces the
    whole render+loss body with the combined loss+gradients kernels —
    the fastest TPU path; it supersedes ``coarse_field``/``fine_field``.
    ``sampling``: "uniform" draws rays from the whole store;
    "per_image" reproduces the reference's one-image-per-iteration
    sampling (``train_nerf_rgb.py:222-241``).
    ``steps_per_call`` > 1 runs that many optimizer steps per dispatch via
    ``lax.scan`` (amortizes per-dispatch host/runtime overhead — ~16 ms on
    the remote-tunnel backend); the returned metrics are the LAST step's
    and ``state.step`` advances by ``steps_per_call``.
    ``ray_source(params, store, k_sample) -> (rays, target)`` overrides
    the default store gather — pose refinement re-generates rays from the
    trainable twists this way (``train/pose_opt.py``); a ``"pose"`` leaf
    in params is kept away from the model functions and reported as a
    ``pose_twist_norm`` metric.
    ``depth_loss_weight`` > 0 adds ``weight * masked_depth_mse`` on the
    fine (or coarse-only) expected depth against the store's per-ray GT
    depth — supervision the reference never had despite carrying the GT
    (it only ever computed metrics from it, ``train_nerf_rgb.py:361-401``).
    Works on the XLA path and on a fused loss kernel built with
    ``depth_loss_weight > 0`` (``loss_fn.supports_depth`` — the depth
    cotangent is computed inside the kernel); a photometric-only fused
    kernel is rejected. The ray/key draw structure is unchanged, so
    weight 0 vs absent is trajectory-identical.
    The multi-chip (shard_map) variant wraps this via
    ``dexnerf_tpu.parallel.make_parallel_train_step``.
    """
    from dexnerf_tpu.data.pipeline import sample_ray_batch_per_image

    sample_fn = {
        "uniform": sample_ray_batch,
        "per_image": sample_ray_batch_per_image,
    }[sampling]
    use_depth = depth_loss_weight > 0.0
    fused_depth = use_depth and getattr(fused_loss, "supports_depth", False)
    if use_depth and fused_loss is not None and not fused_depth:
        raise ValueError(
            "depth supervision with a fused loss kernel requires the "
            "kernel to be built with depth_loss_weight > 0 "
            "(ops.make_fused_train_loss(depth_loss_weight=...)); this one "
            "computes photometric-loss gradients only"
        )
    if use_depth and ray_source is not None:
        raise ValueError(
            "depth supervision and a custom ray_source (pose refinement) "
            "are mutually exclusive"
        )

    def loss_fn(params, store, key):
        k_sample, k_render = jax.random.split(key)
        depth_gt = None
        if ray_source is not None:
            rays, target = ray_source(params, store, k_sample)
        elif use_depth:
            rays, target, depth_gt = sample_fn(
                store, k_sample, batch_size, return_depth=True
            )
        else:
            rays, target = sample_fn(store, k_sample, batch_size)
        model_params = {k: v for k, v in params.items() if k != "pose"}
        if fused_loss is not None:
            if fused_depth:
                return fused_loss(
                    model_params, rays, target, k_render, depth_gt
                )
            return fused_loss(model_params, rays, target, k_render)
        result = render_rays(
            coarse_fn,
            fine_fn,
            model_params,
            rays,
            k_render,
            settings,
            coarse_field=coarse_field,
            fine_field=fine_field,
        )
        loss, metrics = nerf_loss(result, target, supervision=supervision)
        if use_depth:
            d_pred = (
                result.fine.depth if result.fine is not None
                else result.coarse.depth
            )
            d_loss = masked_depth_mse(d_pred, depth_gt, depth_valid_max)
            loss = loss + depth_loss_weight * d_loss
            metrics["depth_loss"] = d_loss
            metrics["loss"] = loss
        return loss, metrics

    def one_step(state: TrainState, store: RayStore, key: jax.Array):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, store, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        # PSNR from the PHOTOMETRIC part (== total loss unless an auxiliary
        # term like depth supervision is active)
        photometric = (
            metrics["coarse_loss"] + metrics["fine_loss"]
            if "coarse_loss" in metrics
            else metrics["loss"]
        )
        metrics["psnr"] = -10.0 * jnp.log10(jnp.maximum(photometric, 1e-10))
        if "pose" in params:
            # observability of how far the poses have moved from the dataset's
            metrics["pose_twist_norm"] = jnp.mean(
                jnp.linalg.norm(params["pose"], axis=-1)
            )
        return new_state, metrics

    # Donate the state: params/opt_state buffers are reused in place,
    # halving the train step's parameter-memory traffic.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, store: RayStore, key: jax.Array):
        if steps_per_call == 1:
            return one_step(state, store, key)

        def body(carry, k):
            st, metrics = one_step(carry, store, k)
            return st, metrics

        keys = jax.random.split(key, steps_per_call)
        state, metrics_seq = jax.lax.scan(body, state, keys)
        metrics = jax.tree.map(lambda x: x[-1], metrics_seq)
        return state, metrics

    return train_step


def make_batch_train_step(
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    tx: optax.GradientTransformation,
    settings: RenderSettings,
    *,
    supervision: str = "rgb",
    coarse_field=None,
    fine_field=None,
    fused_loss=None,
    depth_loss_weight: float = 0.0,
    depth_valid_max: Optional[float] = None,
    unpack=None,
):
    """Train step over an EXPLICIT ray batch (the host-streaming data path,
    ``data/host_store.py``): sampling happens on the host, so the jitted
    program receives ``(rays, target[, depth_gt])`` directly instead of
    gathering from a device-resident store. Same loss/update body as
    :func:`make_train_step`; the key is split exactly like the resident
    path (the sample half is simply unused), so noise/perturb draws match
    it key-for-key.

    Returns ``step(state, rays, target, key[, depth_gt]) ->
    (state, metrics)`` (the depth argument exists iff
    ``depth_loss_weight > 0``).

    ``unpack`` switches to the PACKED wire
    (``data/host_store.py::make_ray_unpack``): the step becomes
    ``step(state, packed_dict, key)`` and reconstructs
    ``(rays, target[, depth_gt])`` from the u32 indices + u8 rgb inside
    the jitted program — the 8x wire-byte cut for remote/streamed data.
    """
    use_depth = depth_loss_weight > 0.0
    fused_depth = use_depth and getattr(fused_loss, "supports_depth", False)
    if use_depth and fused_loss is not None and not fused_depth:
        raise ValueError(
            "depth supervision with a fused loss kernel requires the "
            "kernel to be built with depth_loss_weight > 0"
        )

    def loss_fn(params, rays, target, key, depth_gt):
        _, k_render = jax.random.split(key)  # mirror the resident split
        model_params = {k: v for k, v in params.items() if k != "pose"}
        if fused_loss is not None:
            if fused_depth:
                return fused_loss(
                    model_params, rays, target, k_render, depth_gt
                )
            return fused_loss(model_params, rays, target, k_render)
        result = render_rays(
            coarse_fn, fine_fn, model_params, rays, k_render, settings,
            coarse_field=coarse_field, fine_field=fine_field,
        )
        loss, metrics = nerf_loss(result, target, supervision=supervision)
        if use_depth:
            d_pred = (
                result.fine.depth if result.fine is not None
                else result.coarse.depth
            )
            d_loss = masked_depth_mse(d_pred, depth_gt, depth_valid_max)
            loss = loss + depth_loss_weight * d_loss
            metrics["depth_loss"] = d_loss
            metrics["loss"] = loss
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def batch_step(state: TrainState, rays, target, key, depth_gt=None):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rays, target, key, depth_gt
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        photometric = (
            metrics["coarse_loss"] + metrics["fine_loss"]
            if "coarse_loss" in metrics
            else metrics["loss"]
        )
        metrics["psnr"] = -10.0 * jnp.log10(jnp.maximum(photometric, 1e-10))
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            metrics,
        )

    if unpack is not None:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def packed_step(state: TrainState, packed, key):
            parts = unpack(packed)
            rays, target = parts[0], parts[1]
            depth_gt = parts[2] if use_depth else None
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, rays, target, key, depth_gt)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            photometric = (
                metrics["coarse_loss"] + metrics["fine_loss"]
                if "coarse_loss" in metrics
                else metrics["loss"]
            )
            metrics["psnr"] = -10.0 * jnp.log10(
                jnp.maximum(photometric, 1e-10)
            )
            return (
                TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state),
                metrics,
            )

        return packed_step

    if use_depth:
        return batch_step

    def step_no_depth(state, rays, target, key):
        return batch_step(state, rays, target, key)

    return step_no_depth
