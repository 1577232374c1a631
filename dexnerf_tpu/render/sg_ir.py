"""Active-IR supervision through the live SG shader (``models/sg.py``).

The reference carried ``SgRenderer`` as dead code "for the planned
IR-active-light work" (reference ``nerf/render.py:5-60``): supervise a NeRF
on IR frames not as raw luminance (``train_nerf_ir.py:260-263``) but as a
*shaded* image — the physically meaningful model for Dex-NeRF's sensor,
whose IR camera sees its own co-located projector reflected off the scene.
This module is the first implementation that can actually train with it.

Model
-----
Per sample point along each ray:

* **basecolor** — the radiance field's RGB head through its sigmoid
  (the same activation the photometric path uses), read as albedo;
* **normal** — the classic density-gradient normal
  ``n = -∇σ / |∇σ|`` (one extra backward pass through the field —
  cheap in JAX, impossible in the reference's dead torch graph);
* **metallic / roughness** — global learnable scalars (sigmoid-squashed),
  the minimal PBR material for a single-sensor setup;
* **illumination** — a learnable world-frame SG mixture (ambient /
  environment lobes) PLUS one *active* lobe riding each ray: its axis is
  the surface→camera direction (projector and camera are co-located on a
  RealSense-style sensor), its amplitude a learnable color with an optional
  inverse-square distance falloff, its sharpness a learnable beam width.

``sg_shade`` (the JAX ``SgRenderer``) evaluates the Cook–Torrance BRDF
against that mixture per sample; the shaded radiance is composited with the
standard emission–absorption weights and its Rec.601 luminance is matched
to the IR target with MSE — exactly the supervision seam
``train.step.make_train_step(fused_loss=...)`` exposes.

Parameters live under ``params["sg"]`` next to ``"coarse"``/``"fine"`` and
flow through Adam/checkpointing untouched (a pytree is a pytree).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dexnerf_tpu.core.sampling import (
    hierarchical_z_vals,
    perturb_z_vals,
    stratified_z_vals,
)
from dexnerf_tpu.core.volrend import volume_render_radiance_field
from dexnerf_tpu.models.sg import pack_sg, sg_shade
from dexnerf_tpu.render.renderer import RenderSettings, make_mlp_field

_EPS = 1e-6


def init_sg_ir_params(key: jax.Array, num_env_lobes: int = 2) -> Dict[str, Any]:
    """Learnable shading parameters (the ``params["sg"]`` subtree).

    Environment lobes start dim and broad (they model stray IR); the
    active lobe starts at unit amplitude with a moderate beam. Axes are
    random unit vectors so lobes break symmetry.
    """
    k_axis, k_amp = jax.random.split(key)
    axes = jax.random.normal(k_axis, (num_env_lobes, 3))
    axes = axes / jnp.linalg.norm(axes, axis=-1, keepdims=True)
    amps = 0.05 * jnp.abs(jax.random.normal(k_amp, (num_env_lobes, 3)))
    sharp = jnp.full((num_env_lobes, 1), 2.0)
    return {
        "illum_env": pack_sg(amps, axes, sharp),  # [L, 7]
        "active_log_amp": jnp.zeros((3,)),  # projector color, log-space
        "active_log_sharpness": jnp.asarray(jnp.log(8.0)),
        "metallic_logit": jnp.asarray(-2.0),  # sigmoid -> ~0.12
        "roughness_logit": jnp.asarray(0.0),  # sigmoid -> 0.5
    }


def _field_with_normals(field, params, pts, viewdirs):
    """One shared forward: ``(raw [N, S, 4], normals [N, S, 3])``.

    Normals are the density-gradient ``-∇σ/|∇σ|``: σ at a point depends
    only on that point's coordinates, so pulling back a σ-only cotangent
    through ``jax.vjp`` yields the per-point gradient (block-diagonal
    Jacobian) — AND reuses the same forward pass that produces ``raw``
    (a separate ``jax.grad`` re-ran the whole field, 3 evaluations per
    pass instead of 2). Stop-gradded: normals guide shading, the density
    head is trained through the compositing weights (PhySG/Neural-PIL
    practice).
    """
    raw, vjp_fn = jax.vjp(lambda p: field(params, p, viewdirs), pts)
    ct = jnp.zeros_like(raw).at[..., 3].set(1.0)
    (g,) = vjp_fn(ct)
    g = jax.lax.stop_gradient(g)
    n = -g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), _EPS)
    return raw, n


def _shade_samples(
    sg_params: Dict[str, Any],
    raw: jnp.ndarray,  # [N, S, 4]
    normals: jnp.ndarray,  # [N, S, 3]
    z_vals: jnp.ndarray,  # [N, S]
    viewdirs: jnp.ndarray,  # [N, 3]
    *,
    distance_falloff: bool,
) -> jnp.ndarray:
    """Per-sample shaded radiance [N, S, 3] under env + active lobes."""
    n, s = z_vals.shape
    b = n * s

    basecolor = jax.nn.sigmoid(raw[..., :3]).reshape(b, 3)
    normal = normals.reshape(b, 3)
    # surface -> camera; also the incident direction of the co-located
    # projector's light at the surface
    to_cam = jnp.broadcast_to(-viewdirs[:, None, :], (n, s, 3)).reshape(b, 3)

    env = jnp.broadcast_to(
        sg_params["illum_env"][None, :, :],
        (b, *sg_params["illum_env"].shape),
    )
    amp = jnp.exp(sg_params["active_log_amp"])[None, :]
    if distance_falloff:
        # inverse-square falloff with distance along the ray (z is the
        # parametric depth; |d| scaling folds into the learned amplitude)
        r2 = jnp.maximum(z_vals.reshape(b, 1) ** 2, 1e-2)
        amp = amp / r2
    else:
        amp = jnp.broadcast_to(amp, (b, 3))
    sharp = jnp.broadcast_to(
        jnp.exp(sg_params["active_log_sharpness"]), (b, 1)
    )
    active = pack_sg(amp, to_cam, sharp)[:, None, :]  # [B, 1, 7]
    illums = jnp.concatenate([env, active], axis=1)

    metallic = jnp.broadcast_to(
        jax.nn.sigmoid(sg_params["metallic_logit"]), (b, 1)
    )
    roughness = jnp.broadcast_to(
        0.04 + 0.96 * jax.nn.sigmoid(sg_params["roughness_logit"]), (b, 1)
    )
    shaded = sg_shade(
        illums, basecolor, metallic, roughness, normal, to_cam
    )
    return shaded.reshape(n, s, 3)


from dexnerf_tpu.core.metrics import luminance as _luma


def render_sg_ir_rays(
    field,
    sg_params: Dict[str, Any],
    field_params: Any,
    rays,
    z_vals: jnp.ndarray,
    key: Optional[jax.Array],
    s: RenderSettings,
    *,
    distance_falloff: bool = True,
) -> Tuple[jnp.ndarray, Any]:
    """One pass: field → normals → shade → composite. Returns
    ``(ir [N], outs)`` where ``outs`` are the standard volume-render
    outputs (weights reused for the hierarchical resample)."""
    viewdirs = rays.viewdirs if s.use_viewdirs else None
    pts = (
        rays.origins[..., None, :]
        + rays.directions[..., None, :] * z_vals[..., :, None]
    )
    raw, normals = _field_with_normals(field, field_params, pts, viewdirs)
    outs = volume_render_radiance_field(
        raw,
        z_vals,
        rays.directions,
        noise_key=key,
        radiance_field_noise_std=s.radiance_field_noise_std,
        white_background=False,
        m_thres_cand=None,
    )
    shaded = _shade_samples(
        sg_params, raw, normals, z_vals, rays.viewdirs,
        distance_falloff=distance_falloff,
    )
    ir = jnp.sum(outs.weights[..., None] * shaded, axis=-2)  # [N, 3]
    return _luma(ir), outs


def render_sg_ir_image(
    coarse_model,
    fine_model,
    params: Dict[str, Any],
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    near: float,
    far: float,
    settings: RenderSettings,
    *,
    distance_falloff: bool = True,
    block_size: int = 4096,
    use_ndc: bool = False,
    height: Optional[int] = None,
    width: Optional[int] = None,
    focal_length: Optional[float] = None,
) -> jnp.ndarray:
    """Deterministic full-frame shaded-IR render ``[H, W]`` (luminance in
    [0, 1]) — the analysis/eval view of the :func:`make_sg_ir_loss` model,
    blocked with ``lax.map`` like ``renderer.render_image``."""
    from dexnerf_tpu.render.renderer import make_ray_batch

    s = settings.eval_variant() if hasattr(settings, "eval_variant") else settings
    coarse_field = make_mlp_field(coarse_model.apply, s)
    fine_field = (
        make_mlp_field(fine_model.apply, s) if fine_model is not None else None
    )
    img_shape = ray_directions.shape[:-1]
    rays = make_ray_batch(
        ray_origins, ray_directions, near, far,
        use_ndc=use_ndc, height=height, width=width,
        focal_length=focal_length,
    )
    n = rays.origins.shape[0]
    num_blocks = -(-n // block_size)
    pad = num_blocks * block_size - n

    def pad_block(x):
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return x.reshape(num_blocks, block_size, *x.shape[1:])

    blocked = type(rays)(*[pad_block(x) for x in rays])
    sg = params["sg"]

    def block_fn(block):
        z_vals = stratified_z_vals(
            block.near, block.far, s.num_coarse, lindisp=s.lindisp
        )
        ir_c, outs_c = render_sg_ir_rays(
            coarse_field, sg, params["coarse"], block, z_vals, None, s,
            distance_falloff=distance_falloff,
        )
        if fine_field is None or s.num_fine <= 0:
            return ir_c
        z_merged, _ = hierarchical_z_vals(
            None, z_vals, outs_c.weights, s.num_fine, det=True
        )
        ir_f, _ = render_sg_ir_rays(
            fine_field, sg, params["fine"], block, z_merged, None, s,
            distance_falloff=distance_falloff,
        )
        return ir_f

    out = jax.lax.map(block_fn, blocked)
    return out.reshape(num_blocks * block_size)[:n].reshape(img_shape)


def make_sg_ir_loss(
    coarse_model,
    fine_model,
    settings: RenderSettings,
    *,
    distance_falloff: bool = True,
):
    """Drop-in loss for ``make_train_step(fused_loss=...)``:
    ``(params, rays, target [N, 3], key) -> (loss, metrics)``.

    ``params`` must carry ``"sg"`` (``init_sg_ir_params``) alongside
    ``"coarse"``/``"fine"``. The target's Rec.601 luminance is the IR
    frame (the reference stores IR captures as grayscale RGB,
    ``train_nerf_ir.py:260-263``).
    """
    s = settings
    coarse_field = make_mlp_field(coarse_model.apply, s)
    fine_field = (
        make_mlp_field(fine_model.apply, s) if fine_model is not None else None
    )

    def loss_fn(params, rays, target, key):
        if key is not None:
            k_strat, k_noise_c, k_fine, k_noise_f = jax.random.split(key, 4)
        else:
            k_strat = k_noise_c = k_fine = k_noise_f = None
        sg = params["sg"]
        target_y = _luma(target)

        z_vals = stratified_z_vals(
            rays.near, rays.far, s.num_coarse, lindisp=s.lindisp
        )
        if s.perturb:
            z_vals = perturb_z_vals(k_strat, z_vals)

        ir_c, outs_c = render_sg_ir_rays(
            coarse_field, sg, params["coarse"], rays, z_vals, k_noise_c, s,
            distance_falloff=distance_falloff,
        )
        coarse_loss = jnp.mean((ir_c - target_y) ** 2)

        fine_loss = jnp.zeros(())
        if fine_field is not None and s.num_fine > 0:
            z_merged, _ = hierarchical_z_vals(
                k_fine, z_vals, outs_c.weights, s.num_fine,
                det=not s.perturb,
            )
            ir_f, _ = render_sg_ir_rays(
                fine_field, sg, params["fine"], rays, z_merged, k_noise_f, s,
                distance_falloff=distance_falloff,
            )
            fine_loss = jnp.mean((ir_f - target_y) ** 2)

        loss = coarse_loss + fine_loss
        return loss, {
            "loss": loss,
            "coarse_loss": coarse_loss,
            "fine_loss": fine_loss,
        }

    return loss_fn
