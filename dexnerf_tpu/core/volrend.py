"""Volume rendering (emission–absorption compositing) + Dex-NeRF σ-threshold depth.

TPU-native re-design of the reference compositor
(``nerf-pytorch/nerf/volume_rendering_utils.py:6-70``). Differences from the
reference that matter for TPU:

* The per-threshold Python loop over ``m_thres_cand``
  (``volume_rendering_utils.py:53-58``) becomes a single vectorized op over a
  static threshold axis — one ``[T, ..., S]`` compare + ``argmax`` fusion
  instead of T kernel launches.
* Exclusive cumprod is built as ``concat(1, cumprod(x)[..., :-1])`` — a pure
  functional form of the reference's roll-and-overwrite
  (``nerf_helpers.py:43-64``) with identical values.
* σ-noise is drawn from an explicit ``jax.random`` key.

Everything is shape-static and fuses into one XLA program; the Pallas-fused
variant lives in ``dexnerf_tpu.ops``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class VolumeRenderOutputs(NamedTuple):
    """Per-ray outputs of compositing a radiance field.

    ``depth_dex`` is ``None`` when no thresholds were requested, else
    ``[T, ...]`` — the σ-threshold first-crossing depth per candidate
    threshold (Dex-NeRF's transparent-object metric depth,
    reference ``volume_rendering_utils.py:51-58``).
    """

    rgb: jnp.ndarray  # [..., 3]
    disparity: jnp.ndarray  # [...]
    accumulation: jnp.ndarray  # [...]
    weights: jnp.ndarray  # [..., S]
    depth: jnp.ndarray  # [...]
    depth_dex: Optional[jnp.ndarray]  # [T, ...] or None


def cumprod_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """tf.math.cumprod(..., exclusive=True) along the last axis."""
    ones = jnp.ones_like(x[..., :1])
    return jnp.concatenate([ones, jnp.cumprod(x, axis=-1)[..., :-1]], axis=-1)


def sigma_to_weights(sigma: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """Compositing weights from density and inter-sample distances.

    ``alpha = 1 - exp(-sigma * dist)``;
    ``w_i = alpha_i * prod_{j<i}(1 - alpha_j + 1e-10)``.
    """
    alpha = 1.0 - jnp.exp(-sigma * dists)
    return alpha * cumprod_exclusive(1.0 - alpha + 1e-10)


def ray_dists(depth_values: jnp.ndarray, ray_directions: jnp.ndarray) -> jnp.ndarray:
    """Distances between consecutive samples, scaled to world units.

    Last interval is 1e10 (so the final sample absorbs all remaining
    transmittance); all intervals are scaled by ``|ray_direction|`` since
    ``depth_values`` are parametric ts, not metric distances
    (reference ``volume_rendering_utils.py:17-27``).
    """
    last = jnp.full_like(depth_values[..., :1], 1e10)
    dists = jnp.concatenate(
        [depth_values[..., 1:] - depth_values[..., :-1], last], axis=-1
    )
    return dists * jnp.linalg.norm(ray_directions, axis=-1, keepdims=True)


def sigma_threshold_depth(
    sigma: jnp.ndarray,
    depth_values: jnp.ndarray,
    thresholds: Sequence[float] | jnp.ndarray,
) -> jnp.ndarray:
    """Dex-NeRF metric depth: per ray, the depth of the FIRST sample with σ > m.

    Vectorized over a static threshold axis. ``argmax`` over the boolean mask
    returns the first ``True`` (and index 0 — the nearest sample — when no
    sample crosses, matching the reference's ``argmax`` of an all-zero int
    mask, ``volume_rendering_utils.py:54-58``).

    sigma: [..., S]; depth_values: [..., S]; returns [T, ...].
    """
    thresholds = jnp.asarray(thresholds, dtype=sigma.dtype)

    def one_threshold(m):
        first_idx = jnp.argmax((sigma > m).astype(jnp.int32), axis=-1)
        return jnp.take_along_axis(depth_values, first_idx[..., None], axis=-1)[..., 0]

    return jax.vmap(one_threshold)(thresholds)


def volume_render_radiance_field(
    radiance_field: jnp.ndarray,
    depth_values: jnp.ndarray,
    ray_directions: jnp.ndarray,
    *,
    noise_key: Optional[jax.Array] = None,
    radiance_field_noise_std: float = 0.0,
    white_background: bool = False,
    m_thres_cand: Optional[Sequence[float]] = None,
) -> VolumeRenderOutputs:
    """Composite a sampled radiance field into per-ray rgb / depth / acc maps.

    ``radiance_field``: [..., S, 4] raw network output (rgb logits + σ logit);
    ``depth_values``: [..., S]; ``ray_directions``: [..., 3].

    Value-equivalent to reference ``volume_render_radiance_field``
    (``volume_rendering_utils.py:6-70``) including σ-noise injection, the
    1e-10 transmittance guard, disparity and white-background handling.
    """
    dists = ray_dists(depth_values, ray_directions)

    rgb = jax.nn.sigmoid(radiance_field[..., :3])
    sigma_raw = radiance_field[..., 3]
    if radiance_field_noise_std > 0.0:
        if noise_key is None:
            raise ValueError("radiance_field_noise_std > 0 requires noise_key")
        sigma_raw = sigma_raw + radiance_field_noise_std * jax.random.normal(
            noise_key, sigma_raw.shape, dtype=sigma_raw.dtype
        )
    sigma = jax.nn.relu(sigma_raw)

    weights = sigma_to_weights(sigma, dists)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * depth_values, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    depth_dex = None
    if m_thres_cand is not None and len(tuple(m_thres_cand)) > 0:
        depth_dex = sigma_threshold_depth(sigma, depth_values, m_thres_cand)

    return VolumeRenderOutputs(
        rgb=rgb_map,
        disparity=disp_map,
        accumulation=acc_map,
        weights=weights,
        depth=depth_map,
        depth_dex=depth_dex,
    )


def depth_confidence(
    weights: jnp.ndarray,
    z_vals: jnp.ndarray,
    depth: jnp.ndarray,
    delta: float,
) -> jnp.ndarray:
    """Per-ray confidence of a depth estimate: the weight mass within
    ``±delta`` of ``depth`` along the ray.

    ``weights`` [..., S] and ``z_vals`` [..., S] are the compositing
    weights and their sample depths; ``depth`` [...] is the depth map being
    trusted (expected depth or a Dex-NeRF σ-threshold depth — both live in
    ``z_vals``' space, so for NDC scenes ``delta`` is in NDC units).

    The value is UNNORMALIZED — it compounds coverage (the accumulation
    map) with concentration: an empty ray scores ~0, a diffuse/multimodal
    weight distribution (the transparent-object failure mode Dex-NeRF
    exists for, where expected depth averages across surfaces that exist
    nowhere) scores the fraction of mass actually near the reported
    surface, and a sharp opaque hit scores ~1. Divide by
    ``accumulation`` to measure concentration alone. Beyond-parity: the
    reference ships no confidence signal with its depth maps
    (``volume_rendering_utils.py:45-62``); grasp planners consuming
    metric depth need one to reject unreliable pixels.
    """
    near = jnp.abs(z_vals - depth[..., None]) <= delta
    return jnp.sum(weights * near.astype(weights.dtype), axis=-1)
