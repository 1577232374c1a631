"""Hierarchical (coarse→fine) NeRF renderer as a single fused XLA program.

TPU-native re-design of the reference rendering core
(``nerf-pytorch/nerf/train_utils.py:72-288``). The reference splits work into
Python chunk loops (ray chunks at ``train_utils.py:252``, network-input
chunks at ``:83-85``) with dynamic last-chunk shapes; here the whole
coarse→fine hierarchy over a fixed-size ray block is ONE jitted function —
stratified sampling → positional encoding → coarse MLP → compositing →
inverse-CDF resampling → fine MLP → compositing — which XLA fuses end to end
(MLP matmuls on the MXU, everything else on the VPU). Full-frame rendering is
a ``lax.map`` over fixed-size blocks (the static-shape replacement for
``get_minibatches``).

Randomness (stratified jitter, σ-noise, importance-sampling uniforms) is
threaded through one explicit ``jax.random`` key per call.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dexnerf_tpu.core.encoding import positional_encoding
from dexnerf_tpu.core.rays import ndc_rays
from dexnerf_tpu.core.sampling import (
    hierarchical_z_vals,
    perturb_z_vals,
    stratified_z_vals,
)
from dexnerf_tpu.core.volrend import VolumeRenderOutputs, volume_render_radiance_field

# A model function maps (params, encoded_features[..., D]) -> raw[..., 4].
ModelFn = Callable[[Any, jnp.ndarray], jnp.ndarray]

# A field function maps (params, pts[..., S, 3], viewdirs[..., 3] | None)
# -> raw[..., S, 4], i.e. it owns the encoding step. The default wraps a
# ModelFn with positional encoding (make_mlp_field); the Pallas path fuses
# encoding + MLP in one kernel (dexnerf_tpu.ops.fused_mlp) so encodings never
# touch HBM.
FieldFn = Callable[[Any, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) rendering configuration for one mode (train/val).

    Mirrors the reference's ``cfg.nerf.{train,validation}`` block plus the
    encoder settings (SURVEY.md §5 config schema).
    """

    num_coarse: int = 64
    num_fine: int = 64
    perturb: bool = True
    lindisp: bool = False
    radiance_field_noise_std: float = 0.0
    white_background: bool = False
    m_thres_cand: Tuple[float, ...] = ()
    # encoder settings
    use_viewdirs: bool = True
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    log_sampling_xyz: bool = True
    log_sampling_dir: bool = True

    def eval_variant(self) -> "RenderSettings":
        """Deterministic variant for validation/rendering."""
        return dataclasses.replace(
            self, perturb=False, radiance_field_noise_std=0.0
        )


class RayBatch(NamedTuple):
    """A flat batch of rays. ``viewdirs`` are the *pre-NDC* normalized
    directions (reference computes viewdirs before NDC conversion,
    ``train_utils.py:222-226``)."""

    origins: jnp.ndarray  # [N, 3]
    directions: jnp.ndarray  # [N, 3]
    viewdirs: jnp.ndarray  # [N, 3]
    near: jnp.ndarray  # [N]
    far: jnp.ndarray  # [N]


class RenderResult(NamedTuple):
    coarse: VolumeRenderOutputs
    fine: Optional[VolumeRenderOutputs]


def make_ray_batch(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    near: float,
    far: float,
    *,
    use_ndc: bool = False,
    height: Optional[int] = None,
    width: Optional[int] = None,
    focal_length: Optional[float] = None,
) -> RayBatch:
    """Flatten [..., 3] ray bundles into a RayBatch, optionally NDC-projected.

    Equivalent of the packing in ``run_one_iter_of_nerf``
    (``train_utils.py:219-250``): viewdirs from raw directions, NDC with
    near=1.0 when enabled, constant near/far otherwise.
    """
    viewdirs = ray_directions / jnp.linalg.norm(
        ray_directions, axis=-1, keepdims=True
    )
    if use_ndc:
        ro, rd = ndc_rays(
            height, width, focal_length, 1.0, ray_origins, ray_directions
        )
    else:
        ro, rd = ray_origins, ray_directions
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    viewdirs = viewdirs.reshape(-1, 3)
    n = ro.shape[0]
    dtype = ro.dtype
    return RayBatch(
        origins=ro,
        directions=rd,
        viewdirs=viewdirs,
        near=jnp.full((n,), near, dtype=dtype),
        far=jnp.full((n,), far, dtype=dtype),
    )


def encode_points(
    pts: jnp.ndarray, viewdirs: Optional[jnp.ndarray], s: RenderSettings
) -> jnp.ndarray:
    """Positional-encode sample points (+ broadcast viewdir encoding).

    ``pts``: [N, S, 3]; ``viewdirs``: [N, 3] or None. Returns [N, S, D].
    Equivalent to reference ``run_network`` (``train_utils.py:72-89``) minus
    the Python chunking.
    """
    enc = positional_encoding(
        pts,
        num_frequencies=s.num_encoding_fn_xyz,
        include_input=s.include_input_xyz,
        log_sampling=s.log_sampling_xyz,
    )
    if viewdirs is not None:
        dir_enc = positional_encoding(
            viewdirs,
            num_frequencies=s.num_encoding_fn_dir,
            include_input=s.include_input_dir,
            log_sampling=s.log_sampling_dir,
        )
        dir_enc = jnp.broadcast_to(
            dir_enc[..., None, :], (*pts.shape[:-1], dir_enc.shape[-1])
        )
        enc = jnp.concatenate([enc, dir_enc], axis=-1)
    return enc


def make_mlp_field(apply_fn: ModelFn, settings: RenderSettings) -> FieldFn:
    """Default field function: positional-encode then apply the MLP.

    The encodings are passed as a SPLIT (xyz_enc [N, S, Dx],
    dir_enc [N, Dd]) tuple rather than the reference's concatenated
    per-sample layout: the models (``dexnerf_tpu.models.mlp``) consume the
    parts with split matmuls, so the [N, S, Dd] viewdir broadcast and the
    [N, S, Dx+Dd] concat never exist — the viewdir matmul runs once per RAY
    and broadcasts across samples. Numerics are identical to the packed
    layout (one kernel, sliced).
    """

    def field(params, pts, viewdirs):
        enc = positional_encoding(
            pts,
            num_frequencies=settings.num_encoding_fn_xyz,
            include_input=settings.include_input_xyz,
            log_sampling=settings.log_sampling_xyz,
        )
        if viewdirs is None:
            return apply_fn(params, (enc,))
        dir_enc = positional_encoding(
            viewdirs,
            num_frequencies=settings.num_encoding_fn_dir,
            include_input=settings.include_input_dir,
            log_sampling=settings.log_sampling_dir,
        )
        return apply_fn(params, (enc, dir_enc))

    return field


def render_rays(
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    params: Any,
    rays: RayBatch,
    key: Optional[jax.Array],
    settings: RenderSettings,
    *,
    coarse_field: Optional[FieldFn] = None,
    fine_field: Optional[FieldFn] = None,
) -> RenderResult:
    """Render one fixed-size ray batch through the coarse→fine hierarchy.

    ``params`` is a dict with keys ``"coarse"`` (and ``"fine"`` when
    ``fine_fn`` is given). ``key`` may be None when the settings are fully
    deterministic (no perturb/noise).

    Value-equivalent to reference ``predict_and_render_radiance``
    (``train_utils.py:92-202``); the σ-threshold (Dex) depths are computed on
    the fine pass only (the reference computes-and-discards the coarse ones).
    """
    s = settings
    coarse_field = coarse_field or make_mlp_field(coarse_fn, s)
    if fine_field is None and fine_fn is not None:
        fine_field = make_mlp_field(fine_fn, s)
    if key is not None:
        k_strat, k_noise_c, k_fine, k_noise_f = jax.random.split(key, 4)
    else:
        k_strat = k_noise_c = k_fine = k_noise_f = None

    z_vals = stratified_z_vals(
        rays.near, rays.far, s.num_coarse, lindisp=s.lindisp
    )
    if s.perturb:
        z_vals = perturb_z_vals(k_strat, z_vals)

    viewdirs = rays.viewdirs if s.use_viewdirs else None

    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z_vals[..., :, None]
    raw_coarse = coarse_field(params["coarse"], pts, viewdirs)
    coarse = volume_render_radiance_field(
        raw_coarse,
        z_vals,
        rays.directions,
        noise_key=k_noise_c,
        radiance_field_noise_std=s.radiance_field_noise_std,
        white_background=s.white_background,
        m_thres_cand=None,
    )

    fine = None
    if fine_field is not None and s.num_fine > 0:
        z_merged, _ = hierarchical_z_vals(
            k_fine,
            z_vals,
            coarse.weights,
            s.num_fine,
            det=not s.perturb,
        )
        pts = (
            rays.origins[..., None, :]
            + rays.directions[..., None, :] * z_merged[..., :, None]
        )
        raw_fine = fine_field(params["fine"], pts, viewdirs)
        fine = volume_render_radiance_field(
            raw_fine,
            z_merged,
            rays.directions,
            noise_key=k_noise_f,
            radiance_field_noise_std=s.radiance_field_noise_std,
            white_background=s.white_background,
            m_thres_cand=s.m_thres_cand if s.m_thres_cand else None,
        )
    return RenderResult(coarse=coarse, fine=fine)


def render_image(
    coarse_fn: ModelFn,
    fine_fn: Optional[ModelFn],
    params: Any,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    near: float,
    far: float,
    settings: RenderSettings,
    *,
    key: Optional[jax.Array] = None,
    block_size: int = 4096,
    use_ndc: bool = False,
    height: Optional[int] = None,
    width: Optional[int] = None,
    focal_length: Optional[float] = None,
    coarse_field: Optional[FieldFn] = None,
    fine_field: Optional[FieldFn] = None,
    rays_impl=None,
    occupancy=None,
    occupancy_probes: int = 128,
    occupancy_subsample: int = 2,
) -> RenderResult:
    """Render a full [H, W] ray bundle by mapping over fixed-size ray blocks.

    The static-shape replacement for the reference's validation-mode chunk
    loop (``train_utils.py:252-288``): rays are padded to a multiple of
    ``block_size`` and processed with ``lax.map``, so one compiled block
    program serves any image size. Outputs are reshaped back to [H, W, ...].

    ``rays_impl`` optionally replaces :func:`render_rays` per block entirely
    — e.g. the fully fused PE→MLP→compositing Pallas renderer
    (``dexnerf_tpu.ops.fused_render.make_fused_render_rays``); it receives
    ``(params, block: RayBatch, key|None)`` and returns a RenderResult.

    ``occupancy`` (an :class:`~dexnerf_tpu.render.occupancy.OccupancyGrid`)
    tightens each ray's ``[near, far]`` to its occupied span before
    sampling — empty-space skipping that benefits the XLA path AND the
    fused kernel (both sample ``rays.near/far``). World-space only (NDC
    reparameterizes the frustum, so occupancy + ``use_ndc`` raises).
    """
    img_shape = ray_directions.shape[:-1]
    rays = make_ray_batch(
        ray_origins,
        ray_directions,
        near,
        far,
        use_ndc=use_ndc,
        height=height,
        width=width,
        focal_length=focal_length,
    )
    if occupancy is not None:
        if use_ndc:
            raise ValueError(
                "occupancy-guided sampling is world-space; NDC rays are "
                "reparameterized (nerf_helpers.py:172-199) — disable one"
            )
        from dexnerf_tpu.render.occupancy import (
            tighten_image_intervals,
            tighten_ray_intervals,
        )

        if len(img_shape) == 2:
            # full frame: probe every `occupancy_subsample`-th pixel and
            # propagate conservatively (the grid gather is the cost)
            t_near, t_far = tighten_image_intervals(
                occupancy,
                rays.origins,
                rays.directions,
                rays.near,
                rays.far,
                img_shape,
                num_probes=occupancy_probes,
                subsample=occupancy_subsample,
            )
        else:
            t_near, t_far = tighten_ray_intervals(
                occupancy,
                rays.origins,
                rays.directions,
                rays.near,
                rays.far,
                num_probes=occupancy_probes,
            )
        rays = rays._replace(near=t_near, far=t_far)
    n = rays.origins.shape[0]
    num_blocks = -(-n // block_size)
    pad = num_blocks * block_size - n

    def pad_block(x):
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return x.reshape(num_blocks, block_size, *x.shape[1:])

    blocked = RayBatch(*[pad_block(x) for x in rays])
    keys = (
        jax.random.split(key, num_blocks)
        if key is not None
        else jnp.zeros((num_blocks, 0))
    )

    def render_block(args):
        block, k = args
        if rays_impl is not None:
            return rays_impl(params, block, k if key is not None else None)
        return render_rays(
            coarse_fn,
            fine_fn,
            params,
            block,
            k if key is not None else None,
            settings,
            coarse_field=coarse_field,
            fine_field=fine_field,
        )

    out = jax.lax.map(render_block, (blocked, keys))

    def unblock(x, extra_leading: int = 0):
        # x: [num_blocks, block, ...] or [num_blocks, T, block] for dex depth
        if extra_leading:
            x = jnp.moveaxis(x, 1, 0)  # [T, num_blocks, block]
            flat = x.reshape(x.shape[0], num_blocks * block_size, *x.shape[3:])
            flat = flat[:, :n]
            return flat.reshape(x.shape[0], *img_shape, *x.shape[3:])
        flat = x.reshape(num_blocks * block_size, *x.shape[2:])
        flat = flat[:n]
        return flat.reshape(*img_shape, *x.shape[2:])

    def unblock_outputs(o: VolumeRenderOutputs) -> VolumeRenderOutputs:
        return VolumeRenderOutputs(
            rgb=unblock(o.rgb),
            disparity=unblock(o.disparity),
            accumulation=unblock(o.accumulation),
            weights=unblock(o.weights),
            depth=unblock(o.depth),
            depth_dex=None if o.depth_dex is None else unblock(o.depth_dex, 1),
        )

    return RenderResult(
        coarse=unblock_outputs(out.coarse),
        fine=None if out.fine is None else unblock_outputs(out.fine),
    )
