"""Ray generation and reparameterization.

The reference carries two incompatible camera conventions (see SURVEY.md §2
"consistency note"):

* **c2w + focal** ("blender/llff" convention, the upstream nerf-pytorch
  4-arg ``get_ray_bundle``): pose is camera-to-world, pixel directions use
  ``((i - W/2)/f, -(j - H/2)/f, -1)`` and are rotated by ``c2w[:3, :3]``.
* **w2c + K** ("messytable" convention, reference
  ``nerf-pytorch/nerf/nerf_helpers.py:67-112``): pose is world-to-camera and
  is inverted on the fly; pixel directions use the full intrinsic matrix —
  with the reference's quirk of using ``K[0,0]`` (fx) for *both* axes —
  and +z forward.

We implement both, explicitly named, plus NDC reparameterization
(``nerf_helpers.py:172-199``). Everything is batched/jit-friendly: no Python
loops, static H/W, poses may be stacked and ``vmap``-ed.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def meshgrid_xy(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """np.meshgrid(..., indexing="xy") (reference ``nerf_helpers.py:28-40``)."""
    ii, jj = jnp.meshgrid(a, b, indexing="xy")
    return ii, jj


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """(ii, jj) pixel-center coordinate grids of shape [H, W].

    ``ii`` varies along width (x / column), ``jj`` along height (y / row) —
    the reference's ``meshgrid_xy(arange(W), arange(H))`` layout, which yields
    [W, H]-shaped grids; we produce the transposed [H, W] layout used by every
    image-shaped tensor downstream. (The reference's [W, H] ray bundles are
    flattened before use, and it samples coordinates consistently, so only the
    pairing of (pixel -> ray) matters; we keep the natural [H, W] layout.)
    """
    jj, ii = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    return ii, jj


def _rotate(directions: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """``out[..., r] = sum_c directions[..., c] * rot[r, c]`` (i.e. R @ d).

    Written as a broadcasted multiply-add rather than a matmul: a 3x3
    contraction gains nothing from the MXU and an explicit sum keeps full
    float32 precision regardless of the default matmul precision.
    """
    return jnp.sum(directions[..., None, :] * rot, axis=-1)


def get_ray_bundle_c2w(
    height: int,
    width: int,
    focal_length,
    c2w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays from a camera-to-world pose + focal length (blender/llff).

    Upstream nerf-pytorch convention (reference ``tiny_nerf.py`` /
    ``cache_dataset.py:73`` call shape): directions
    ``((i - W*0.5)/f, -(j - H*0.5)/f, -1)`` rotated into world frame.

    Returns (ray_origins[H, W, 3], ray_directions[H, W, 3]).
    """
    dtype = c2w.dtype
    ii, jj = pixel_grid(height, width, dtype)
    directions = jnp.stack(
        [
            (ii - width * 0.5) / focal_length,
            -(jj - height * 0.5) / focal_length,
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )
    rays_d = _rotate(directions, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_ray_bundle_w2c(
    height: int,
    width: int,
    w2c: jnp.ndarray,
    intrinsic: jnp.ndarray,
    fx_for_both_axes: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays from a world-to-camera pose + full 3x3 intrinsics (messytable).

    Reference semantics (``nerf_helpers.py:89-112``): pixel directions
    ``((i - cx)/fx, (j - cy)/fy', 1)`` with ``fy' = fx`` when
    ``fx_for_both_axes`` (the reference always uses ``intrinsic[0, 0]`` for
    both axes — preserved behind this flag), rotated by ``inv(w2c)[:3, :3]``;
    origin is the camera center ``inv(w2c)[:3, 3]``.

    Returns (ray_origins[H, W, 3], ray_directions[H, W, 3]).
    """
    dtype = w2c.dtype
    ii, jj = pixel_grid(height, width, dtype)
    fx = intrinsic[0, 0]
    fy = intrinsic[0, 0] if fx_for_both_axes else intrinsic[1, 1]
    directions = jnp.stack(
        [
            (ii - intrinsic[0, 2]) / fx,
            (jj - intrinsic[1, 2]) / fy,
            jnp.ones_like(ii),
        ],
        axis=-1,
    )
    c2w = jnp.linalg.inv(w2c)
    # Reference contraction (nerf_helpers.py:106-109):
    #   rays_d[..., r] = sum_c directions[..., c] * inv(R)[r, c]
    # i.e. directions @ inv(R).T; the origin comes from the inverted full
    # matrix's translation column.
    inv_rot = jnp.linalg.inv(w2c[:3, :3])
    rays_d = _rotate(directions, inv_rot)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_ray_bundle(
    height: int,
    width: int,
    focal_length,
    pose: jnp.ndarray,
    intrinsic: jnp.ndarray | None = None,
):
    """Dispatcher covering both reference call signatures.

    4-arg form (``get_ray_bundle(H, W, focal, c2w)``) -> c2w convention;
    5-arg form with ``intrinsic`` -> w2c+K convention (reference
    ``nerf_helpers.py:67``). This restores the stale 4-arg call sites
    (``eval_nerf.py:174``, ``cache_dataset.py:73``) to working order.
    """
    if intrinsic is None:
        return get_ray_bundle_c2w(height, width, focal_length, pose)
    return get_ray_bundle_w2c(height, width, pose, intrinsic)


def ndc_rays(
    height: int,
    width: int,
    focal_length,
    near,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift to the near plane and project into NDC space.

    Matches reference ``nerf_helpers.py:172-199`` (original NeRF LLFF math).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    sx = -1.0 / (width / (2.0 * focal_length))
    sy = -1.0 / (height / (2.0 * focal_length))

    o0 = sx * ox / oz
    o1 = sy * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = sx * (dx / dz - ox / oz)
    d1 = sy * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def ndc_t_to_world_depth(
    t: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    height: int,
    width: int,
    focal_length,
    near: float = 1.0,
) -> jnp.ndarray:
    """Convert NDC ray parameters to metric world-space ray distance.

    The NDC render path (reference ``nerf_helpers.py:172-199`` semantics)
    samples ``t`` in [0, 1] along the projected ray, so its depth outputs
    (expected depth AND the σ-threshold Dex-NeRF depth,
    ``volume_rendering_utils.py:51-58``) are NDC parameters, not metric.
    This inverts the projective map: the NDC point ``o' + t·d'`` has
    world z = ``2·near/(p_z − 1)`` (the z-component of ``ndc_rays`` is
    ``1 + 2·near/z``), x/y follow from the perspective divide, and the
    returned value is the Euclidean distance from the ORIGINAL world ray
    origin to that reconstructed point — in scene units (for LLFF scenes
    that is the loader's bd-rescaled unit, not millimetres; scale is
    consistent between any two fields rendered through the same loader).

    NDC preserves straight lines, so for sample-valued ``t`` (the
    σ-threshold first-crossing) the conversion is exact; for EXPECTED
    depth it converts the expectation's location (f(E[t]), not E[f(t)]) —
    fine for surface comparison as long as both sides use it.

    ``t`` broadcasts against the ray batch: [H, W] rays accept [H, W] or
    [T, H, W] (threshold-swept) parameters.
    """
    o_ndc, d_ndc = ndc_rays(height, width, focal_length, near, rays_o, rays_d)
    p = o_ndc + t[..., None] * d_ndc
    sx = -1.0 / (width / (2.0 * focal_length))
    sy = -1.0 / (height / (2.0 * focal_length))
    # p_z → 1 is the far plane at infinity; clamp so t == 1 stays finite
    z = 2.0 * near / jnp.minimum(p[..., 2] - 1.0, -1e-6)
    x = p[..., 0] * z / sx
    y = p[..., 1] * z / sy
    pw = jnp.stack([x, y, z], axis=-1)
    return jnp.linalg.norm(pw - rays_o, axis=-1)
