"""Depth sampling along rays: stratified coarse samples + inverse-CDF fine samples.

TPU-native re-design of the reference's hierarchical sampling
(``nerf-pytorch/nerf/train_utils.py:111-133`` for the stratified pass,
``nerf-pytorch/nerf/nerf_helpers.py:224-304`` + the third-party
``torchsearchsorted`` CUDA extension for the inverse-CDF pass).

Key design decision: the reference's CUDA ``searchsorted`` binary search is
replaced by a **branchless rank computation** — for ~65 CDF bins it is far
cheaper on a vector machine to compare every sample against every bin edge
(one [B, N, M] broadcasted compare + a sum over M on the VPU) than to run a
serial bisection. ``side="right"`` semantics fall out as
``inds = sum(cdf <= u)``. A fused Pallas version (CDF build + rank + lerp in
one VMEM-resident kernel) lives in ``dexnerf_tpu.ops.sample_pdf_pallas``.

All functions are pure; randomness is via explicit ``jax.random`` keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    num_samples: int,
    *,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Deterministic bin centers: linspace in depth (or in disparity).

    ``near``/``far`` are [...,] per-ray scalars. Returns [..., num_samples].
    Reference: ``train_utils.py:111-123``.
    """
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.result_type(near, far))
    near = near[..., None]
    far = far[..., None]
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


def perturb_z_vals(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter: uniform sample within each bin (``train_utils.py:126-133``)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def searchsorted_right(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(..., side="right")`` as a branchless rank.

    ``sorted_seq``: [..., M] ascending per batch row; ``values``: [..., N].
    Returns int32 [..., N] insertion indices in [0, M]. Semantics match
    ``torchsearchsorted.searchsorted(cdf, u, side="right")``
    (reference ``nerf_helpers.py:290``): the count of entries <= value.
    """
    return jnp.sum(
        (sorted_seq[..., None, :] <= values[..., :, None]).astype(jnp.int32), axis=-1
    )


def weights_to_cdf(weights: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Normalize weights[..., M] to a CDF [..., M+1] with a leading zero.

    Reference ``nerf_helpers.py:267-272`` (incl. the +1e-5 nan guard).
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    return jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    key: Optional[jax.Array] = None,
    *,
    det: bool = False,
) -> jnp.ndarray:
    """Importance-sample ``num_samples`` depths from a per-ray piecewise PDF.

    ``bins``: [..., M+1] sorted bin edges (the coarse z midpoints);
    ``weights``: [..., M] unnormalized bin masses. ``det=True`` uses an evenly
    spaced grid in [0, 1] instead of uniform draws (then ``key`` may be None).

    Semantics match BOTH reference variants: ``sample_pdf_2``
    (``nerf_helpers.py:262-304``, the working path's choice) and the
    original ``sample_pdf`` (``nerf_helpers.py:224-259``). The two are
    numerically identical — same +1e-5 pdf guard, same right-searchsorted
    rank, same below/above clamps (``max(0, inds-1)`` / ``min(M, inds)``;
    v1 writes the zero operand as ``zeros_like(inds)`` vs v2's
    ``zeros_like(inds - 1)``, same result), same guarded lerp — v1 merely
    routes the gathers through its ``gather_cdf_util`` helper. One
    function therefore covers both (``sample_pdf_v1`` aliases it for API
    parity); the equivalence is pinned by
    ``tests/test_ops.py::test_sample_pdf_matches_v1_gather_semantics``.

    Implementation is **gather-free** (TPU gathers are slow): since the CDF
    is ascending, ``cdf[inds-1]``/``bins[inds-1]`` are the maxima over the
    prefix ``{cdf <= u}`` and ``cdf[inds]``/``bins[inds]`` the minima over
    the suffix — masked extrema over the same [..., N, M+1] compare matrix
    that computes the rank. Equivalence vs the gather formulation is tested
    to float32 round-off (tests/test_ops.py).
    """
    cdf = weights_to_cdf(weights)  # [..., M+1]

    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=weights.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))
    else:
        if key is None:
            raise ValueError("sample_pdf with det=False requires a PRNG key")
        u = jax.random.uniform(
            key, (*cdf.shape[:-1], num_samples), dtype=weights.dtype
        )

    big = jnp.asarray(1e30, dtype=weights.dtype)
    le = cdf[..., None, :] <= u[..., :, None]  # [..., N, M+1]
    cdf_b = cdf[..., None, :]
    bins_b = bins[..., None, :]
    cdf_below = jnp.max(jnp.where(le, cdf_b, -big), axis=-1)
    bins_below = jnp.max(jnp.where(le, bins_b, -big), axis=-1)
    cdf_above = jnp.min(jnp.where(le, big, cdf_b), axis=-1)
    bins_above = jnp.min(jnp.where(le, big, bins_b), axis=-1)
    # u >= cdf[-1]: no suffix -> reference clamps above to the last index,
    # making below == above there.
    none_above = jnp.all(le, axis=-1)
    cdf_above = jnp.where(none_above, cdf_below, cdf_above)
    bins_above = jnp.where(none_above, bins_below, bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


# The reference's first sample_pdf implementation (nerf_helpers.py:224-259)
# is numerically identical to sample_pdf_2 (see the docstring above); expose
# the name so both reference spellings resolve.
sample_pdf_v1 = sample_pdf


def hierarchical_z_vals(
    key: Optional[jax.Array],
    z_vals_coarse: jnp.ndarray,
    weights_coarse: jnp.ndarray,
    num_fine: int,
    *,
    det: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fine-pass depths: sample_pdf over the coarse midpoints, merged + sorted.

    Mirrors ``train_utils.py:163-173``: bins are the coarse z midpoints,
    weights drop the first and last coarse weight, the fine samples are
    concatenated with the coarse depths and sorted. Returns
    (z_vals_merged [..., C+F], z_samples [..., F]).
    """
    z_mid = 0.5 * (z_vals_coarse[..., 1:] + z_vals_coarse[..., :-1])
    z_samples = sample_pdf(
        z_mid, weights_coarse[..., 1:-1], num_fine, key, det=det
    )
    z_samples = jax.lax.stop_gradient(z_samples)
    z_merged = jnp.sort(
        jnp.concatenate([z_vals_coarse, z_samples], axis=-1), axis=-1
    )
    return z_merged, z_samples
