"""Fused inverse-CDF sampling (Pallas TPU kernel).

TPU-native replacement for the reference's one native component — the
``torchsearchsorted`` CUDA extension used inside ``sample_pdf``
(reference ``nerf-pytorch/nerf/nerf_helpers.py:262-304``). Instead of a
serial binary search + four gathers, the whole op (PDF normalize → CDF →
rank → interpolate) runs in one VMEM-resident kernel using a **branchless,
gather-free** formulation that maps perfectly onto the VPU:

* ``searchsorted(cdf, u, right)`` == the count of CDF entries <= u — one
  broadcasted compare + sum, no bisection;
* since the CDF is ascending, the gathered values are prefix/suffix extrema:
  ``cdf[below] = max_k(cdf_k * [cdf_k <= u])`` and
  ``bins[above] = min over {k : cdf_k > u}`` — computed with masked
  max/min reductions instead of ``take_along_axis`` (gathers are slow on
  TPU's vector memory).

Grid: blocks of rays; each block holds its [R, M] weights, [R, M+1] bins and
[R, N] uniforms in VMEM and writes [R, N] samples. Numerics match
``dexnerf_tpu.core.sampling.sample_pdf`` to float32 round-off (see
tests/test_ops.py parity tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30
_POS_BIG = 1e30


def _sample_pdf_kernel(bins_ref, weights_ref, u_ref, out_ref):
    weights = weights_ref[:] + 1e-5  # [R, M]
    bins = bins_ref[:]  # [R, M+1]
    u = u_ref[:]  # [R, N]

    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    # Prefix sum as an upper-triangular matmul (MXU-friendly; jnp.cumsum has
    # no Mosaic lowering): cdf[j] = sum_{i<=j} pdf[i].
    M = pdf.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    tri = (row <= col).astype(pdf.dtype)
    # HIGHEST precision: the MXU's default bf16 passes would perturb the CDF
    # by ~1e-3, which shifts searchsorted bins on near-flat CDF regions.
    cdf_body = jax.lax.dot_general(
        pdf,
        tri,
        (((1,), (0,)), ((), ())),
        preferred_element_type=pdf.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, M]
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf_body[:, :1]), cdf_body], axis=-1
    )  # [R, M+1]

    # [R, N, M+1] masks
    le = cdf[:, None, :] <= u[:, :, None]
    gt = jnp.logical_not(le)

    cdf_b = cdf[:, None, :]
    bins_b = bins[:, None, :]

    cdf_below = jnp.max(jnp.where(le, cdf_b, _NEG_BIG), axis=-1)
    bins_below = jnp.max(jnp.where(le, bins_b, _NEG_BIG), axis=-1)
    cdf_above = jnp.min(jnp.where(gt, cdf_b, _POS_BIG), axis=-1)
    bins_above = jnp.min(jnp.where(gt, bins_b, _POS_BIG), axis=-1)

    # u >= cdf[-1] (e.g. u == 1.0 on the deterministic grid): no entry above.
    # Reference clamps above to the last index -> below == above there.
    none_above = jnp.all(le, axis=-1)
    cdf_above = jnp.where(none_above, cdf_below, cdf_above)
    bins_above = jnp.where(none_above, bins_below, bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    out_ref[:] = bins_below + t * (bins_above - bins_below)


def sample_pdf_pallas(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    u: jnp.ndarray,
    *,
    block_rays: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Importance-sample depths: fused CDF build + rank + lerp.

    ``bins``: [B, M+1] ascending; ``weights``: [B, M]; ``u``: [B, N] uniforms
    (pass ``linspace(0, 1, N)`` rows for the deterministic path). B must be a
    multiple of ``block_rays`` (renderer blocks guarantee this; pad
    otherwise). Returns [B, N].

    ``block_rays`` bounds the [R, N, M] compare intermediates in VMEM:
    64 rays x 64 samples x 64 bins x 4 B x ~4 live arrays ~= 4 MB, safely
    under the ~16 MB scoped-vmem budget.
    """
    B, N = u.shape
    M1 = bins.shape[-1]
    block = min(block_rays, B)
    if B % block:
        raise ValueError(f"ray count {B} not divisible by block {block}")
    grid = (B // block,)
    return pl.pallas_call(
        _sample_pdf_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), bins.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, M1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, M1 - 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(bins, weights, u)


def sample_pdf_branchless(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    key: Optional[jax.Array] = None,
    *,
    det: bool = False,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`dexnerf_tpu.core.sampling.sample_pdf` backed by the
    fused kernel (or its pure-XLA branchless equivalent when
    ``use_pallas=False`` — e.g. under vmap/CPU)."""
    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, num_samples, dtype=weights.dtype),
            (*weights.shape[:-1], num_samples),
        )
    else:
        if key is None:
            raise ValueError("det=False requires a PRNG key")
        u = jax.random.uniform(
            key, (*weights.shape[:-1], num_samples), dtype=weights.dtype
        )
    if use_pallas:
        return sample_pdf_pallas(bins, weights, u, interpret=interpret)
    return _sample_pdf_branchless_xla(bins, weights, u)


def _sample_pdf_branchless_xla(bins, weights, u):
    """Same gather-free math as the kernel, expressed in plain jnp."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    le = cdf[..., None, :] <= u[..., :, None]
    gt = ~le
    cdf_b = cdf[..., None, :]
    bins_b = bins[..., None, :]
    cdf_below = jnp.max(jnp.where(le, cdf_b, _NEG_BIG), axis=-1)
    bins_below = jnp.max(jnp.where(le, bins_b, _NEG_BIG), axis=-1)
    cdf_above = jnp.min(jnp.where(gt, cdf_b, _POS_BIG), axis=-1)
    bins_above = jnp.min(jnp.where(gt, bins_b, _POS_BIG), axis=-1)
    none_above = jnp.all(le, axis=-1)
    cdf_above = jnp.where(none_above, cdf_below, cdf_above)
    bins_above = jnp.where(none_above, bins_below, bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
