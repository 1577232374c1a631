"""Spherical-Gaussian PBR shading (active-IR illumination rendering).

JAX re-design of the reference's ``SgRenderer`` (reference
``nerf-pytorch/nerf/render.py`` + ``nerf/math_utils.py`` — dead code there,
kept for the planned IR-active-light work; implemented live here). A scene's
incident illumination is a mixture of spherical Gaussians
``G(v) = a * exp(s * (v . axis - 1))``; shading evaluates a Cook-Torrance
style BRDF against that mixture in closed form (Neural-PIL / PhySG
formulation): Lambert diffuse via a hemisphere-cosine SG approximation, GGX
specular via an SG warp of the NDF, Schlick Fresnel.

Everything is a pure function over ``[..., L, 7]`` SG arrays
(amplitude 3, axis 3, sharpness 1), fully vmap/jit friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

_EPS = 1e-7


# -- numeric helpers (reference nerf/math_utils.py surface) ------------------

def saturate(x, low=0.0, high=1.0):
    return jnp.clip(x, low, high)


def srgb_to_linear(x):
    x = saturate(x)
    return jnp.where(
        x >= 0.04045,
        ((jnp.maximum(x, 0.04045) + 0.055) / 1.055) ** 2.4,
        x / 12.92,
    )


def mix(x, y, a):
    a = jnp.clip(a, 0.0, 1.0)
    return x * (1 - a) + y * a


def dot(x, y):
    return jnp.sum(x * y, axis=-1, keepdims=True)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, _EPS))


def safe_exp(x):
    return jnp.exp(jnp.minimum(x, 87.5))


def safe_log(x):
    return jnp.log(jnp.minimum(x, 33e37))


def magnitude(x):
    return safe_sqrt(dot(x, x))


def normalize(x):
    m = magnitude(x)
    return jnp.where(m <= jnp.sqrt(_EPS), jnp.zeros_like(x), x / m)


def reflect(d, n):
    return d - 2.0 * dot(d, n) * n


# -- spherical gaussians -----------------------------------------------------

class SG(NamedTuple):
    """A spherical-Gaussian mixture, unpacked."""

    amplitude: jnp.ndarray  # [..., 3] (>= 0)
    axis: jnp.ndarray  # [..., 3] (unit)
    sharpness: jnp.ndarray  # [..., 1] in [0.5, 30]


def unpack_sg(
    sg: jnp.ndarray,
    compress_amplitude: bool = False,
    compress_sharpness: bool = False,
) -> SG:
    """[..., 7] packed -> SG (abs/normalize/saturate, optional log-space)."""
    amp = safe_exp(sg[..., 0:3]) if compress_amplitude else sg[..., 0:3]
    sharp = safe_exp(sg[..., 6:7]) if compress_sharpness else sg[..., 6:7]
    return SG(
        amplitude=jnp.abs(amp),
        axis=normalize(sg[..., 3:6]),
        sharpness=saturate(sharp, 0.5, 30.0),
    )


def pack_sg(amplitude, axis, sharpness) -> jnp.ndarray:
    return jnp.concatenate(
        [amplitude, axis, jnp.broadcast_to(sharpness, (*axis.shape[:-1], 1))],
        axis=-1,
    )


def sg_evaluate(sg: SG, d: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the mixture lobes along direction d."""
    return sg.amplitude * safe_exp(sg.sharpness * (dot(d, sg.axis) - 1.0))


def sg_integral(sg: SG) -> jnp.ndarray:
    """Closed-form integral of an SG over the sphere."""
    exp_term = 1.0 - safe_exp(-2.0 * sg.sharpness)
    return 2.0 * np.pi * (sg.amplitude / sg.sharpness) * exp_term


def sg_inner_product(a: SG, b: SG) -> jnp.ndarray:
    """Closed-form integral of the product of two SGs over the sphere."""
    um_len = magnitude(a.sharpness * a.axis + b.sharpness * b.axis)
    expo = safe_exp(um_len - a.sharpness - b.sharpness) * a.amplitude * b.amplitude
    other = 1.0 - safe_exp(-2.0 * um_len)
    return (2.0 * np.pi * expo * other) / um_len


# -- BRDF terms --------------------------------------------------------------

def ggx_ndf_sg(normal: jnp.ndarray, roughness: jnp.ndarray) -> SG:
    """GGX normal-distribution function approximated as an SG about n."""
    a2 = saturate(roughness * roughness, 1e-3)
    amp = jnp.broadcast_to(1.0 / (np.pi * a2), (*normal.shape[:-1], 3))
    return SG(
        amplitude=amp,
        axis=normal,
        sharpness=2.0 / jnp.maximum(a2, 1e-6),
    )


def sg_warp_distribution(ndf: SG, view_dir: jnp.ndarray) -> SG:
    """Warp the NDF SG from half-vector space into reflection space."""
    return SG(
        amplitude=ndf.amplitude,
        axis=reflect(-view_dir, ndf.axis),
        sharpness=ndf.sharpness
        / (4.0 * saturate(dot(ndf.axis, view_dir), 1e-4)),
    )


def _ggx_smith(a2, ndx):
    return 1.0 / (ndx + safe_sqrt(a2 + (1 - a2) * ndx * ndx))


def evaluate_diffuse(illum: SG, diffuse_albedo, normal) -> jnp.ndarray:
    """Lambert diffuse under the SG mixture (hemisphere-cosine fit)."""
    diff = diffuse_albedo / np.pi
    mudn = saturate(dot(illum.axis, normal))

    c0 = 0.36
    c1 = 1.0 / (4.0 * c0)
    eml = safe_exp(-illum.sharpness)
    em2l = eml * eml
    rl = 1.0 / illum.sharpness
    scale = 1.0 + 2.0 * em2l - rl
    bias = (eml - em2l) * rl - em2l

    x = safe_sqrt(1.0 - scale)
    x0 = c0 * mudn
    x1 = c1 * x
    n = x0 + x1
    y = jnp.where(
        jnp.abs(x0) <= x1, n * (n / jnp.maximum(x, 1e-6)), mudn
    )
    return (scale * y + bias) * sg_integral(illum) * diff


def evaluate_specular(
    illum: SG, specular_f0, roughness, warped_ndf: SG, ndl, ndv, ldh
) -> jnp.ndarray:
    a2 = saturate(roughness * roughness, 1e-3)
    D = sg_inner_product(warped_ndf, illum)
    G = _ggx_smith(a2, ndl) * _ggx_smith(a2, ndv)
    F = specular_f0 + (1.0 - specular_f0) * (1.0 - ldh) ** 5
    return jnp.maximum(D * G * F * ndl, 0.0)


def sg_shade(
    sg_illuminations: jnp.ndarray,
    basecolor: jnp.ndarray,
    metallic: jnp.ndarray,
    roughness: jnp.ndarray,
    normal: jnp.ndarray,
    view_dir: jnp.ndarray,
    alpha: Optional[jnp.ndarray] = None,
    *,
    eval_background: bool = False,
    compress_amplitude: bool = False,
    compress_sharpness: bool = False,
) -> jnp.ndarray:
    """Shade surface points under an SG illumination mixture.

    ``sg_illuminations``: [B, L, 7]; ``basecolor``: [B, 3] (sRGB);
    ``metallic``/``roughness``: [B, 1]; ``normal``/``view_dir``: [B, 3];
    ``alpha``: [B] or [B, 1] (only with ``eval_background``). Returns [B, 3]
    linear radiance (relu-clamped), matching the reference ``SgRenderer``
    forward contract (``render.py:19-60``).
    """
    lin_base = srgb_to_linear(basecolor)
    diffuse = lin_base * (1 - metallic)
    specular = mix(jnp.ones_like(lin_base) * 0.04, lin_base, metallic)
    normal = jnp.where(normal == 0.0, view_dir, normal)

    # lift to [B, 1, ...] so SG lobe axis L broadcasts
    diffuse = diffuse[:, None, :]
    specular = specular[:, None, :]
    roughness = roughness[:, None, :]
    normal = normalize(normal)[:, None, :]
    view_dir = normalize(view_dir)[:, None, :]

    illum = unpack_sg(sg_illuminations, compress_amplitude, compress_sharpness)

    ndf = ggx_ndf_sg(normal, roughness)
    warped = sg_warp_distribution(ndf, view_dir)
    ndl = saturate(dot(normal, warped.axis))
    ndv = saturate(dot(normal, view_dir))
    h = normalize(warped.axis + view_dir)
    ldh = saturate(dot(warped.axis, h))

    brdf = evaluate_diffuse(illum, diffuse, normal) + evaluate_specular(
        illum, specular, roughness, warped, ndl, ndv, ldh
    )
    brdf = jnp.sum(brdf, axis=1)

    if eval_background:
        if alpha is None:
            raise ValueError("eval_background requires alpha")
        env = jnp.sum(sg_evaluate(illum, view_dir), axis=1)
        if alpha.ndim == 1:
            alpha = alpha[:, None]
        alpha = jnp.clip(alpha, 0.0, 1.0)
        return jnp.maximum(brdf * alpha + env * (1 - alpha), 0.0)
    return jnp.maximum(brdf, 0.0)
