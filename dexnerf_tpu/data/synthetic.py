"""Procedural synthetic scenes: self-contained data for tests and benchmarks.

The reference relies on external datasets (lego, MessyTable) plus a
``debug=True`` 25×25 loader mode as its only built-in fixture (SURVEY.md §4).
Here we go further: an analytic emission–absorption field (soft spheres)
rendered with the framework's own compositor produces ground-truth posed
images — so end-to-end convergence tests (PSNR rising while fitting an MLP to
the analytic field) and benchmarks run hermetically, with no downloads.

Also provides writers that lay synthetic scenes out on disk in the
blender-JSON and messytable-pickle formats, to exercise the real loaders.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dexnerf_tpu.core.rays import get_ray_bundle_c2w
from dexnerf_tpu.core.volrend import volume_render_radiance_field
from dexnerf_tpu.data.blender import pose_spherical

# Soft-sphere scene constants: centers, radii, albedos, densities.
_SPHERES = (
    ((0.0, 0.0, 0.0), 1.0, (0.9, 0.2, 0.2), 40.0),
    ((0.9, 0.9, 0.0), 0.5, (0.2, 0.4, 0.9), 60.0),
)

# A budget-starved variant: SMALL blobs in a WIDE [near, far] range, so a
# reduced per-ray sample budget genuinely undersamples unless the
# integration intervals are tightened (the occupancy-guided-training A/B
# scene — with 16 coarse samples over [2, 10] the spacing is 0.5, wider
# than the 0.22 blob, so the coarse pass can step straight over it). The
# default scene's blobs span most of its [2, 6] range and cannot
# discriminate sample budgets (measured: 16+16 matches 32+32 within the
# seed band there).
SPARSE_SPHERES = (
    ((0.0, 0.1, 0.0), 0.35, (0.9, 0.3, 0.2), 60.0),
    ((0.7, -0.4, 0.4), 0.22, (0.2, 0.5, 0.9), 80.0),
)

# The TRANSPARENT-OBJECT scene (the Dex-NeRF namesake setting,
# reference ``volume_rendering_utils.py:51-58``): an opaque object inside
# a thin LOW-density glass shell, a second opaque object on an opaque
# floor. Images mostly show through the glass (per-crossing optical depth
# τ = density*thickness*sqrt(2π) ≈ 0.5 → ~60% transmission), so the
# alpha-composited expected depth integrates through the shell and lands
# between surfaces, while the first-σ-crossing depth recovers the shell —
# on a TRAINED field, not just the analytic one (tools/
# transparency_trained_check.py).
GLASS_SPHERES = (
    ((0.0, 0.0, 0.2), 0.45, (0.85, 0.25, 0.2), 80.0),  # core inside glass
    ((1.1, 0.9, -0.4), 0.35, (0.2, 0.4, 0.85), 80.0),  # anchor on the floor
)
GLASS_SHELLS = (
    # (center, radius, thickness, albedo, peak density)
    ((0.0, 0.0, 0.2), 0.95, 0.04, (0.85, 0.92, 1.0), 5.0),
)
GLASS_PLANES = (
    # (normal, offset, albedo, density): occupied where normal·p < offset
    ((0.0, 0.0, 1.0), -0.75, (0.55, 0.5, 0.45), 80.0),
)


def analytic_field(
    pts: jnp.ndarray,
    spheres=None,
    falloff: float = 8.0,
    shells=(),
    planes=(),
) -> jnp.ndarray:
    """Map points [..., 3] to raw radiance-field logits [..., 4].

    Each sphere contributes density ``d * sigmoid(falloff * (r - |p - c|))``
    — a smooth solid blob an MLP can fit. ``shells`` are thin Gaussian
    spherical shells ``d * exp(-(|p-c| - R)^2 / 2t^2)`` (transparent
    surfaces when d is low), ``planes`` are half-spaces
    ``d * sigmoid(falloff * (offset - normal·p))`` (floors/walls).
    Outputs are *logits* (pre-sigmoid rgb, pre-relu σ) so they can be fed
    straight into the compositor. ``spheres`` defaults to the standard
    scene (``_SPHERES``).
    """
    rgb_accum = jnp.zeros((*pts.shape[:-1], 3))
    sigma = jnp.zeros(pts.shape[:-1])
    total_w = jnp.zeros(pts.shape[:-1])
    for center, radius, albedo, density in (
        _SPHERES if spheres is None else spheres
    ):
        dist = jnp.linalg.norm(pts - jnp.asarray(center), axis=-1)
        inside = jax.nn.sigmoid(float(falloff) * (radius - dist))
        sigma = sigma + density * inside
        rgb_accum = rgb_accum + inside[..., None] * jnp.asarray(albedo)
        total_w = total_w + inside
    for center, radius, thickness, albedo, density in shells:
        dist = jnp.linalg.norm(pts - jnp.asarray(center), axis=-1)
        w = jnp.exp(-((dist - radius) ** 2) / (2.0 * thickness**2))
        sigma = sigma + density * w
        rgb_accum = rgb_accum + w[..., None] * jnp.asarray(albedo)
        total_w = total_w + w
    for normal, offset, albedo, density in planes:
        s = jnp.einsum("...k,k->...", pts, jnp.asarray(normal))
        inside = jax.nn.sigmoid(float(falloff) * (offset - s))
        sigma = sigma + density * inside
        rgb_accum = rgb_accum + inside[..., None] * jnp.asarray(albedo)
        total_w = total_w + inside
    rgb = rgb_accum / jnp.maximum(total_w, 1e-6)[..., None]
    # convert rgb in (0,1) to logits; sigma stays as a positive pre-relu value
    rgb_logit = jnp.log(jnp.clip(rgb, 1e-4, 1 - 1e-4)) - jnp.log1p(
        -jnp.clip(rgb, 1e-4, 1 - 1e-4)
    )
    return jnp.concatenate([rgb_logit, sigma[..., None]], axis=-1)


def first_surface_depth(
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    near: float = 2.0,
    far: float = 6.0,
    num_samples: int = 512,
    sigma_thres: float = 1.0,
    spheres=None,
    falloff: float = 8.0,
    shells=(),
    planes=(),
) -> np.ndarray:
    """Ground-truth FIRST-SURFACE depth of the analytic scene along rays.

    The grasp-planner ground truth for transparent scenes: the depth of the
    first point where σ crosses ``sigma_thres`` — densely sampled, so a
    low-density glass shell counts as a surface (unlike the
    alpha-composited expected depth which integrates through it). Rays
    that never cross return 0.0 (the invalid-depth marker, matching the
    messytable convention of 0 = no reading)."""
    t = jnp.linspace(near, far, num_samples)
    pts = ro[..., None, :] + rd[..., None, :] * t[..., :, None]
    raw = analytic_field(
        pts, spheres=spheres, falloff=falloff, shells=shells, planes=planes
    )
    sigma = raw[..., 3]
    hit = sigma > sigma_thres
    idx = jnp.argmax(hit, axis=-1)
    depth = jnp.where(jnp.any(hit, axis=-1), t[idx], 0.0)
    return np.asarray(depth)


def render_analytic_rays(
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    near: float = 2.0,
    far: float = 6.0,
    num_samples: int = 128,
    spheres=None,
    falloff: float = 8.0,
    shells=(),
    planes=(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Ground-truth (rgb, depth) of the analytic scene along given rays."""
    t = jnp.linspace(near, far, num_samples)
    pts = ro[..., None, :] + rd[..., None, :] * t[..., :, None]
    raw = analytic_field(
        pts, spheres=spheres, falloff=falloff, shells=shells, planes=planes
    )
    z = jnp.broadcast_to(t, (*rd.shape[:-1], num_samples))
    out = volume_render_radiance_field(raw, z, rd, white_background=True)
    return np.asarray(out.rgb), np.asarray(out.depth)


def render_analytic_image(
    c2w: np.ndarray,
    height: int,
    width: int,
    focal: float,
    near: float = 2.0,
    far: float = 6.0,
    num_samples: int = 128,
    spheres=None,
    falloff: float = 8.0,
    shells=(),
    planes=(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Ground-truth (rgb, depth) of the analytic scene from one pose."""
    ro, rd = get_ray_bundle_c2w(height, width, focal, jnp.asarray(c2w))
    return render_analytic_rays(
        ro, rd, near, far, num_samples, spheres=spheres, falloff=falloff,
        shells=shells, planes=planes,
    )


def make_synthetic_scene(
    num_views: int = 8,
    height: int = 32,
    width: int = 32,
    focal: float | None = None,
    near: float = 2.0,
    far: float = 6.0,
    seed: int = 0,
    cam_radius: float = 4.0,
    spheres=None,
    falloff: float = 8.0,
    num_gt_samples: int = 128,
    shells=(),
    planes=(),
):
    """Posed ground-truth views of the analytic scene.

    Returns (images[N,H,W,3], depths[N,H,W], poses_c2w[N,4,4], [H, W, focal]).
    """
    if focal is None:
        focal = 1.2 * width
    rng = np.random.RandomState(seed)
    thetas = np.linspace(-180, 180, num_views, endpoint=False)
    phis = -30.0 + rng.uniform(-10, 10, size=num_views)
    poses = np.stack(
        [pose_spherical(t, p, float(cam_radius)) for t, p in zip(thetas, phis)],
        0,
    )
    images, depths = [], []
    for c2w in poses:
        rgb, depth = render_analytic_image(
            c2w, height, width, focal, near, far,
            num_samples=num_gt_samples, spheres=spheres, falloff=falloff,
            shells=shells, planes=planes,
        )
        images.append(rgb)
        depths.append(depth)
    return (
        np.stack(images, 0).astype(np.float32),
        np.stack(depths, 0).astype(np.float32),
        poses.astype(np.float32),
        [height, width, float(focal)],
    )


def write_blender_dataset(
    basedir: str, height: int = 25, width: int = 25, views_per_split=(4, 2, 2)
) -> None:
    """Write a tiny blender-format dataset (transforms JSONs + PNGs)."""
    import imageio.v2 as imageio

    focal = 1.2 * width
    camera_angle_x = 2.0 * np.arctan(0.5 * width / focal)
    idx = 0
    for split, n in zip(["train", "val", "test"], views_per_split):
        frames = []
        os.makedirs(os.path.join(basedir, split), exist_ok=True)
        for k in range(n):
            theta = -180 + 360.0 * (idx / float(sum(views_per_split)))
            c2w = pose_spherical(theta, -30.0, 4.0)
            rgb, _ = render_analytic_image(c2w, height, width, focal)
            rel = f"./{split}/r_{k}"
            imageio.imwrite(
                os.path.join(basedir, f"{rel}.png"),
                (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
            idx += 1
        with open(os.path.join(basedir, f"transforms_{split}.json"), "w") as f:
            json.dump(
                {"camera_angle_x": float(camera_angle_x), "frames": frames}, f
            )


def write_messytable_dataset(
    basedir: str,
    height: int = 32,
    width: int = 32,
    views_per_split=(2, 1, 1),
    imgname: str = "0128_irL_kuafu_half.png",
) -> None:
    """Write a tiny messytable-format dataset (meta.pkl + image + depth PNG).

    Geometry is consistent END-TO-END with the loader + trainer: the
    loader always halves the stored resolution and returns the meta
    intrinsics UNSCALED (reference ``load_messytable.py:148-165``), and
    the trainer unprojects with ``get_ray_bundle_w2c`` (+y-down /
    +z-forward pixel convention) using those intrinsics directly. So the
    ground truth here is rendered along exactly those rays at the
    LOADER-OUTPUT resolution (height//2), stored upscaled 2x (nearest —
    the loader's area-downsize inverts it), and the meta stores the
    output-resolution K. Poses are w2c of an OpenCV-convention camera
    (the blender spherical c2w with its y/z axes flipped, so +z looks at
    the scene); depth PNGs are uint16 millimeters, matching the real
    format. A geometry regression test unprojects the GT depth through
    the loader's rays and asserts it lands on the analytic surfaces.
    """
    import imageio.v2 as imageio
    import jax.numpy as jnp
    from PIL import Image

    from dexnerf_tpu.core.rays import get_ray_bundle_w2c

    h_out, w_out = height // 2, width // 2
    focal = 1.2 * w_out
    K = np.array(
        [[focal, 0, w_out / 2.0], [0, focal, h_out / 2.0], [0, 0, 1]],
        dtype=np.float64,
    )
    # blender c2w looks along -z with +y up; the w2c+K pixel convention
    # is +z forward / +y down — flip those camera axes
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    idx = 0
    total = sum(views_per_split)
    for split, n in zip(["train", "val", "test"], views_per_split):
        for k in range(n):
            d = os.path.join(basedir, split, f"scene-{k}")
            os.makedirs(d, exist_ok=True)
            theta = -180 + 360.0 * (idx / float(total))
            c2w = pose_spherical(theta, -30.0, 4.0).astype(np.float64) @ flip
            w2c = np.linalg.inv(c2w)
            ro, rd = get_ray_bundle_w2c(
                h_out, w_out, jnp.asarray(w2c), jnp.asarray(K)
            )
            rgb, depth = render_analytic_rays(ro, rd)
            gray = (np.clip(rgb.mean(-1), 0, 1) * 255).astype(np.uint8)
            # store at 2x: nearest upsample, so the loader's halving
            # round-trips to the rendered ground truth
            gray2 = np.repeat(np.repeat(gray, 2, axis=0), 2, axis=1)
            imageio.imwrite(os.path.join(d, imgname), gray2)
            depth_mm = (depth * 1000).astype(np.uint16)
            depth2 = np.repeat(np.repeat(depth_mm, 2, axis=0), 2, axis=1)
            Image.fromarray(depth2, mode="I;16").save(
                os.path.join(d, "depthL.png")
            )
            with open(os.path.join(d, "meta.pkl"), "wb") as f:
                pickle.dump(
                    {"extrinsic_l": w2c, "intrinsic_l": K}, f
                )
            idx += 1
