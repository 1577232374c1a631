"""Image/depth quality metrics and error visualization.

Covers the reference's metric surface: MSE/PSNR (``nerf_helpers.py:9-17``),
depth error metrics in millimeters with 2/4/8 mm outlier rates
(``train_utils.py:9-30``), the 11-band blue→red depth-error colormap
(``train_utils.py:31-70``), and a working replacement for the reference's
dead ``ScalarMetric`` running average (``nerf/metrics.py``).

Metric math is jnp (device-side, jit-friendly); the colormap renderer is
numpy (host-side visualization only).
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
import numpy as np


def img2mse(img_src: jnp.ndarray, img_tgt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((img_src - img_tgt) ** 2)


# Rec.601 luma weights (reference train_nerf_ir.py:260-263).
LUMA_WEIGHTS = (0.299, 0.587, 0.114)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luminance — the IR-supervision target transform (single
    source; ``train.step`` re-exports it and the SG-IR shader uses it)."""
    w = jnp.asarray(LUMA_WEIGHTS, dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def mse2psnr(mse: float) -> float:
    """PSNR from MSE; zero-MSE guarded like the reference (``nerf_helpers.py:13-17``)."""
    mse = float(mse)
    if mse == 0:
        mse = 1e-5
    return -10.0 * math.log10(mse)


def ssim(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    *,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity (Wang et al. 2004) between two [H, W, C] images.

    Gaussian-windowed means/variances via separable depthwise convolutions
    (jit-friendly; runs fine on TPU or CPU). Returns the mean SSIM over all
    valid window positions and channels. The reference never computed SSIM
    (PSNR only, ``nerf_helpers.py:9-17``); it is the second standard NeRF
    quality metric and ships beyond parity.
    """
    import jax.lax as lax

    a = jnp.asarray(img_a, jnp.float32)
    b = jnp.asarray(img_b, jnp.float32)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    c = a.shape[-1]
    # clamp the window to the image: a VALID conv with window > dim has
    # zero output positions and jnp.mean of it would be a silent NaN
    window_size = min(window_size, a.shape[0], a.shape[1])
    half = window_size // 2
    x = jnp.arange(window_size, dtype=jnp.float32) - half
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    w = w / jnp.sum(w)

    kh = jnp.tile(w.reshape(1, 1, window_size, 1), (c, 1, 1, 1))
    kv = jnp.tile(w.reshape(1, 1, 1, window_size), (c, 1, 1, 1))

    def blur(img):  # [H, W, C] -> [C, H', W'] gaussian-windowed means
        # HIGHEST precision: TPU convs default to bf16 operands (~3e-3
        # relative error), which breaks the E[x^2] - mu^2 cancellation below
        # (c2 itself is only 9e-4) and can push SSIM past 1.0
        t = img.transpose(2, 0, 1)[None]  # [1, C, H, W]
        t = lax.conv_general_dilated(
            t, kh, (1, 1), "VALID", feature_group_count=c,
            precision=lax.Precision.HIGHEST,
        )
        t = lax.conv_general_dilated(
            t, kv, (1, 1), "VALID", feature_group_count=c,
            precision=lax.Precision.HIGHEST,
        )
        return t[0]

    mu_a = blur(a)
    mu_b = blur(b)
    var_a = blur(a * a) - mu_a * mu_a
    var_b = blur(b * b) - mu_b * mu_b
    cov = blur(a * b) - mu_a * mu_b

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def compute_err_metric(
    depth_gt: jnp.ndarray, depth_pred: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, float]:
    """Depth metrics over masked pixels (reference ``train_utils.py:9-30``).

    * ``depth_abs_err``: mean |gt - pred| in millimeters over the mask.
    * ``depth_rmse``: root-mean-square error in millimeters (the
      BASELINE.md transparent-object metric of record; superset of the
      reference's logged set).
    * ``depth_err{2,4,8}``: fraction of masked pixels whose |error| exceeds
      2/4/8 mm — note the denominator is the number of *masked* pixels, as in
      the reference (``depth_diff.numel()`` after boolean indexing).
    """
    gt = jnp.asarray(depth_gt)[mask]
    pred = jnp.asarray(depth_pred)[mask]
    diff = jnp.abs(gt - pred)
    n = max(int(diff.size), 1)
    return {
        "depth_abs_err": float(jnp.mean(jnp.abs(pred - gt)) * 1000.0),
        "depth_rmse": float(jnp.sqrt(jnp.mean((pred - gt) ** 2)) * 1000.0),
        "depth_err2": float(jnp.sum(diff > 2e-3)) / n,
        "depth_err4": float(jnp.sum(diff > 4e-3)) / n,
        "depth_err8": float(jnp.sum(diff > 8e-3)) / n,
    }


def gen_error_colormap_depth() -> np.ndarray:
    """11-band [lo, hi, r, g, b] colormap table (reference ``train_utils.py:31-45``)."""
    cols = np.array(
        [
            [0, 0.00001, 0, 0, 0],
            [0.00001, 2000.0 / (2 ** 10), 49, 54, 149],
            [2000.0 / (2 ** 10), 2000.0 / (2 ** 9), 69, 117, 180],
            [2000.0 / (2 ** 9), 2000.0 / (2 ** 8), 116, 173, 209],
            [2000.0 / (2 ** 8), 2000.0 / (2 ** 7), 171, 217, 233],
            [2000.0 / (2 ** 7), 2000.0 / (2 ** 6), 224, 243, 248],
            [2000.0 / (2 ** 6), 2000.0 / (2 ** 5), 254, 224, 144],
            [2000.0 / (2 ** 5), 2000.0 / (2 ** 4), 253, 174, 97],
            [2000.0 / (2 ** 4), 2000.0 / (2 ** 3), 244, 109, 67],
            [2000.0 / (2 ** 3), 2000.0 / (2 ** 2), 215, 48, 39],
            [2000.0 / (2 ** 2), np.inf, 165, 0, 38],
        ],
        dtype=np.float32,
    )
    cols[:, 2:5] /= 255.0
    return cols


def depth_error_img(
    depth_est: np.ndarray,
    depth_gt: np.ndarray,
    mask: np.ndarray,
    abs_thres: float = 1.0,
) -> np.ndarray:
    """Colormapped |error| image [H, W, 3] (reference ``train_utils.py:46-70``).

    Inputs are batched [B, H, W]; the first batch element is returned, with
    the per-band color legend stamped into the top-left corner.
    """
    depth_gt = np.asarray(depth_gt)
    depth_est = np.asarray(depth_est)
    mask = np.asarray(mask)
    B, H, W = depth_gt.shape
    error = np.abs(depth_gt - depth_est)
    error[np.logical_not(mask)] = 0
    error[mask] = error[mask] / abs_thres

    cols = gen_error_colormap_depth()
    error_image = np.zeros([B, H, W, 3], dtype=np.float32)
    for i in range(cols.shape[0]):
        error_image[np.logical_and(error >= cols[i][0], error < cols[i][1])] = cols[
            i, 2:
        ]
    error_image[np.logical_not(mask)] = 0.0
    for i in range(cols.shape[0]):
        distance = 20
        error_image[:, :10, i * distance : (i + 1) * distance, :] = cols[i, 2:]
    return error_image[0]


class ScalarMetric:
    """Running average of a scalar (working version of the reference's dead
    ``nerf/metrics.py`` tracker, whose ``peek`` had a broken signature)."""

    def __init__(self) -> None:
        self.total = 0.0
        self.count = 0

    def update(self, value: float) -> None:
        self.total += float(value)
        self.count += 1

    def reset(self) -> None:
        self.total = 0.0
        self.count = 0

    def peek(self) -> float:
        return self.total / self.count if self.count else 0.0
