"""Image conversion helpers shared by the CLI apps and loggers."""

from __future__ import annotations

import numpy as np


def cast_to_image(rgb: np.ndarray) -> np.ndarray:
    """Float [0,1] HWC -> uint8 (reference ``train_nerf_rgb.py:447-455``)."""
    return (np.clip(np.asarray(rgb), 0.0, 1.0) * 255).astype(np.uint8)


def cast_to_gray_image(img: np.ndarray) -> np.ndarray:
    """Grayscale-aware cast (reference ``train_nerf_ir.py:449-459``)."""
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = arr @ np.array([0.299, 0.587, 0.114], dtype=arr.dtype)
    return (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)


def cast_to_disparity_image(disp: np.ndarray, max_disp: float = 2.0) -> np.ndarray:
    """Clamp disparity to [0, max_disp] and scale to uint8
    (reference ``eval_nerf.py:34-45``)."""
    img = np.clip(np.asarray(disp), 0.0, max_disp) / max_disp
    return (img * 255).astype(np.uint8)


def apply_jet_colormap(gray01: np.ndarray) -> np.ndarray:
    """Jet colormap on a [0,1] image -> uint8 RGB (reference uses matplotlib
    ``cm.jet`` for disparity visualization, ``eval_nerf.py:196-205``)."""
    import matplotlib.cm as cm

    return (cm.jet(np.clip(np.asarray(gray01), 0, 1))[..., :3] * 255).astype(
        np.uint8
    )
