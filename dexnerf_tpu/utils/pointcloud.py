"""Depth-map → colored point-cloud export (ASCII PLY, no dependencies).

Dex-NeRF's end product is metric depth for grasping
(``train_dexnerf_rgb.py:363-428`` computes it; BASELINE.md's metric of
record is transparent-object depth RMSE) — but the reference never exports
GEOMETRY: downstream grasp planners consume point clouds, and its users
must back-project the saved depth PNGs themselves. Here the back-projection
ships: depths are parametric ``t`` along the (unnormalized) ray directions
— the convention of ``volume_render_radiance_field``'s expected depth AND
``sigma_threshold_depth``'s first-crossing depth — so a pixel's world point
is simply ``origin + t * direction``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def depth_to_points(
    ray_origins: np.ndarray,
    ray_directions: np.ndarray,
    depth: np.ndarray,
    *,
    rgb: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
    return_keep: bool = False,
):
    """Back-project a depth map: ``point = o + t * d`` per pixel.

    ``depth`` is parametric t ([..., ] matching the leading dims of the ray
    arrays, e.g. [H, W]); ``mask`` selects pixels to keep (finite/positive
    depths are always required). Returns ``(points [M, 3], colors [M, 3]
    float in [0, 1] | None)``, plus the flat boolean keep mask when
    ``return_keep`` (to align per-pixel attributes with the kept points).
    """
    ro = np.asarray(ray_origins, np.float32).reshape(-1, 3)
    rd = np.asarray(ray_directions, np.float32).reshape(-1, 3)
    t = np.asarray(depth, np.float32).reshape(-1)
    keep = np.isfinite(t) & (t > 0)
    if mask is not None:
        keep &= np.asarray(mask, bool).reshape(-1)
    pts = ro[keep] + t[keep, None] * rd[keep]
    colors = None
    if rgb is not None:
        colors = np.clip(
            np.asarray(rgb, np.float32).reshape(-1, 3)[keep], 0.0, 1.0
        )
    if return_keep:
        return pts, colors, keep
    return pts, colors


def write_ply(
    path: str,
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    confidence: Optional[np.ndarray] = None,
) -> None:
    """ASCII PLY writer (header + one vertex per line; colors as uint8;
    optional per-vertex float ``confidence`` property — the depth-trust
    channel grasp planners gate on)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    lines = [
        "ply",
        "format ascii 1.0",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if colors is not None:
        lines += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    if confidence is not None:
        lines.append("property float confidence")
        conf = np.asarray(confidence, np.float32).reshape(-1)
        if conf.shape[0] != n:
            raise ValueError(
                f"confidence has {conf.shape[0]} values for {n} points"
            )
    lines.append("end_header")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
        c8 = (
            np.clip(np.asarray(colors) * 255.0 + 0.5, 0, 255).astype(np.uint8)
            if colors is not None
            else None
        )
        for i, p in enumerate(points):
            row = f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}"
            if c8 is not None:
                row += f" {c8[i][0]} {c8[i][1]} {c8[i][2]}"
            if confidence is not None:
                row += f" {conf[i]:.4f}"
            f.write(row + "\n")


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Minimal ASCII PLY reader (round-trip/testing aid)."""
    with open(path) as f:
        header = []
        for line in f:
            header.append(line.strip())
            if line.strip() == "end_header":
                break
        n = next(
            int(h.split()[-1]) for h in header if h.startswith("element vertex")
        )
        has_color = any("uchar red" in h for h in header)
        rows = [f.readline().split() for _ in range(n)]
    arr = np.asarray(rows, np.float64)
    pts = arr[:, :3].astype(np.float32)
    colors = (
        arr[:, 3:6].astype(np.float32) / 255.0 if has_color else None
    )
    return pts, colors
