"""Blender-synthetic dataset loader (NeRF ``transforms_*.json`` format).

Behavior-parity rebuild of reference ``nerf-pytorch/nerf/load_blender.py``:
three JSON splits, c2w poses, focal from ``camera_angle_x``, a 40-pose
spherical render path, ``half_res`` (÷4, as in the reference despite the
name), ``testskip`` stride on val/test, and a ``debug`` 25×25 mode. Returns
numpy arrays (host-side; the device pipeline lives in
``dexnerf_tpu.data.pipeline``).
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import cv2
import imageio.v2 as imageio
import numpy as np


def translate_z(t: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def rotate_phi_x(phi: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(phi), np.sin(phi)
    m[1, 1] = m[2, 2] = c
    m[1, 2] = -s
    m[2, 1] = s
    return m


def rotate_theta_y(theta: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(theta), np.sin(theta)
    m[0, 0] = m[2, 2] = c
    m[0, 2] = -s
    m[2, 0] = s
    return m


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """c2w pose on a sphere looking at the origin (reference
    ``load_blender.py:33-38``)."""
    c2w = translate_z(radius)
    c2w = rotate_phi_x(phi_deg / 180.0 * np.pi) @ c2w
    c2w = rotate_theta_y(theta_deg / 180.0 * np.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    return flip @ c2w


def spherical_render_poses(
    num: int = 40, phi: float = -30.0, radius: float = 4.0
) -> np.ndarray:
    angles = np.linspace(-180.0, 180.0, num + 1)[:-1]
    return np.stack([pose_spherical(a, phi, radius) for a in angles], 0)


def load_blender_depths(
    basedir: str,
    testskip: int = 1,
    half_res: bool = False,
    debug: bool = False,
    prefix: str = "d_",
):
    """Load optional per-view metric-depth sidecars for a blender dataset.

    A frame whose ``file_path`` is ``./split/r_k`` may carry a float32
    meters sidecar at ``split/d_k.npy`` (``tools/make_dataset_from_ckpt.py
    --save-depth`` writes them for test views). Returns an ``[N, H, W]``
    float32 array aligned with ``load_blender_data``'s global view order
    (zeros where no sidecar exists — downstream masks treat 0 as invalid,
    reference ``train_nerf_rgb.py:390``), or ``None`` when the dataset
    carries no sidecars at all. The reference format has no depth channel;
    this is the extension that lets the Dex-NeRF depth metrics score
    blender scenes too. ``prefix="d_dex_"`` loads the σ-threshold
    (surface-true) sidecar family instead
    (``make_dataset_from_ckpt.py --save-depth-dex``).
    """
    splits = ["train", "val", "test"]
    per_view, found = [], False
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json"), "r") as fp:
            meta = json.load(fp)
        skip = 1 if (s == "train" or testskip == 0) else testskip
        for frame in meta["frames"][::skip]:
            rel = frame["file_path"]
            d, base = os.path.split(rel)
            sidecar = None
            if base.startswith("r_"):
                cand = os.path.join(basedir, d, prefix + base[2:] + ".npy")
                if os.path.exists(cand):
                    sidecar = np.load(cand).astype(np.float32)
                    found = True
            per_view.append(sidecar)
    if not found:
        return None
    shape = next(d.shape for d in per_view if d is not None)
    depths = np.stack(
        [d if d is not None else np.zeros(shape, np.float32) for d in per_view],
        0,
    )
    if debug:
        size = (25, 25)
    elif half_res:
        size = (shape[1] // 4, shape[0] // 4)
    else:
        return depths
    # nearest-neighbor: averaging metric depth across a resize blends
    # foreground/background into depths that exist on no surface
    return np.stack(
        [
            cv2.resize(d, dsize=size, interpolation=cv2.INTER_NEAREST)
            for d in depths
        ],
        0,
    )


def load_blender_data(
    basedir: str,
    half_res: bool = False,
    testskip: int = 1,
    debug: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List, List[np.ndarray]]:
    """Load ``transforms_{train,val,test}.json`` + PNGs.

    Returns ``(images, poses, render_poses, [H, W, focal], i_split)`` with
    float32 images in [0, 1].
    """
    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json"), "r") as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"], dtype=np.float32))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses, dtype=np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(len(splits))]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    camera_angle_x = float(metas["test"]["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    render_poses = spherical_render_poses()

    if debug:
        # 25x25 smoke-test images (matches the reference's //32 of 800x800).
        H, W = H // 32, W // 32
        focal = focal / 32.0
        imgs = np.stack(
            [
                cv2.resize(im, dsize=(25, 25), interpolation=cv2.INTER_AREA)
                for im in imgs
            ],
            0,
        )
        return imgs, poses, render_poses, [H, W, focal], i_split

    if half_res:
        # Reference divides by 4 despite the name (load_blender.py:107-111).
        H, W = H // 4, W // 4
        focal = focal / 4.0
    imgs = np.stack(
        [cv2.resize(im, dsize=(W, H), interpolation=cv2.INTER_AREA) for im in imgs],
        0,
    )
    return imgs, poses, render_poses, [H, W, focal], i_split
