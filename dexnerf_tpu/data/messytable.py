"""MessyTable-style dataset loader (active-stereo IR / real RGB scenes).

Behavior-parity rebuild of reference ``nerf-pytorch/nerf/load_messytable.py``:
per-prefix scene dirs under ``{basedir}/{train,val,test}/`` each holding a
``meta.pkl`` (with ``extrinsic_l``/``intrinsic_l`` for IR-left, or
``extrinsic``/``intrinsic`` for real RGB), one image per dir, and a GT depth
PNG in millimeters (÷1000 → meters). Quirks preserved: grayscale images are
expanded to 3 channels; ``half_res`` divides the intrinsics' first two rows
by 4 and pins cx=240/cy=135; the final output is always resized to
(H//2, W//2) with ``focal = K[0,0]/4``. Poses are **world-to-camera** (used
with :func:`dexnerf_tpu.core.rays.get_ray_bundle_w2c`).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Tuple

import cv2
import imageio.v2 as imageio
import numpy as np
from PIL import Image

from dexnerf_tpu.data.blender import spherical_render_poses


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def load_messytable_data(
    basedir: str,
    half_res: bool = False,
    testskip: int = 1,
    debug: bool = False,
    imgname: str = "0128_irL_kuafu_half.png",
    is_real_rgb: bool = False,
) -> Tuple[
    np.ndarray, np.ndarray, np.ndarray, List, List[np.ndarray], np.ndarray, np.ndarray
]:
    """Returns ``(images, poses_w2c, render_poses, [H, W, focal], i_split,
    intrinsics, depths)``; depths in meters."""
    if is_real_rgb:
        depth_n, extri_n, intri_n = "depth.png", "extrinsic", "intrinsic"
    else:
        depth_n, extri_n, intri_n = "depthL.png", "extrinsic_l", "intrinsic_l"

    splits = ["train", "val", "test"]
    all_imgs, all_poses, all_intrinsics, all_depths, counts = [], [], [], [], [0]
    meta = None
    for s in splits:
        path = os.path.join(basedir, s)
        imgs, poses, intrinsics, depths = [], [], [], []
        for prefix in sorted(os.listdir(path)):
            meta = _load_pickle(os.path.join(path, prefix, "meta.pkl"))
            img = imageio.imread(os.path.join(path, prefix, imgname))
            if img.ndim != 3:
                img = np.repeat(np.asarray(img)[..., None], 3, axis=-1)
            imgs.append(img)
            depths.append(
                np.array(Image.open(os.path.join(path, prefix, depth_n))) / 1000.0
            )
            poses.append(np.array(meta[extri_n]))
            K = np.array(meta[intri_n], dtype=np.float64).copy()
            if half_res:
                K[:2, :] = K[:2, :] / 4
                K[0, 2] = 240.0
                K[1, 2] = 135.0
            intrinsics.append(K)
        poses = np.array(poses).astype(np.float32)
        intrinsics = np.array(intrinsics).astype(np.float32)
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        depths = np.array(depths).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)
        all_intrinsics.append(intrinsics)
        all_depths.append(depths)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(len(splits))]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    intrinsics = np.concatenate(all_intrinsics, 0)
    depths = np.concatenate(all_depths, 0)

    H, W = imgs[0].shape[:2]
    focal = float(np.array(meta[intri_n])[0, 0])
    render_poses = spherical_render_poses()

    if debug:
        H, W = H // 32, W // 32
        focal = focal / 32.0
        imgs = np.stack(
            [cv2.resize(im, (25, 25), interpolation=cv2.INTER_AREA) for im in imgs], 0
        )
        depths = np.stack(
            [cv2.resize(d, (25, 25), interpolation=cv2.INTER_NEAREST) for d in depths],
            0,
        )
        return imgs, poses, render_poses, [H, W, focal], i_split, intrinsics, depths

    # Reference always halves the output resolution and quarters the focal
    # (load_messytable.py:148-165) — preserved.
    H, W = H // 2, W // 2
    focal = focal / 4.0
    imgs = np.stack(
        [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA) for im in imgs], 0
    )
    depths = np.stack(
        [cv2.resize(d, (W, H), interpolation=cv2.INTER_NEAREST) for d in depths], 0
    )
    return imgs, poses, render_poses, [H, W, focal], i_split, intrinsics, depths
