"""LLFF real forward-facing dataset loader.

Behavior-parity rebuild of reference ``nerf-pytorch/nerf/load_llff.py``
(itself the standard LLFF loading code): ``poses_bounds.npy`` → [3,5,N]
poses + [2,N] bounds, factor-based image minification, rotation-axis fixup
([-y x z] → [x y z] ordering), bound rescaling, pose recentering,
spherification, spiral render paths, and nearest-to-average holdout view.

One deliberate deviation: ``_minify`` downsamples with cv2 INTER_AREA
instead of shelling out to ImageMagick ``mogrify`` (reference
``load_llff.py:12-66``) — no external binary dependency, same cached
``images_{factor}/`` directory layout.

Provenance note: the pose math in ``poses_avg`` / ``recenter_poses`` /
``spherify_poses`` / ``render_path_spiral`` is the canonical bmild/LLFF
algorithm that every NeRF implementation carries (reference
``load_llff.py:157-233``); its magic constants (the ``[0.1, 0.2, 0.3]``
tie-break vector, 120 spiral poses, ``dt=0.75``, 90th-percentile radii)
MUST match for output parity and are therefore identical by necessity,
not by copying. The geometry invariants are independently verified in
``tests/test_data.py``.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import imageio.v2 as imageio
import numpy as np

_IMG_EXTS = ("JPG", "jpg", "png", "jpeg", "PNG")


def _image_files(d: str):
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.endswith(_IMG_EXTS)
    ]


def _minify(basedir: str, factors=(), resolutions=()) -> None:
    """Create ``images_{f}`` / ``images_{w}x{h}`` downsampled copies (cv2)."""
    need = False
    for r in factors:
        if not os.path.exists(os.path.join(basedir, f"images_{r}")):
            need = True
    for r in resolutions:
        if not os.path.exists(os.path.join(basedir, f"images_{r[1]}x{r[0]}")):
            need = True
    if not need:
        return

    imgdir_orig = os.path.join(basedir, "images")
    files = _image_files(imgdir_orig)

    for r in list(factors) + list(resolutions):
        if isinstance(r, int):
            name = f"images_{r}"
        else:
            name = f"images_{r[1]}x{r[0]}"
        imgdir = os.path.join(basedir, name)
        if os.path.exists(imgdir):
            continue
        os.makedirs(imgdir)
        for f in files:
            img = imageio.imread(f)
            if isinstance(r, int):
                h, w = img.shape[0] // r, img.shape[1] // r
            else:
                h, w = r[0], r[1]
            small = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
            out = os.path.join(
                imgdir, os.path.splitext(os.path.basename(f))[0] + ".png"
            )
            imageio.imwrite(out, small)


def _load_data(
    basedir: str,
    factor: Optional[int] = None,
    width: Optional[int] = None,
    height: Optional[int] = None,
    load_imgs: bool = True,
):
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    img0 = _image_files(os.path.join(basedir, "images"))[0]
    sh = imageio.imread(img0).shape

    sfx = ""
    if factor is not None:
        sfx = f"_{factor}"
        _minify(basedir, factors=[factor])
    elif height is not None:
        factor = sh[0] / float(height)
        width = int(sh[1] / factor)
        _minify(basedir, resolutions=[[height, width]])
        sfx = f"_{width}x{height}"
    elif width is not None:
        factor = sh[1] / float(width)
        height = int(sh[0] / factor)
        _minify(basedir, resolutions=[[height, width]])
        sfx = f"_{width}x{height}"
    else:
        factor = 1

    imgdir = os.path.join(basedir, "images" + sfx)
    if not os.path.exists(imgdir):
        raise FileNotFoundError(f"{imgdir} does not exist")

    imgfiles = _image_files(imgdir)
    if poses.shape[-1] != len(imgfiles):
        raise ValueError(
            f"mismatch between imgs {len(imgfiles)} and poses {poses.shape[-1]}"
        )

    sh = imageio.imread(imgfiles[0]).shape
    poses[:2, 4, :] = np.array(sh[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / factor

    if not load_imgs:
        return poses, bds

    imgs = [imageio.imread(f)[..., :3] / 255.0 for f in imgfiles]
    imgs = np.stack(imgs, -1)
    return poses, bds, imgs


def normalize(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x)


def viewmatrix(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    vec2 = normalize(z)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses: np.ndarray) -> np.ndarray:
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def render_path_spiral(c2w, up, rads, focal, zdelta, zrate, rots, N):
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, int(N) + 1)[:-1]:
        c = np.dot(
            c2w[:3, :4],
            np.array(
                [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
            )
            * rads,
        )
        z = normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        render_poses.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
    return render_poses


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    poses4 = np.concatenate([poses[:, :3, :4], bottom], -2)
    poses4 = np.linalg.inv(c2w) @ poses4
    poses_[:, :3, :4] = poses4[:, :3, :4]
    return poses_


def spherify_poses(poses: np.ndarray, bds: np.ndarray):
    def p34_to_44(p):
        return np.concatenate(
            [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])],
            1,
        )

    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    # closest point to all camera optical axes (least-squares)
    A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
    b_i = -A_i @ rays_o
    pt_mindist = np.squeeze(
        -np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0)) @ b_i.mean(0)
    )

    center = pt_mindist
    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = normalize(up)
    vec1 = normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(rad ** 2 - zh ** 2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array(
            [radcircle * np.cos(th), radcircle * np.sin(th), zh]
        )
        up = np.array([0, 0, -1.0])
        vec2 = normalize(camorigin)
        vec0 = normalize(np.cross(vec2, up))
        vec1 = normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)

    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)],
        -1,
    )
    poses_reset = np.concatenate(
        [
            poses_reset[:, :3, :4],
            np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape),
        ],
        -1,
    )
    return poses_reset, new_poses, bds


def load_llff_data(
    basedir: str,
    factor: int = 8,
    recenter: bool = True,
    bd_factor: Optional[float] = 0.75,
    spherify: bool = False,
    path_zflat: bool = False,
):
    """Returns ``(images[N,H,W,3], poses[N,3,5], bds[N,2], render_poses,
    i_test)`` — the reference output contract (``load_llff.py:278-354``)."""
    poses, bds, imgs = _load_data(basedir, factor=factor)

    # axis fixup: [-y x z] -> [x y z] column ordering; move N to axis 0
    poses = np.concatenate(
        [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1
    )
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    images = np.moveaxis(imgs, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc

    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal = 1.0 / (((1.0 - dt) / close_depth + dt / inf_depth))
        zdelta = close_depth * 0.2
        tt = poses[:, :3, 3]
        rads = np.percentile(np.abs(tt), 90, 0)
        c2w_path = c2w
        N_views, N_rots = 120, 2
        if path_zflat:
            zloc = -close_depth * 0.1
            c2w_path[:3, 3] = c2w_path[:3, 3] + zloc * c2w_path[:3, 2]
            rads[2] = 0.0
            N_rots = 1
            N_views //= 2
        render_poses = render_path_spiral(
            c2w_path, up, rads, focal, zdelta, zrate=0.5, rots=N_rots, N=N_views
        )

    render_poses = np.array(render_poses).astype(np.float32)
    c2w = poses_avg(poses)
    dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
    i_test = int(np.argmin(dists))
    return images.astype(np.float32), poses.astype(np.float32), bds, render_poses, i_test
