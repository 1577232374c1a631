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
``spherify_poses`` / ``render_path_spiral`` implements the canonical
bmild/LLFF algorithm that every NeRF implementation carries (reference
``load_llff.py:157-233``); its magic constants (the ``[0.1, 0.2, 0.3]``
tie-break vector, 120 spiral poses, ``dt=0.75``, 90th-percentile radii)
MUST match for output parity. The function bodies here are this repo's
own vectorized formulations (batched ``_se3`` homogeneous transforms, a
closed-form ring instead of per-angle loops); equivalence with the
reference implementation is pinned numerically by
``tests/test_data.py::test_pose_math_matches_reference`` (runs the
reference's own functions side by side) plus independent geometry
invariants.
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


def normalize(x: np.ndarray, axis: Optional[int] = None) -> np.ndarray:
    """Unit vector(s); ``axis`` for batched rows."""
    return x / np.linalg.norm(x, axis=axis, keepdims=axis is not None)


def _se3(p34: np.ndarray) -> np.ndarray:
    """[..., 3, 4] camera-to-world -> [..., 4, 4] homogeneous transform."""
    bottom = np.broadcast_to(
        np.array([0.0, 0.0, 0.0, 1.0]), p34.shape[:-2] + (1, 4)
    )
    return np.concatenate([p34, bottom], axis=-2)


def viewmatrix(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """[3, 4] camera frame at ``pos``: +z along ``z`` (view direction),
    +x right-handed against the ``up`` hint, +y re-orthogonalized."""
    forward = normalize(z)
    right = normalize(np.cross(up, forward))
    true_up = normalize(np.cross(forward, right))
    return np.stack([right, true_up, forward, pos], 1)


def poses_avg(poses: np.ndarray) -> np.ndarray:
    """The "average" camera [3, 5]: centroid position, summed view
    directions and up hints, plus the first pose's hwf column."""
    cam = viewmatrix(
        z=poses[:, :3, 2].sum(0),
        up=poses[:, :3, 1].sum(0),
        pos=poses[:, :3, 3].mean(0),
    )
    return np.concatenate([cam, poses[0, :3, -1:]], 1)


def render_path_spiral(c2w, up, rads, focal, zdelta, zrate, rots, N):
    """``N`` poses on a spiral around the average camera ``c2w``: centers
    trace cos/sin ellipses (radii ``rads``) in its x/y plane with a z
    oscillation at ``zrate``, every pose looking at the point ``focal``
    units in front of the average camera. ``zdelta`` is unused (kept for
    the reference call signature, ``load_llff.py:183``)."""
    thetas = np.linspace(0.0, 2.0 * np.pi * rots, int(N) + 1)[:-1]
    # homogeneous offsets in the average-camera frame, scaled per-axis
    offsets = np.stack(
        [
            np.cos(thetas) * rads[0],
            -np.sin(thetas) * rads[1],
            -np.sin(thetas * zrate) * rads[2],
            np.ones_like(thetas),
        ],
        1,
    )
    centers = offsets @ c2w[:3, :4].T  # [N, 3] world-frame
    look_at = c2w[:3, :4] @ np.array([0.0, 0.0, -focal, 1.0])
    hwf = c2w[:, 4:5]
    return [
        np.concatenate([viewmatrix(c - look_at, up, c), hwf], 1)
        for c in centers
    ]


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Re-express every camera in the average camera's frame (the average
    pose becomes the identity)."""
    world_from_avg = _se3(poses_avg(poses)[:3, :4])
    out = poses.copy()
    out[:, :3, :4] = (
        np.linalg.inv(world_from_avg) @ _se3(poses[:, :3, :4])
    )[:, :3, :4]
    return out


def _axes_focus_point(poses: np.ndarray) -> np.ndarray:
    """Least-squares point closest to all camera optical axes: minimize
    sum_i |P_i (x - o_i)|^2 where P_i projects off axis i."""
    fwd = poses[:, :3, 2:3]  # [N, 3, 1]
    origins = poses[:, :3, 3:4]
    proj = np.eye(3) - fwd @ np.transpose(fwd, (0, 2, 1))
    # normal equations: (mean_i P_i^T P_i) x = mean_i P_i^T P_i o_i
    lhs = (np.transpose(proj, (0, 2, 1)) @ proj).mean(0)
    rhs = (proj @ origins).mean(0)
    return np.squeeze(np.linalg.inv(lhs) @ rhs)


def spherify_poses(poses: np.ndarray, bds: np.ndarray):
    """Recenter on the cameras' mutual focus point, scale to unit mean
    radius, and build a 120-pose horizontal render ring at the cameras'
    mean height. Constants (the [0.1, 0.2, 0.3] tie-break vector, 120
    poses, -z world up) are the canonical LLFF values (see module
    docstring)."""
    focus = _axes_focus_point(poses)

    # world frame whose z points from the focus toward the camera cloud;
    # column order here is [x, y, z] stacked as [vec1, vec2, vec0] in the
    # reference's naming — an arbitrary-but-fixed frame, NOT viewmatrix()
    z_axis = normalize((poses[:, :3, 3] - focus).mean(0))
    x_axis = normalize(np.cross([0.1, 0.2, 0.3], z_axis))
    y_axis = normalize(np.cross(z_axis, x_axis))
    world_from_new = np.stack([x_axis, y_axis, z_axis, focus], 1)

    recentred = np.linalg.inv(_se3(world_from_new[None])) @ _se3(
        poses[:, :3, :4]
    )
    mean_radius = np.sqrt(np.mean(np.sum(recentred[:, :3, 3] ** 2, -1)))
    scale = 1.0 / mean_radius
    recentred[:, :3, 3] *= scale
    bds = bds * scale

    # render ring: radius on the unit sphere at the cameras' mean height
    ring_h = np.mean(recentred[:, :3, 3], 0)[2]
    ring_r = np.sqrt(1.0 - ring_h ** 2)
    th = np.linspace(0.0, 2.0 * np.pi, 120)
    centers = np.stack(
        [ring_r * np.cos(th), ring_r * np.sin(th), np.full_like(th, ring_h)],
        1,
    )
    # per-pose frame, reference op order (cross(fwd, up), not viewmatrix)
    fwd = normalize(centers, axis=1)
    right = normalize(np.cross(fwd, np.array([0.0, 0.0, -1.0])), axis=1)
    ring_up = normalize(np.cross(fwd, right), axis=1)
    ring = np.stack([right, ring_up, fwd, centers], -1)  # [120, 3, 4]

    def with_hwf(p34):
        hwf = np.broadcast_to(poses[0, :3, -1:], p34.shape[:-1] + (1,))
        return np.concatenate([p34, hwf], -1)

    return with_hwf(recentred[:, :3, :4]), with_hwf(ring), bds


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


def load_llff_depths(
    basedir: str, n: int, prefix: str = "d_"
) -> Optional[np.ndarray]:
    """Load per-view depth sidecars for an LLFF scene.

    ``tools/make_llff_dataset_from_ckpt.py --save-depth`` writes
    ``{basedir}/depths/{prefix}{k}.npy`` (float32, metric ray distance in
    scene units, 0 = no reading) indexed like the sorted image list the
    loader consumes — ``prefix="d_"`` for the teacher's expected depth,
    ``"d_dex_"`` for its σ-threshold surface. Returns [N, H, W] float32,
    or None when the sidecar set is absent/incomplete (all-or-nothing, so
    a partially written set can't silently score against zeros).
    """
    d = os.path.join(basedir, "depths")
    paths = [os.path.join(d, f"{prefix}{k}.npy") for k in range(n)]
    if not all(os.path.exists(p) for p in paths):
        return None
    return np.stack([np.load(p).astype(np.float32) for p in paths], axis=0)
