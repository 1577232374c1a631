"""Host-resident ray store with background prefetch — training data that
does not fit HBM.

``build_ray_store`` (data/pipeline.py) keeps every training ray on-device
and samples inside the jitted step: the fastest path whenever the packed
rays fit (the flagship blender scenes are ~100 MB — trivially resident).
Production captures are not always that polite: the reference's messytable
deployments run up to 1M iterations over many high-resolution views
(``config/messytable-obj-remote.yml``), and a few hundred 1080p views
already pack to tens of GB — past v5e's 16 GB HBM.

This module is the scale-out answer on the DATA axis: the packed ray rows
stay in host RAM (built incrementally, one image at a time — peak device
memory during the build is one [H*W, 12] bundle), a background thread
gathers each step's batch and ships it with ``jax.device_put`` while the
chip executes the PREVIOUS step, and the train loop consumes batches
through :func:`dexnerf_tpu.train.step.make_batch_train_step` (the same
step body as the resident path, minus the in-graph gather). The transfer
rides the dispatch pipeline: steady-state, the host gather/copy for step
``i+1`` overlaps device compute for step ``i``.

Trajectory contract: batches are drawn uniform-with-replacement like
``sample_ray_batch``, but from a HOST PRNG (``numpy.random.Generator``) —
a different (statistically equivalent) stream than the device path's
threefry draw. Same-seed runs of the host path are bit-reproducible with
each other; they are not draw-for-draw identical to the resident path.

Opt-in via ``cfg.dataset.host_store: true`` (``train/loop.py``).
Reference analog: none — the reference caps at what fits one GPU's RAM
(its cache loader reads one shard file per iteration from disk,
``train_nerf_rgb.py:186-220``, paying the read on the step's critical
path; here the gather is off the critical path entirely).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional, Tuple

import jax
import numpy as np

from dexnerf_tpu.render.renderer import RayBatch


def build_host_ray_rows(
    images: np.ndarray,
    poses: np.ndarray,
    hwf,
    *,
    intrinsics: Optional[np.ndarray] = None,
    use_ndc: bool = False,
    depths: Optional[np.ndarray] = None,
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Pack rays for every image into HOST memory, one image at a time.

    Returns ``(rows [N_img*H*W, 12] float32, depth [N] | None)`` with the
    same row layout as ``pipeline.RayStore.data`` (ro|rd|viewdir|rgb).
    Peak device memory is a single image's ray bundle. ``out`` lets the
    caller preallocate (e.g. a ``numpy.memmap`` for stores beyond host
    RAM too).
    """
    import jax.numpy as jnp

    from dexnerf_tpu.core.rays import (
        get_ray_bundle_c2w,
        get_ray_bundle_w2c,
        ndc_rays,
    )

    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    n_img = images.shape[0]
    rows_per = H * W
    if out is None:
        out = np.empty((n_img * rows_per, 12), np.float32)
    if out.shape != (n_img * rows_per, 12):
        raise ValueError(f"out has shape {out.shape}, need "
                         f"{(n_img * rows_per, 12)}")

    for i in range(n_img):
        if intrinsics is not None:
            ro, rd = get_ray_bundle_w2c(
                H, W, jnp.asarray(poses[i]), jnp.asarray(intrinsics[i])
            )
        else:
            ro, rd = get_ray_bundle_c2w(
                H, W, focal, jnp.asarray(poses[i][:4, :4])
            )
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        if use_ndc:
            ro, rd = ndc_rays(H, W, focal, 1.0, ro, rd)
        block = np.concatenate(
            [
                np.asarray(ro, np.float32).reshape(-1, 3),
                np.asarray(rd, np.float32).reshape(-1, 3),
                np.asarray(viewdirs, np.float32).reshape(-1, 3),
                np.asarray(images[i][..., :3], np.float32).reshape(-1, 3),
            ],
            axis=1,
        )
        out[i * rows_per : (i + 1) * rows_per] = block

    depth = None
    if depths is not None:
        depth = np.asarray(depths, np.float32).reshape(-1)
        if depth.shape[0] != out.shape[0]:
            raise ValueError(
                f"depths cover {depth.shape[0]} rays, store has "
                f"{out.shape[0]}"
            )
    return out, depth


class HostRayLoader:
    """Uniform ray-batch iterator with one-step-ahead background prefetch.

    Yields ``(RayBatch, target_rgb)`` — plus per-ray GT depth when the
    store carries one — already transferred to the default device. The
    worker thread draws indices, gathers rows (``numpy.take`` — works on
    ndarray and memmap alike), and calls ``jax.device_put``; up to
    ``prefetch`` batches queue ahead of the consumer.
    """

    def __init__(
        self,
        rows: np.ndarray,
        near: float,
        far: float,
        batch_size: int,
        seed: int,
        *,
        depth: Optional[np.ndarray] = None,
        prefetch: int = 2,
    ) -> None:
        if rows.ndim != 2 or rows.shape[1] != 12:
            raise ValueError(f"rows must be [N, 12], got {rows.shape}")
        self._rows = rows
        self._depth = depth
        self._near = float(near)
        self._far = float(far)
        self._batch = int(batch_size)
        self._rng = np.random.default_rng(seed)
        self._q: queue.Queue = queue.Queue(maxsize=max(1, int(prefetch)))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    @property
    def num_rays(self) -> int:
        return self._rows.shape[0]

    def _make_batch(self):
        idx = self._rng.integers(0, self._rows.shape[0], self._batch)
        rows = np.take(self._rows, idx, axis=0)
        near = np.full((self._batch,), self._near, np.float32)
        far = np.full((self._batch,), self._far, np.float32)
        batch = RayBatch(
            origins=jax.device_put(rows[:, 0:3]),
            directions=jax.device_put(rows[:, 3:6]),
            viewdirs=jax.device_put(rows[:, 6:9]),
            near=jax.device_put(near),
            far=jax.device_put(far),
        )
        target = jax.device_put(rows[:, 9:12])
        if self._depth is not None:
            return batch, target, jax.device_put(
                np.take(self._depth, idx, axis=0)
            )
        return batch, target

    def _work(self) -> None:
        while not self._stop.is_set():
            item = self._make_batch()
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                return self._q.get(timeout=1.0)
            except queue.Empty:
                if not self._thread.is_alive():
                    raise RuntimeError("HostRayLoader worker died")

    def close(self) -> None:
        self._stop.set()
        # drain so the worker's blocked put can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# --------------------------------------------------------------- packed wire
#
# The row loader above ships 56 B/ray (12 f32 rows + near/far + 3 f32
# target). On a remote-tunnel rig that wire IS the host-store tax
# (docs/HOST_STORE_SCALE.json: +160 ms/step at batch 16384). But almost
# none of those bytes carry information: rays are a pure function of
# (image pose table, pixel index), and the target rgb was u8 on disk.
# The packed wire ships 7 B/ray — a u32 global ray index + 3 u8 rgb
# (+ 4 B optional f32 depth) — and reconstructs rays IN the jitted train
# step from a device-resident pose table (a few KB). TPU-native answer:
# recompute beats transfer.


def build_pose_tables(
    poses: np.ndarray,
    hwf,
    *,
    intrinsics: Optional[np.ndarray] = None,
    use_ndc: bool = False,
):
    """Precompute the per-image tables ray reconstruction needs.

    Returns a dict of host numpy arrays (jit-constant once closed over):
    ``rot`` [N, 3, 3] camera-to-world rotations, ``origin`` [N, 3] camera
    centers, and for the w2c+K convention the pixel-projection params
    ``fx/fy/cx/cy`` [N] (the reference's fx-for-both-axes quirk included,
    ``nerf_helpers.py:100-101``).
    """
    poses = np.asarray(poses, np.float32)
    n = poses.shape[0]
    if intrinsics is not None:
        # messytable convention: stored pose is w2c; invert on host once
        c2w = np.linalg.inv(poses[:, :4, :4].astype(np.float64))
        K = np.asarray(intrinsics, np.float64)
        fx = K[:, 0, 0]
        return {
            "convention": "w2c",
            "rot": np.linalg.inv(
                poses[:, :3, :3].astype(np.float64)
            ).astype(np.float32),
            "origin": c2w[:, :3, 3].astype(np.float32),
            "fx": fx.astype(np.float32),
            "fy": fx.astype(np.float32),  # reference quirk: fx both axes
            "cx": K[:, 0, 2].astype(np.float32),
            "cy": K[:, 1, 2].astype(np.float32),
            "hwf": [int(hwf[0]), int(hwf[1]), float(hwf[2])],
            "use_ndc": bool(use_ndc),
        }
    return {
        "convention": "c2w",
        "rot": poses[:, :3, :3].astype(np.float32),
        "origin": poses[:, :3, -1].astype(np.float32),
        "hwf": [int(hwf[0]), int(hwf[1]), float(hwf[2])],
        "use_ndc": bool(use_ndc),
    }


def make_ray_unpack(tables, near: float, far: float):
    """Build the in-step unpack: ``(packed dict) -> (RayBatch, target
    [, depth_gt])``.

    The returned function runs INSIDE the jitted train step
    (``make_batch_train_step(unpack=...)``), so the wire carries only
    ``idx`` (u32 global ray index), ``rgb`` (u8), and optionally
    ``depth`` (f32). Ray math mirrors ``core.rays.get_ray_bundle_c2w`` /
    ``get_ray_bundle_w2c`` per-ray (same formulas, f32), then NDC
    reparameterization when the store was built with it.
    """
    import jax.numpy as jnp

    from dexnerf_tpu.core.rays import ndc_rays

    H, W, focal = tables["hwf"]
    rot = jnp.asarray(tables["rot"])
    origin = jnp.asarray(tables["origin"])
    w2c = tables["convention"] == "w2c"
    if w2c:
        fx = jnp.asarray(tables["fx"])
        fy = jnp.asarray(tables["fy"])
        cx = jnp.asarray(tables["cx"])
        cy = jnp.asarray(tables["cy"])
    use_ndc = tables["use_ndc"]

    def unpack(packed):
        idx = packed["idx"].astype(jnp.int32)
        img = idx // (H * W)
        pix = idx - img * (H * W)
        col = (pix % W).astype(jnp.float32)
        row = (pix // W).astype(jnp.float32)
        if w2c:
            dirs = jnp.stack(
                [
                    (col - cx[img]) / fx[img],
                    (row - cy[img]) / fy[img],
                    jnp.ones_like(col),
                ],
                axis=-1,
            )
        else:
            dirs = jnp.stack(
                [
                    (col - W * 0.5) / focal,
                    -(row - H * 0.5) / focal,
                    -jnp.ones_like(col),
                ],
                axis=-1,
            )
        # per-ray rotation: out[b, r] = sum_c dirs[b, c] * rot[img[b], r, c]
        rd = jnp.sum(dirs[:, None, :] * rot[img], axis=-1)
        ro = origin[img]
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        if use_ndc:
            ro, rd = ndc_rays(H, W, focal, 1.0, ro, rd)
        n = idx.shape[0]
        rays = RayBatch(
            origins=ro,
            directions=rd,
            viewdirs=viewdirs,
            near=jnp.full((n,), float(near), jnp.float32),
            far=jnp.full((n,), float(far), jnp.float32),
        )
        target = packed["rgb"].astype(jnp.float32) * (1.0 / 255.0)
        if "depth" in packed:
            return rays, target, packed["depth"]
        return rays, target

    return unpack


class HostPixelLoader:
    """Packed-wire analog of :class:`HostRayLoader`: ships ``{idx: u32,
    rgb: u8[, depth: f32]}`` per batch (7-11 B/ray vs 56) and lets the
    jitted step reconstruct rays from the pose table
    (:func:`make_ray_unpack`). Same uniform-with-replacement host-PRNG
    draw contract as HostRayLoader — same seed, same index stream.
    """

    def __init__(
        self,
        rgb_u8: np.ndarray,
        batch_size: int,
        seed: int,
        *,
        depth: Optional[np.ndarray] = None,
        prefetch: int = 2,
    ) -> None:
        if rgb_u8.ndim != 2 or rgb_u8.shape[1] != 3 or \
                rgb_u8.dtype != np.uint8:
            raise ValueError(
                f"rgb_u8 must be [N, 3] uint8, got {rgb_u8.shape} "
                f"{rgb_u8.dtype}"
            )
        self._rgb = rgb_u8
        self._depth = depth
        self._batch = int(batch_size)
        self._rng = np.random.default_rng(seed)
        self._q: queue.Queue = queue.Queue(maxsize=max(1, int(prefetch)))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    @property
    def num_rays(self) -> int:
        return self._rgb.shape[0]

    def _make_batch(self):
        idx = self._rng.integers(0, self._rgb.shape[0], self._batch)
        packed = {
            "idx": jax.device_put(idx.astype(np.uint32)),
            "rgb": jax.device_put(np.take(self._rgb, idx, axis=0)),
        }
        if self._depth is not None:
            packed["depth"] = jax.device_put(
                np.take(self._depth, idx, axis=0)
            )
        return packed

    _work = HostRayLoader._work
    __next__ = HostRayLoader.__next__
    __iter__ = HostRayLoader.__iter__
    close = HostRayLoader.close
    __enter__ = HostRayLoader.__enter__
    __exit__ = HostRayLoader.__exit__


def images_to_u8(images: np.ndarray) -> np.ndarray:
    """Flatten [N, H, W, 3] float images (0..1) to the [N*H*W, 3] u8 store
    the packed wire ships — lossless w.r.t. the original 8-bit pixels."""
    return np.clip(
        np.round(np.asarray(images[..., :3], np.float32) * 255.0),
        0.0, 255.0,
    ).astype(np.uint8).reshape(-1, 3)
