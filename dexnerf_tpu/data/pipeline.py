"""On-device ray pipeline: the TPU-native replacement for ``cache_dataset.py``.

The reference precomputes ray bundles to thousands of ``torch.save`` shards
on disk and reloads one per training iteration (reference
``cache_dataset.py``, consumed at ``train_nerf_rgb.py:186-220``), or
re-generates the full-image bundle on the GPU every step and samples 1024
pixels from it. Both keep the host in the hot loop.

Here, ray generation runs ONCE, vectorized over all training images
(``vmap`` over poses/intrinsics), and the result lives on device as a single
flat float32 array of packed rays — [N_rays, 12] = (origin 3, direction 3,
viewdir 3, rgb 3). Each training step then just gathers a random batch of
rows *inside* the jitted step (``jax.random.randint`` + ``take``), so steps
are fully device-resident. NDC conversion (LLFF) is applied once at build
time; viewdirs are computed from pre-NDC directions (reference semantics,
``train_utils.py:222-245``).

Memory: 100 images × 400×400 × 12 × 4 B ≈ 768 MB — fine for a TPU HBM; for
larger sets the store can be host-sharded (see ``dexnerf_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dexnerf_tpu.core.rays import (
    get_ray_bundle_c2w,
    get_ray_bundle_w2c,
    ndc_rays,
)
from dexnerf_tpu.render.renderer import RayBatch


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "depth", "intervals"),
    meta_fields=("near", "far", "rays_per_image"),
)
@dataclasses.dataclass(frozen=True)
class RayStore:
    """Flat packed rays on device + scene constants.

    ``rays_per_image`` is 0 for stores without image structure (e.g. built
    from cache shards); when positive, per-image sampling is available.
    The scalar fields are pytree *metadata* (static under jit), so
    per-image sampling can branch on them at trace time.

    ``depth`` optionally carries per-ray ground-truth depth [N] (meters) —
    present when the dataset has GT depth maps (messytable, synthetic) and
    depth supervision is requested (``nerf.train.depth_loss_weight``).

    ``intervals`` optionally carries PER-RAY integration bounds [N, 2]
    (near, far) that override the scene scalars at batch-gather time —
    occupancy-guided training (``render/occupancy.py``) re-tightens them
    periodically from the in-progress density field so the fixed sample
    budget lands where matter is. ``None`` keeps the scalar bounds (and
    the exact reference semantics)."""

    data: jnp.ndarray  # [N, 12]: ro(3) rd(3) viewdir(3) rgb(3)
    near: float
    far: float
    rays_per_image: int = 0
    depth: Optional[jnp.ndarray] = None  # [N] GT depth (meters) or None
    intervals: Optional[jnp.ndarray] = None  # [N, 2] per-ray (near, far)

    @property
    def num_rays(self) -> int:
        return self.data.shape[0]

    @property
    def num_images(self) -> int:
        return (
            self.data.shape[0] // self.rays_per_image
            if self.rays_per_image
            else 0
        )


def _pack(ro, rd, viewdirs, rgb):
    return jnp.concatenate(
        [
            ro.reshape(-1, 3),
            rd.reshape(-1, 3),
            viewdirs.reshape(-1, 3),
            rgb.reshape(-1, 3),
        ],
        axis=-1,
    )


def build_ray_store(
    images: np.ndarray,
    poses: np.ndarray,
    hwf,
    near: float,
    far: float,
    *,
    intrinsics: Optional[np.ndarray] = None,
    use_ndc: bool = False,
    depths: Optional[np.ndarray] = None,
) -> RayStore:
    """Generate and pack rays for every image.

    ``poses`` are c2w [N,4,4] (blender/llff convention) unless ``intrinsics``
    is given, in which case they are w2c and rays use the full K
    (messytable convention). ``use_ndc`` applies the LLFF NDC projection.
    ``depths`` optionally attaches per-pixel GT depth [N,H,W] (meters),
    flattened ray-aligned for depth supervision.
    """
    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    images = jnp.asarray(images[..., :3], dtype=jnp.float32)
    poses = jnp.asarray(poses, dtype=jnp.float32)

    if intrinsics is not None:
        Ks = jnp.asarray(intrinsics, dtype=jnp.float32)
        gen = jax.vmap(
            lambda p, K: get_ray_bundle_w2c(H, W, p, K), in_axes=(0, 0)
        )
        ro, rd = gen(poses, Ks)
    else:
        gen = jax.vmap(
            lambda p: get_ray_bundle_c2w(H, W, focal, p), in_axes=0
        )
        ro, rd = gen(poses[:, :4, :4])

    viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    if use_ndc:
        ro, rd = ndc_rays(H, W, focal, 1.0, ro, rd)

    data = _pack(ro, rd, viewdirs, images)
    depth = None
    if depths is not None:
        depth = jax.device_put(
            jnp.asarray(depths, dtype=jnp.float32).reshape(-1)
        )
        if depth.shape[0] != data.shape[0]:
            raise ValueError(
                f"depths cover {depth.shape[0]} rays, store has "
                f"{data.shape[0]}"
            )
    return RayStore(
        data=jax.device_put(data),
        near=float(near),
        far=float(far),
        rays_per_image=H * W,
        depth=depth,
    )


def build_ray_store_from_cache(
    cachedir: str, near: float, far: float
) -> RayStore:
    """Build the device ray store from an offline cache written by
    ``dexnerf_tpu.apps.cache`` — the equivalent of the reference's
    ``USE_CACHED_DATASET`` branch (``train_nerf_rgb.py:186-220``), except the
    shards are concatenated once into the device-resident store instead of
    being re-read from disk every iteration."""
    import glob
    import os

    rows = []
    shards = sorted(
        glob.glob(os.path.join(cachedir, "train", "*.npz"))
        # the reference's cache_dataset.py writes ``torch.save`` pickles
        # named ``train/XXXX.data`` (cache_dataset.py:104-115); a user's
        # existing reference cache directory trains directly
        + glob.glob(os.path.join(cachedir, "train", "*.data"))
    )
    if not shards:
        raise FileNotFoundError(f"no train shards under {cachedir}/train")
    pack = _host_pack_rays()
    for path in shards:
        if path.endswith(".data"):
            import torch

            d = torch.load(path, map_location="cpu", weights_only=False)
            bundle = np.asarray(d["ray_bundle"], dtype=np.float32)
            ro, rd = bundle[0].reshape(-1, 3), bundle[1].reshape(-1, 3)
            # target may be RGBA and/or full-image shaped; the reference
            # consumes it as [..., :3].reshape(-1, 3)
            # (train_nerf_rgb.py:194)
            rgb = np.asarray(d["target"], dtype=np.float32)[..., :3]
        else:
            with np.load(path) as z:
                ro, rd = z["ray_bundle"][0], z["ray_bundle"][1]
                rgb = z["target"]
        rows.append(pack(ro, rd, rgb))
    data = jnp.asarray(np.concatenate(rows, axis=0))
    return RayStore(data=jax.device_put(data), near=float(near), far=float(far))


def _host_pack_rays():
    """Host-side row packer for store assembly: the native C++ kernel
    (``ops/native/dexnerf_host.cc``: fused normalize+interleave, one pass,
    no intermediates) with a numpy fallback when the toolchain is absent."""
    try:
        from dexnerf_tpu.ops.native import load_library, pack_rays

        load_library()
        return pack_rays
    except Exception:  # pragma: no cover - no g++ at runtime
        def pack_np(ro, rd, rgb):
            ro = np.asarray(ro, np.float32).reshape(-1, 3)
            rd = np.asarray(rd, np.float32).reshape(-1, 3)
            rgb = np.asarray(rgb, np.float32).reshape(-1, 3)
            viewdirs = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
            return np.concatenate([ro, rd, viewdirs, rgb], axis=-1)

        return pack_np


def sample_ray_batch(
    store: RayStore, key: jax.Array, batch_size: int, *,
    return_depth: bool = False,
):
    """Gather a random ray batch (jit-safe). Returns (RayBatch, target_rgb),
    plus per-ray GT depth when ``return_depth`` (store must carry one).

    Sampling is uniform over all training rays. (The reference samples one
    random image then ``num_random_rays`` pixels within it,
    ``train_nerf_rgb.py:222-241``; uniform-over-all-rays is the standard
    "batching" variant of NeRF training and converges at least as well.)
    The index draw is identical with or without ``return_depth``, so
    enabling depth supervision does not perturb the ray stream.
    """
    idx = jax.random.randint(key, (batch_size,), 0, store.num_rays)
    if return_depth:
        return (*take_ray_batch(store, idx), _take_depth(store, idx))
    return take_ray_batch(store, idx)


def sample_ray_batch_per_image(
    store: RayStore, key: jax.Array, batch_size: int, *,
    return_depth: bool = False,
):
    """Reference-semantics sampling: ONE random image, then ``batch_size``
    random pixels within it (``train_nerf_rgb.py:222-241``). Jit-safe."""
    if not store.rays_per_image:
        raise ValueError("store has no image structure (cache-built?)")
    k_img, k_pix = jax.random.split(key)
    img = jax.random.randint(k_img, (), 0, store.num_images)
    pix = jax.random.randint(k_pix, (batch_size,), 0, store.rays_per_image)
    idx = img * store.rays_per_image + pix
    if return_depth:
        return (*take_ray_batch(store, idx), _take_depth(store, idx))
    return take_ray_batch(store, idx)


def _take_depth(store: RayStore, idx: jnp.ndarray) -> jnp.ndarray:
    if store.depth is None:
        raise ValueError(
            "depth supervision needs a store built with GT depths "
            "(build_ray_store(..., depths=...)); this dataset/store has none"
        )
    return jnp.take(store.depth, idx, axis=0)


def take_ray_batch(
    store: RayStore, idx: jnp.ndarray
) -> Tuple[RayBatch, jnp.ndarray]:
    """Gather rows ``idx`` into a RayBatch (jit-safe). Per-ray bounds come
    from ``store.intervals`` when present, else the scene scalars."""
    rows = jnp.take(store.data, idx, axis=0)
    n = rows.shape[0]
    dtype = rows.dtype
    if store.intervals is not None:
        iv = jnp.take(store.intervals, idx, axis=0)
        near, far = iv[:, 0].astype(dtype), iv[:, 1].astype(dtype)
    else:
        near = jnp.full((n,), store.near, dtype=dtype)
        far = jnp.full((n,), store.far, dtype=dtype)
    rays = RayBatch(
        origins=rows[:, 0:3],
        directions=rows[:, 3:6],
        viewdirs=rows[:, 6:9],
        near=near,
        far=far,
    )
    return rays, rows[:, 9:12]


def with_full_intervals(store: RayStore) -> RayStore:
    """Attach explicit per-ray ``intervals`` equal to the scene scalars.

    Occupancy-guided training installs this BEFORE the first step so the
    store's pytree structure (and therefore the compiled train step) never
    changes when the first grid bake replaces the values — a mid-run
    retrace costs minutes on the remote-TPU backend."""
    if store.intervals is not None:
        return store
    n = store.num_rays
    iv = jnp.stack(
        [
            jnp.full((n,), store.near, jnp.float32),
            jnp.full((n,), store.far, jnp.float32),
        ],
        axis=-1,
    )
    return dataclasses.replace(store, intervals=jax.device_put(iv))
