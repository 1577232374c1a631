"""Offline ray-bundle cache (reference ``cache_dataset.py``).

The on-device pipeline (``dexnerf_tpu.data.pipeline``) supersedes this for
training on TPU, but the offline-cache mode is kept for workflow parity:
precompute sampled train ray shards and full-image validation bundles to
``.npz`` files (instead of ``torch.save`` ``.data`` shards).

Shard schema mirrors the reference (``cache_dataset.py:104-132``):
train shards: {height, width, focal_length, ray_bundle[2, N, 3], target[N, 3]};
val shards:   {height, width, focal_length, ray_origins, ray_directions, target}.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datapath", type=str, required=True)
    p.add_argument("--type", type=str, default="blender",
                   choices=["blender", "llff", "messytable"])
    p.add_argument("--savedir", type=str, required=True)
    p.add_argument("--halfres", action="store_true")
    p.add_argument("--num-random-rays", type=int, default=8192)
    p.add_argument("--num-variations", type=int, default=1,
                   help="sampled shards per train image")
    p.add_argument("--testskip", type=int, default=1)
    p.add_argument("--torch-format", action="store_true",
                   help="write reference-format torch.save .data shards "
                        "(cache_dataset.py:104-132) instead of .npz")
    p.add_argument(
        "--platform",
        type=str,
        default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (e.g. cpu when the TPU tunnel is "
        "unavailable); overrides the environment's pinned default",
    )
    return p


def cache_nerf_dataset(args) -> None:
    import jax
    import jax.numpy as jnp

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.core.rays import get_ray_bundle_c2w, get_ray_bundle_w2c

    intrinsics = None
    if args.type == "blender":
        from dexnerf_tpu.data import load_blender_data

        images, poses, _, hwf, i_split = load_blender_data(
            args.datapath, half_res=args.halfres, testskip=args.testskip
        )
        i_train, i_val = i_split[0], i_split[1]
    elif args.type == "messytable":
        from dexnerf_tpu.data import load_messytable_data

        images, poses, _, hwf, i_split, intrinsics, _ = load_messytable_data(
            args.datapath, half_res=args.halfres, testskip=args.testskip
        )
        i_train, i_val = i_split[0], i_split[1]
    else:
        from dexnerf_tpu.data import load_llff_data

        images, poses_llff, _, _, i_test = load_llff_data(args.datapath)
        hwf = [int(poses_llff[0, 0, 4]), int(poses_llff[0, 1, 4]),
               float(poses_llff[0, 2, 4])]
        n = images.shape[0]
        poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        poses[:, :3, :4] = poses_llff[:, :3, :4]
        i_val = np.array([i_test])
        i_train = np.array([i for i in range(n) if i != i_test])

    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    os.makedirs(os.path.join(args.savedir, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.savedir, "val"), exist_ok=True)

    torch_format = bool(getattr(args, "torch_format", False))

    def save_shard(split: str, stem: str, payload: dict) -> None:
        if torch_format:
            # reference interop: torch.save pickle with tensor values,
            # named <stem>.data (cache_dataset.py:104-132) — readable by
            # the reference's USE_CACHED_DATASET train branch
            import torch

            out = {
                k: (torch.from_numpy(np.ascontiguousarray(v))
                    if isinstance(v, np.ndarray) else v)
                for k, v in payload.items()
            }
            torch.save(out, os.path.join(args.savedir, split, stem + ".data"))
        else:
            np.savez(os.path.join(args.savedir, split, stem + ".npz"),
                     **payload)

    def gather_rows(packed: np.ndarray, seed: int, batch: int) -> np.ndarray:
        """Random-row gather for shard sampling: the native C++ kernel
        (``ops/native/dexnerf_host.cc``, one fused pass) with a numpy
        fallback. The native path samples with replacement; at typical
        shard/image ratios (8k of 160k rays) the difference from the
        reference's replace=False choice is statistically negligible."""
        try:
            from dexnerf_tpu.ops.native import gather_random_rows, load_library

            load_library()
            return gather_random_rows(packed, seed=seed, batch=batch)
        except Exception:  # pragma: no cover - no toolchain at runtime
            rng = np.random.RandomState(seed)
            sel = rng.choice(packed.shape[0], size=batch, replace=False)
            return packed[sel]

    def bundle(idx):
        if intrinsics is not None:
            ro, rd = get_ray_bundle_w2c(
                H, W, jnp.asarray(poses[idx]), jnp.asarray(intrinsics[idx])
            )
        else:
            ro, rd = get_ray_bundle_c2w(H, W, focal, jnp.asarray(poses[idx]))
        return np.asarray(ro), np.asarray(rd)

    shard = 0
    for idx in i_train:
        ro, rd = bundle(int(idx))
        target = images[int(idx)][..., :3].reshape(-1, 3)
        ro_f, rd_f = ro.reshape(-1, 3), rd.reshape(-1, 3)
        packed = np.concatenate([ro_f, rd_f, target], axis=-1).astype(
            np.float32
        )
        for _ in range(args.num_variations):
            rows = gather_rows(
                packed, seed=shard,
                batch=min(args.num_random_rays, packed.shape[0]),
            )
            save_shard(
                "train", f"{shard:04d}",
                dict(
                    height=H,
                    width=W,
                    focal_length=focal,
                    ray_bundle=np.stack([rows[:, 0:3], rows[:, 3:6]], 0),
                    target=rows[:, 6:9],
                ),
            )
            shard += 1

    for k, idx in enumerate(i_val):
        ro, rd = bundle(int(idx))
        save_shard(
            "val", f"{k:04d}",
            dict(
                height=H,
                width=W,
                focal_length=focal,
                ray_origins=ro,
                ray_directions=rd,
                target=images[int(idx)][..., :3],
            ),
        )
    print(f"cached {shard} train shards, {len(i_val)} val bundles -> {args.savedir}")


def load_cached_shard(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def main(argv=None) -> int:
    cache_nerf_dataset(build_parser().parse_args(argv))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
