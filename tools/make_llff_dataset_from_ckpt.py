"""Render an LLFF-format forward-facing dataset FROM a trained checkpoint.

The blender generator (``tools/make_dataset_from_ckpt.py``) closes the
"no datasets ship with the reference" gap for the six spherical-orbit
scenes; this closes it for the seventh — fern, the LLFF/NDC forward-facing
scene. It writes a real on-disk LLFF dataset (``poses_bounds.npy`` +
``images/``) that ``load_llff_data`` consumes unchanged, with images
rendered out of the shipped converged checkpoint through the NDC path.

Self-consistency by construction (two phases): the LLFF loader transforms
poses on load (axis fixup -> bd rescale -> recenter, reference
``load_llff.py:278-354``), so instead of inverting that pipeline the tool
first writes ``poses_bounds.npy`` with placeholder images, RE-LOADS the
dataset through ``load_llff_data`` itself, and renders the checkpoint at
the exact poses the trainer will see. Whatever rigid/scale transform the
loader applies, images and poses agree by definition.

    python tools/make_llff_dataset_from_ckpt.py \
        --config  .../pretrained/fern-lowres/config.yml \
        --checkpoint .../pretrained/fern-lowres/checkpoint249999.ckpt \
        --out data/fern_distill --views 44 --size 378 504

Camera cluster: forward-facing look-at poses jittered around the identity
(the frame the recentered fern field lives in), bounds chosen so the
loader's ``1/(bds.min()*0.75)`` rescale is exactly 1. Every ``llffhold``-th
view becomes the held-out set, as in the reference's LLFF protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--views", type=int, default=44)
    p.add_argument(
        "--size", type=int, nargs=2, default=(378, 504), metavar=("H", "W"),
        help="frame size (fern at the reference's factor-8 is 378x504)",
    )
    p.add_argument(
        "--focal", type=float, default=410.0,
        help="focal length in pixels at --size",
    )
    p.add_argument(
        "--spread", type=float, nargs=3, default=(0.25, 0.18, 0.08),
        metavar=("X", "Y", "Z"),
        help="camera-position jitter half-extents around the origin",
    )
    p.add_argument(
        "--focus", type=float, default=2.0,
        help="look-at point distance along -z (sets the parallax)",
    )
    p.add_argument(
        "--bounds", type=float, nargs=2, default=(4.0 / 3.0, 8.0),
        help="near/far scene bounds written per view; the default makes "
        "the loader's bd rescale exactly 1",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--samples", type=int, nargs=2, default=None,
        metavar=("COARSE", "FINE"),
    )
    p.add_argument(
        "--save-depth", action="store_true",
        help="write per-view teacher-depth sidecars depths/d_{k}.npy "
        "(expected depth) and depths/d_dex_{k}.npy (σ-threshold surface "
        "at --depth-dex-m), float32 METRIC ray distance in scene units — "
        "the NDC render's [0,1] ray parameter is converted through "
        "core.rays.ndc_t_to_world_depth, so LLFF/NDC depth becomes "
        "scoreable with the same mm metrics as the blender scenes "
        "(× the LLFF loader's arbitrary scene scale)",
    )
    p.add_argument(
        "--depth-dex-m", type=float, default=25.0, metavar="M",
        help="σ threshold for the d_dex sidecars (the blender generator's "
        "default grid midpoint; the eval sweep re-selects per view)",
    )
    p.add_argument(
        "--platform", type=str, default=None, choices=("cpu", "tpu", "axon"),
    )
    return p


def _lookat_c2w(pos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """NeRF-convention c2w 3x4: columns [right, up, back, t]."""
    back = pos - target
    back = back / np.linalg.norm(back)
    up_world = np.array([0.0, 1.0, 0.0])
    right = np.cross(up_world, back)
    right = right / np.linalg.norm(right)
    up = np.cross(back, right)
    return np.stack([right, up, back, pos], axis=1).astype(np.float64)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.data.llff import load_llff_data
    from dexnerf_tpu.render import render_image
    from dexnerf_tpu.train.loop import (
        load_eval_params,
        maybe_fused_render_impl,
        setup_models,
    )

    H, W = int(args.size[0]), int(args.size[1])
    n = int(args.views)
    rng = np.random.default_rng(args.seed)

    # phase A: poses_bounds + placeholder images, loader storage convention
    # (loaded columns are [st_col1, -st_col0, st_col2...], so storage is
    # [-c2w_col1, c2w_col0, c2w_col2...])
    rows = []
    for _ in range(n):
        pos = rng.uniform(-1.0, 1.0, 3) * np.asarray(args.spread)
        c2w = _lookat_c2w(pos, np.array([0.0, 0.0, -float(args.focus)]))
        hwf = np.array([[H], [W], [args.focal]], np.float64)
        loaded = np.concatenate([c2w, hwf], axis=1)  # desired post-fixup 3x5
        storage = np.concatenate(
            [-loaded[:, 1:2], loaded[:, 0:1], loaded[:, 2:]], axis=1
        )
        rows.append(
            np.concatenate([storage.reshape(-1), np.asarray(args.bounds)])
        )
    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    np.save(
        os.path.join(args.out, "poses_bounds.npy"),
        np.stack(rows, 0).astype(np.float64),
    )
    placeholder = np.zeros((H, W, 3), np.uint8)
    for k in range(n):
        imageio.imwrite(
            os.path.join(args.out, "images", f"r_{k:03d}.png"), placeholder
        )

    # phase B: re-load through the real loader, render at the loaded poses
    _, poses, bds, _, _ = load_llff_data(args.out, factor=1)
    cfg = load_config(args.config)
    cfg, params, _, _ = load_eval_params(cfg, args.checkpoint)
    coarse_fn, fine_fn, _ = setup_models(cfg, int(cfg.experiment.randomseed))
    s_val = render_settings_from_cfg(cfg, "validation").eval_variant()
    if args.samples is not None:
        import dataclasses

        s_val = dataclasses.replace(
            s_val,
            num_coarse=int(args.samples[0]),
            num_fine=int(args.samples[1]),
        )
    if args.save_depth:
        import dataclasses

        from dexnerf_tpu.core.rays import ndc_t_to_world_depth

        # σ-threshold depth rides the fine pass (reference semantics).
        # MUST precede maybe_fused_render_impl: the fused kernel bakes
        # its settings at construction, so a post-hoc m_thres_cand is
        # invisible to it (depth_dex comes back None on the TPU path —
        # found on chip; the CPU/XLA path reads settings at call time)
        s_val = dataclasses.replace(
            s_val, m_thres_cand=(float(args.depth_dex_m),)
        )
        os.makedirs(os.path.join(args.out, "depths"), exist_ok=True)
    rays_impl = maybe_fused_render_impl(cfg, s_val)
    focal_loaded = float(poses[0, 2, 4])

    @jax.jit
    def render_frame(pose44):
        ro, rd = get_ray_bundle_c2w(H, W, focal_loaded, pose44)
        out = render_image(
            coarse_fn, fine_fn, params, ro, rd, 0.0, 1.0, s_val,
            use_ndc=True, height=H, width=W, focal_length=focal_loaded,
            rays_impl=rays_impl,
        )
        r = out.fine if out.fine is not None else out.coarse
        res = {"rgb": r.rgb}
        if args.save_depth:
            res["acc"] = r.accumulation
            # NDC ray parameter -> metric ray distance (scene units); the
            # same conversion apps.eval applies to the student, so
            # sidecar and prediction live in one unit system
            res["depth"] = ndc_t_to_world_depth(
                r.depth, ro, rd, H, W, focal_loaded
            )
            res["depth_dex"] = ndc_t_to_world_depth(
                r.depth_dex[0], ro, rd, H, W, focal_loaded
            )
        return res

    times = []
    exp_vs_dex = []
    for k in range(n):
        pose44 = np.eye(4, dtype=np.float32)
        pose44[:3, :4] = poses[k, :3, :4]
        t0 = time.time()
        res = render_frame(jnp.asarray(pose44))
        rgb = np.asarray(res["rgb"])
        times.append(time.time() - t0)
        png = (np.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8)
        # the loader reads images_1/ at factor 1 (a _minify copy of the
        # placeholders) — overwrite both so any factor re-derives cleanly
        imageio.imwrite(os.path.join(args.out, "images", f"r_{k:03d}.png"), png)
        p1 = os.path.join(args.out, "images_1", f"r_{k:03d}.png")
        if os.path.exists(os.path.dirname(p1)):
            imageio.imwrite(p1, png)
        if args.save_depth:
            # 0 = no reading (rays that never hit matter)
            hit = np.asarray(res["acc"]) > 0.5
            d_exp = np.where(
                hit, np.asarray(res["depth"], np.float32), np.float32(0.0)
            )
            d_dex = np.where(
                hit, np.asarray(res["depth_dex"], np.float32),
                np.float32(0.0),
            )
            np.save(os.path.join(args.out, "depths", f"d_{k}.npy"), d_exp)
            np.save(
                os.path.join(args.out, "depths", f"d_dex_{k}.npy"), d_dex
            )
            if hit.any():
                # teacher self-consistency: expected depth vs its own
                # σ-surface — validates --depth-dex-m for THIS field
                exp_vs_dex.append(
                    float(np.median(np.abs(d_exp - d_dex)[hit]))
                )

    with open(os.path.join(args.out, "source.json"), "w") as f:
        json.dump(
            {
                "checkpoint": os.path.abspath(args.checkpoint),
                "config": os.path.abspath(args.config),
                "size": [H, W],
                "focal": float(args.focal),
                "views": n,
                "spread": list(args.spread),
                "focus": float(args.focus),
                "bounds": list(args.bounds),
                "seed": int(args.seed),
                "depth_sidecars": bool(args.save_depth),
                "depth_dex_m": (
                    float(args.depth_dex_m) if args.save_depth else None
                ),
                "depth_units": (
                    "metric ray distance, LLFF scene units "
                    "(NDC-converted via core.rays.ndc_t_to_world_depth)"
                    if args.save_depth else None
                ),
            },
            f,
            indent=1,
        )
    print(
        f"LLFF dataset at {args.out}: {n} views {H}x{W} f={focal_loaded:.1f}, "
        f"avg {np.mean(times):.3f}s/frame"
    )
    if exp_vs_dex:
        print(
            "teacher exp-vs-dex median agreement: "
            f"{1000.0 * float(np.median(exp_vs_dex)):.1f} scene-mm "
            f"(σ threshold {args.depth_dex_m:g})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
