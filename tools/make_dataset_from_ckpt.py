"""Render a blender-format multi-view dataset FROM a trained checkpoint.

Turns any checkpoint — ours (orbax) or the reference's shipped pretrained
``.ckpt`` artifacts (reference ``train_nerf_rgb.py:427-441`` schema) — into
an on-disk ``transforms_{train,val,test}.json`` + PNG dataset that
``load_blender_data`` consumes unchanged.

Why: the reference repo ships 7 converged checkpoints but none of the
datasets they were trained on, so "train a real visually-complex scene end
to end" cannot be driven from the shipped artifacts alone. This tool closes
the loop: the checkpoint becomes the scene (its renders ARE posed views of
a real object), and a fresh model trained on them is scored against
held-out renders — a hermetic real-imagery training drive, and a general
field→field distillation data generator (e.g. re-train a smaller/faster
architecture from a converged big one).

    python tools/make_dataset_from_ckpt.py \
        --config  .../pretrained/lego-lowres/config.yml \
        --checkpoint .../pretrained/lego-lowres/checkpoint199999.ckpt \
        --hwf 400 400 555.555 --out /tmp/lego_views --views 36 4 8

Poses are sampled on the blender spherical orbit (``pose_spherical``,
reference ``load_blender.py:33-38``): per split, theta covers the full
circle with a split-specific offset (held-out views sit BETWEEN training
azimuths) and phi draws uniformly from ``--phi-range`` under a fixed seed.
``--save-depth`` additionally writes each test view's expected depth as
``test/d_{k}.npy`` (float32 meters) so depth metrics can score the distilled
field too.
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
    p.add_argument(
        "--hwf", type=float, nargs=3, default=None, metavar=("H", "W", "F"),
        help="frame height/width/focal; defaults to the checkpoint's stored "
        "geometry when present (the shipped *-lowres scenes carry none — "
        "pass `--hwf 400 400 555.555`)",
    )
    p.add_argument(
        "--views", type=int, nargs=3, default=(36, 4, 8),
        metavar=("TRAIN", "VAL", "TEST"),
        help="views per split",
    )
    p.add_argument(
        "--radius", type=float, default=4.0,
        help="camera orbit radius (blender lego trains at ~4.0)",
    )
    p.add_argument(
        "--phi-range", type=float, nargs=2, default=(-60.0, -10.0),
        metavar=("LO", "HI"),
        help="elevation range in degrees (uniform draws, fixed --seed)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--samples", type=int, nargs=2, default=None,
        metavar=("COARSE", "FINE"),
        help="override nerf.validation.num_coarse/num_fine for the renders",
    )
    p.add_argument(
        "--save-depth", nargs="?", const="test", default=None,
        choices=("test", "all"),
        help="write expected-depth sidecars (d_{k}.npy, float32 meters): "
        "bare flag = test views only (for depth metrics); 'all' = every "
        "split (train sidecars enable --depth-loss teacher-depth "
        "supervision during distillation)",
    )
    p.add_argument(
        "--save-depth-dex", type=float, default=None, metavar="M",
        help="additionally write the teacher's σ-threshold (Dex-NeRF) "
        "depth at fixed threshold M as d_dex_{k}.npy sidecars (same "
        "splits as --save-depth; requires --save-depth). The teacher's "
        "own expected depth is σ-surface-consistent (hotdog median "
        "2.6 mm — docs/TEACHER_DEPTH_AMBIGUITY.json); the ~2.2 m "
        "failure mode is the RGB-only STUDENT's expected depth drifting "
        "from the teacher's on textureless surfaces (shape-radiance "
        "ambiguity). The σ-threshold read is the reference's own "
        "trustworthy depth of a trained field "
        "(volume_rendering_utils.py:51-58), so σ-surface GT is the "
        "matching target for student σ-surface depth",
    )
    p.add_argument(
        "--platform", type=str, default=None, choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (cpu when the TPU tunnel is down)",
    )
    p.add_argument(
        "--format", type=str, default="blender",
        choices=("blender", "messytable"),
        help="on-disk layout: blender transforms JSONs, or the messytable "
        "convention (per-scene dirs with meta.pkl w2c/K, an IR-style "
        "grayscale PNG, and a uint16-mm depthL.png; stored at 2x so the "
        "loader's always-halving round-trips — reference "
        "load_messytable.py:148-165). --hwf is the LOADER-OUTPUT geometry.",
    )
    return p


def write_messytable(args, cfg, params, coarse_fn, fine_fn, s_val,
                     rays_impl, H, W, focal, near, far) -> int:
    """Messytable-convention dataset out of the checkpoint: per-scene dirs
    with ``meta.pkl`` (w2c extrinsic_l + OUTPUT-resolution intrinsic_l),
    an IR-style grayscale image and a uint16-mm ``depthL.png``, both
    stored at 2x so the loader's always-halving (reference
    ``load_messytable.py:148-165``) round-trips to the rendered geometry.
    The trainer unprojects with ``get_ray_bundle_w2c`` using the meta K
    directly — the proven-consistent convention of
    ``data/synthetic.py::write_messytable_dataset``."""
    import pickle

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dexnerf_tpu.core.rays import get_ray_bundle_w2c
    from dexnerf_tpu.data.blender import pose_spherical
    from dexnerf_tpu.render import render_image

    K = np.array(
        [[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float64,
    )
    # blender c2w looks along -z with +y up; the w2c+K pixel convention is
    # +z forward / +y down — flip those camera axes
    flip = np.diag([1.0, -1.0, -1.0, 1.0])

    @jax.jit
    def render_frame(w2c):
        ro, rd = get_ray_bundle_w2c(H, W, w2c, jnp.asarray(K))
        out = render_image(
            coarse_fn, fine_fn, params, ro, rd, near, far, s_val,
            rays_impl=rays_impl,
        )
        r = out.fine if out.fine is not None else out.coarse
        return {"rgb": r.rgb, "depth": r.depth, "acc": r.accumulation}

    rng = np.random.default_rng(args.seed)
    train_spacing = 360.0 / max(int(args.views[0]), 1)
    times = []
    for si, (split, n) in enumerate(zip(("train", "val", "test"),
                                        args.views)):
        for k in range(int(n)):
            theta = (
                -180.0
                + 360.0 * k / max(int(n), 1)
                + train_spacing * si / 3.0
            )
            phi = float(rng.uniform(*args.phi_range))
            c2w = pose_spherical(
                theta, phi, float(args.radius)
            ).astype(np.float64) @ flip
            w2c = np.linalg.inv(c2w)
            t0 = time.time()
            res = render_frame(jnp.asarray(w2c))
            times.append(time.time() - t0)
            gray = (np.clip(
                np.asarray(res["rgb"]).mean(-1), 0.0, 1.0
            ) * 255.0).astype(np.uint8)
            depth = np.asarray(res["depth"], np.float64)
            # 0 = no reading (the messytable invalid marker): rays whose
            # accumulation never hit matter have meaningless expected depth
            depth = np.where(np.asarray(res["acc"]) > 0.5, depth, 0.0)
            depth_mm = np.clip(depth * 1000.0, 0.0, 65535.0).astype(
                np.uint16
            )
            d = os.path.join(args.out, split, f"scene-{k:03d}")
            os.makedirs(d, exist_ok=True)
            imageio.imwrite(
                os.path.join(d, "0128_irL_kuafu_half.png"),
                np.repeat(np.repeat(gray, 2, axis=0), 2, axis=1),
            )
            Image.fromarray(
                np.repeat(np.repeat(depth_mm, 2, axis=0), 2, axis=1),
                mode="I;16",
            ).save(os.path.join(d, "depthL.png"))
            with open(os.path.join(d, "meta.pkl"), "wb") as f:
                pickle.dump({"extrinsic_l": w2c, "intrinsic_l": K}, f)
        print(f"{split}: {n} views written")
    with open(os.path.join(args.out, "source.json"), "w") as f:
        json.dump(
            {
                "format": "messytable",
                "checkpoint": os.path.abspath(args.checkpoint),
                "config": os.path.abspath(args.config),
                "hwf": [H, W, focal],
                "radius": float(args.radius),
                "phi_range": list(args.phi_range),
                "seed": int(args.seed),
            },
            f,
            indent=1,
        )
    print(
        f"messytable dataset at {args.out}: H/W/focal {H}/{W}/{focal:.3f}, "
        f"avg {np.mean(times):.3f}s/frame"
    )
    return 0


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.save_depth_dex is not None and args.save_depth is None:
        # the d_dex write is nested inside the --save-depth branch; without
        # this guard the flag is a silent no-op that still records
        # depth_dex_m in source.json (advisor round-4 finding)
        parser.error("--save-depth-dex requires --save-depth")

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.data.blender import pose_spherical
    from dexnerf_tpu.render import render_image
    from dexnerf_tpu.train.loop import (
        load_eval_params,
        maybe_fused_render_impl,
        setup_models,
    )

    cfg = load_config(args.config)
    cfg, params, ck_hwf, _ = load_eval_params(cfg, args.checkpoint)
    coarse_fn, fine_fn, _init_params = setup_models(
        cfg, int(cfg.experiment.randomseed)
    )
    H = W = focal = None
    if ck_hwf is not None:
        H, W, focal = ck_hwf
    if args.hwf is not None:
        H, W = int(args.hwf[0]), int(args.hwf[1])
        focal = float(args.hwf[2])
    if H is None:
        raise SystemExit(
            "checkpoint carries no frame geometry: pass --hwf H W FOCAL"
        )

    s_val = render_settings_from_cfg(cfg, "validation").eval_variant()
    import dataclasses

    if args.samples is not None:
        s_val = dataclasses.replace(
            s_val,
            num_coarse=int(args.samples[0]),
            num_fine=int(args.samples[1]),
        )
    if args.save_depth_dex is not None:
        # σ-threshold depth rides the fine pass (reference semantics)
        s_val = dataclasses.replace(
            s_val, m_thres_cand=(float(args.save_depth_dex),)
        )
    rays_impl = maybe_fused_render_impl(cfg, s_val)
    near, far = float(cfg.dataset.near), float(cfg.dataset.far)

    # one compiled program for every frame (eager render_image over the
    # remote tunnel costs ~60x — docs/PERF_NOTES.md)
    @jax.jit
    def render_frame(pose):
        ro, rd = get_ray_bundle_c2w(H, W, focal, pose)
        out = render_image(
            coarse_fn, fine_fn, params, ro, rd, near, far, s_val,
            rays_impl=rays_impl,
        )
        r = out.fine if out.fine is not None else out.coarse
        res = {"rgb": r.rgb, "depth": r.depth, "acc": r.accumulation}
        if args.save_depth_dex is not None:
            res["depth_dex"] = r.depth_dex[0]
        return res

    if args.format == "messytable":
        return write_messytable(args, cfg, params, coarse_fn, fine_fn,
                                s_val, rays_impl, H, W, focal, near, far)

    rng = np.random.default_rng(args.seed)
    camera_angle_x = 2.0 * float(np.arctan(0.5 * W / focal))
    splits = ("train", "val", "test")
    # held-out azimuths must sit BETWEEN training azimuths, so each split
    # offsets by a fraction of the TRAIN-view spacing (offsetting by the
    # split's own spacing lands val/test azimuths back on train ones
    # whenever the view counts divide)
    train_spacing = 360.0 / max(int(args.views[0]), 1)
    times = []
    for si, (split, n) in enumerate(zip(splits, args.views)):
        frames = []
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        for k in range(int(n)):
            theta = (
                -180.0
                + 360.0 * k / max(int(n), 1)
                + train_spacing * si / len(splits)
            )
            phi = float(rng.uniform(*args.phi_range))
            c2w = pose_spherical(theta, phi, float(args.radius))
            t0 = time.time()
            res = render_frame(jnp.asarray(c2w))
            rgb = np.asarray(res["rgb"])
            times.append(time.time() - t0)
            rel = f"./{split}/r_{k}"
            imageio.imwrite(
                os.path.join(args.out, f"{rel}.png"),
                (np.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8),
            )
            if args.save_depth == "all" or (
                args.save_depth and split == "test"
            ):
                # 0 = no reading: rays whose accumulation never hit matter
                # have meaningless expected depth — without this mask,
                # background pixels carry plausible-looking junk that
                # passes the d>0 validity check. NOTE the mask only fixes
                # MISS rays; on HIT rays over textureless surfaces an
                # RGB-only STUDENT's expected depth can drift meters from
                # the teacher's (hotdog's white plate: ~2.2 m student
                # error while the teacher's own expected depth stays
                # σ-surface-consistent to 2.6 mm median —
                # docs/TEACHER_DEPTH_AMBIGUITY.json); --save-depth-dex
                # adds the σ-surface GT that student σ-surface depth
                # should be scored against
                acc = np.asarray(res["acc"]) > 0.5
                depth = np.where(
                    acc,
                    np.asarray(res["depth"], np.float32),
                    np.float32(0.0),
                )
                np.save(
                    os.path.join(args.out, split, f"d_{k}.npy"), depth
                )
                if args.save_depth_dex is not None:
                    d_dex = np.where(
                        acc,
                        np.asarray(res["depth_dex"], np.float32),
                        np.float32(0.0),
                    )
                    np.save(
                        os.path.join(args.out, split, f"d_dex_{k}.npy"),
                        d_dex,
                    )
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
        with open(
            os.path.join(args.out, f"transforms_{split}.json"), "w"
        ) as f:
            json.dump(
                {"camera_angle_x": camera_angle_x, "frames": frames}, f
            )
        print(f"{split}: {n} views written")
    with open(os.path.join(args.out, "source.json"), "w") as f:
        json.dump(
            {
                "checkpoint": os.path.abspath(args.checkpoint),
                "config": os.path.abspath(args.config),
                "hwf": [H, W, focal],
                "radius": float(args.radius),
                "phi_range": list(args.phi_range),
                "seed": int(args.seed),
                "depth_dex_m": (
                    None if args.save_depth_dex is None
                    else float(args.save_depth_dex)
                ),
                # which splits carry d_{k}.npy (and d_dex when depth_dex_m
                # is set) — stage-resume drivers key dataset completeness
                # on this (advisor round-4: a pre-sidecar dataset must not
                # be silently reused by a --depth-loss protocol)
                "depth_splits": (
                    [] if args.save_depth is None
                    else list(splits) if args.save_depth == "all"
                    else ["test"]
                ),
            },
            f,
            indent=1,
        )
    print(
        f"dataset at {args.out}: H/W/focal {H}/{W}/{focal:.3f}, "
        f"avg {np.mean(times):.3f}s/frame"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
