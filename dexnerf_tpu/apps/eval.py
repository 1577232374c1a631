"""Novel-view rendering from a checkpoint (reference ``eval_nerf.py``).

Loads a config + checkpoint, renders the dataset's generated camera path
(``render_poses``) to PNGs, optionally with disparity and jet-colormap
disparity images, and prints the average seconds per frame
(``eval_nerf.py:206``). Works for blender, llff (NDC) and messytable scenes —
the reference's eval is blender/llff-only and was broken against the 5-arg
ray API (SURVEY.md §2 consistency note); here all formats share one path.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from dexnerf_tpu.utils import (
    apply_jet_colormap,
    cast_to_disparity_image,
    cast_to_gray_image,
    cast_to_image,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--savedir", type=str, default="renders")
    p.add_argument("--save-disparity-image", action="store_true")
    p.add_argument(
        "--save-jet-disparity",
        action="store_true",
        help="also save jet-colormapped disparity (reference "
        "eval_nerf.py:196-205)",
    )
    p.add_argument(
        "--save-depth-confidence", type=float, default=None, metavar="DELTA",
        help="write per-pixel depth-confidence maps — the weight mass "
        "within ±DELTA of the expected depth (z-space units: meters for "
        "world scenes, NDC units for llff) — to <savedir>/confidence/; "
        "with --test-set the per-image mean joins metrics.json",
    )
    p.add_argument(
        "--num-poses", type=int, default=None, help="limit render path length"
    )
    p.add_argument(
        "--hwf", type=float, nargs=3, default=None,
        metavar=("H", "W", "FOCAL"),
        help="render height/width/focal override. With a reference .ckpt "
        "this also enables DATASET-FREE rendering (blender scenes): the "
        "shipped pretrained checkpoints carry no size metadata and their "
        "configs point at non-existent data paths — e.g. the *-lowres "
        "scenes are `--hwf 400 400 555.555`",
    )
    p.add_argument(
        "--platform",
        type=str,
        default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (e.g. cpu when the TPU tunnel is "
        "unavailable); overrides the environment's pinned default",
    )
    p.add_argument(
        "--sg-ir",
        action="store_true",
        help="also render the shaded active-IR view (render/sg_ir.py) "
        "into <savedir>/ir; requires a checkpoint trained with --sg-ir "
        "(params carry the 'sg' shading subtree)",
    )
    p.add_argument(
        "--refined-poses",
        action="store_true",
        help="render the TRAIN views at their pose-refined cameras "
        "instead of the generated path; requires a checkpoint trained "
        "with --pose-opt (params carry the 'pose' twists subtree)",
    )
    p.add_argument(
        "--save-gif",
        action="store_true",
        help="also assemble the rendered frames into <savedir>/render.gif "
        "(the artifact the reference's README shows but never generates)",
    )
    p.add_argument(
        "--gif-fps", type=float, default=10.0,
        help="frames per second for --save-gif",
    )
    p.add_argument(
        "--save-pointcloud",
        action="store_true",
        help="back-project each frame's depth into a colored world-space "
        "point cloud (<savedir>/pointcloud/NNNN.ply, ASCII PLY): what a "
        "grasp planner consumes — the reference computes depth maps but "
        "never exports geometry. Uses the expected depth, or the "
        "Dex-NeRF σ-threshold depth with --pointcloud-threshold",
    )
    p.add_argument(
        "--pointcloud-threshold",
        type=float,
        default=None,
        help="σ threshold for the point cloud's depth (Dex-NeRF "
        "first-crossing depth, the transparency-aware choice); renders "
        "with dex thresholds enabled and picks the nearest configured "
        "candidate",
    )
    p.add_argument(
        "--occupancy",
        type=float,
        default=None,
        metavar="SIGMA",
        help="empty-space skipping: bake a σ > SIGMA occupancy grid from "
        "the checkpoint once, then tighten each ray's [near, far] to its "
        "occupied span before sampling — the sample budget concentrates "
        "where matter is, so --samples can be cut 2-4x at BETTER "
        "quality. Pick SIGMA far below the surface threshold so "
        "semi-transparent fringe stays inside the interval: ~0.2 "
        "measured best on the shipped scenes (52.9 dB vs converged at "
        "64+64, vs 37.7 dB at σ=2). World-space scenes only (not "
        "NDC/llff)",
    )
    p.add_argument(
        "--occupancy-resolution", type=int, default=128,
        help="occupancy grid resolution per axis",
    )
    p.add_argument(
        "--occupancy-radius", type=float, default=1.5,
        help="half-extent of the occupancy cube around --occupancy-center",
    )
    p.add_argument(
        "--occupancy-center", type=float, nargs=3, default=(0.0, 0.0, 0.0),
        help="world-space center of the occupancy cube",
    )
    p.add_argument(
        "--occupancy-dilate", type=int, default=1,
        help="binary dilation rounds on the baked grid (safety margin)",
    )
    p.add_argument(
        "--occupancy-probes", type=int, default=128,
        help="fixed probe count per ray for interval tightening",
    )
    p.add_argument(
        "--occupancy-subsample", type=int, default=2,
        help="probe every Nth pixel per axis and propagate intervals "
        "conservatively (the grid gather dominates tightening cost); "
        "1 probes every ray",
    )
    p.add_argument(
        "--samples", type=int, nargs=2, default=None,
        metavar=("COARSE", "FINE"),
        help="override nerf.validation.num_coarse/num_fine for this "
        "render (the speed lever --occupancy makes safe)",
    )
    p.add_argument(
        "--test-set",
        action="store_true",
        help="render the dataset's held-out TEST views instead of the "
        "generated path and score them against ground truth: per-image "
        "and mean PSNR/SSIM (plus mm depth metrics when the dataset "
        "carries GT depth) written to <savedir>/metrics.json — the "
        "standard NeRF test-set protocol the reference's eval lacks "
        "(eval_nerf.py renders poses only)",
    )
    p.add_argument(
        "--dex-depth",
        action="store_true",
        help="with --test-set: also score σ-threshold (Dex-NeRF) depth — "
        "render the full nerf.validation.m_thres candidate sweep per view "
        "and select the min-abs-err threshold, the reference's validation "
        "protocol (train_dexnerf_rgb.py:393-427). Scored against "
        "d_dex_{k}.npy sidecars (the teacher's σ-surface, "
        "make_dataset_from_ckpt.py --save-depth-dex) when the dataset "
        "carries them, else against the expected-depth GT. Expected depth "
        "is unconstrained by RGB on textureless surfaces "
        "(docs/TEACHER_DEPTH_AMBIGUITY.json); this column is the "
        "surface-true comparison",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.test_set and args.refined_poses:
        raise SystemExit(
            "--test-set scores the held-out views; --refined-poses renders "
            "the train views — pick one"
        )
    if args.save_depth_confidence is not None and args.occupancy is not None:
        raise SystemExit(
            "--save-depth-confidence reconstructs full-interval z-values; "
            "--occupancy tightens per-ray intervals — pick one"
        )

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.render import render_image
    from dexnerf_tpu.train.loop import (
        load_eval_params,
        load_scene,
        setup_models,
    )

    cfg = load_config(args.config)
    cfg, ck_params, ck_hwf, imported = load_eval_params(cfg, args.checkpoint)

    needs_dataset = args.test_set or args.refined_poses
    try:
        scene = load_scene(cfg)
    except (FileNotFoundError, OSError):
        # Rendering a generated path needs no dataset when the checkpoint
        # carries hwf (reference .ckpts do, eval_nerf.py:147-152) and the
        # path is synthesizable (blender's 40-pose spherical orbit). The
        # reference's eval insists on the full training dataset even then.
        hwf = args.hwf if args.hwf is not None else ck_hwf
        can_synthesize = (
            imported is not None
            and not needs_dataset
            and str(cfg.dataset.type).lower() == "blender"
            and hwf is not None
        )
        if not can_synthesize:
            if imported is not None and not needs_dataset:
                if str(cfg.dataset.type).lower() != "blender":
                    raise SystemExit(
                        f"dataset at {cfg.dataset.basedir} not found; "
                        "dataset-free rendering synthesizes the blender "
                        f"spherical orbit only (this config is "
                        f"'{cfg.dataset.type}') — restore the dataset"
                    )
                raise SystemExit(
                    f"dataset at {cfg.dataset.basedir} not found, and "
                    "dataset-free rendering needs the frame geometry: pass "
                    "--hwf H W FOCAL (the shipped *-lowres scenes are "
                    "`--hwf 400 400 555.555`)"
                )
            raise
        from dexnerf_tpu.data.blender import spherical_render_poses
        from dexnerf_tpu.train.loop import SceneData

        print(
            f"dataset at {cfg.dataset.basedir} not found; rendering the "
            "spherical path at H/W/focal "
            f"{int(hwf[0])}/{int(hwf[1])}/{float(hwf[2]):.3f}"
        )
        scene = SceneData(
            images=np.zeros((0, 1, 1, 3), np.float32),
            poses=np.zeros((0, 4, 4), np.float32),
            hwf=[int(hwf[0]), int(hwf[1]), float(hwf[2])],
            i_train=np.zeros((0,), np.int64),
            i_val=np.zeros((0,), np.int64),
            render_poses=spherical_render_poses(),
            use_ndc=False,  # blender scenes never use NDC
        )
    coarse_fn, fine_fn, _ = setup_models(
        cfg, int(cfg.experiment.randomseed)
    )

    H, W, focal = scene.hwf
    params = ck_params
    if ck_hwf is not None:
        # hwf override from the checkpoint when present
        # (reference eval_nerf.py:147-152)
        H, W, focal = ck_hwf
    if args.hwf is not None:
        H, W, focal = int(args.hwf[0]), int(args.hwf[1]), float(args.hwf[2])

    want_dex_pc = args.pointcloud_threshold is not None
    if want_dex_pc and not args.save_pointcloud:
        raise SystemExit("--pointcloud-threshold needs --save-pointcloud")
    if args.dex_depth and not args.test_set:
        raise SystemExit("--dex-depth scores the test set: add --test-set")
    s_val = render_settings_from_cfg(
        cfg, "validation", dex=want_dex_pc or args.dex_depth
    ).eval_variant()
    if args.dex_depth and not tuple(s_val.m_thres_cand or ()):
        raise SystemExit(
            "--dex-depth: the config defines no dex threshold candidates "
            "(set nerf.validation.m_thres)"
        )
    pc_thres_idx = None
    if want_dex_pc:
        cands = tuple(s_val.m_thres_cand)
        if not cands:
            raise SystemExit(
                "--pointcloud-threshold: the config defines no dex "
                "threshold candidates (nerf.validation.m_thres)"
            )
        pc_thres_idx = int(
            np.argmin(np.abs(np.asarray(cands) - args.pointcloud_threshold))
        )
        print(
            f"pointcloud: σ-threshold depth at m={cands[pc_thres_idx]} "
            f"(nearest to requested {args.pointcloud_threshold})"
        )
    if args.samples is not None:
        import dataclasses

        s_val = dataclasses.replace(
            s_val,
            num_coarse=int(args.samples[0]),
            num_fine=int(args.samples[1]),
        )
        print(f"sample counts overridden: {s_val.num_coarse} coarse + "
              f"{s_val.num_fine} fine")
    # cfg.nerf.use_pallas: fully fused PE->MLP->compositing render kernel
    from dexnerf_tpu.train.loop import maybe_fused_render_impl

    rays_impl = maybe_fused_render_impl(cfg, s_val)

    occupancy = None
    if args.occupancy is not None:
        if scene.use_ndc:
            raise SystemExit(
                "--occupancy is world-space; NDC (llff) scenes "
                "reparameterize the frustum — unsupported"
            )
        from dexnerf_tpu.render import make_mlp_field
        from dexnerf_tpu.render.occupancy import build_occupancy_grid

        occ_fine = "fine" in params and fine_fn is not None
        occ_field = make_mlp_field(fine_fn if occ_fine else coarse_fn, s_val)
        t0 = time.time()
        occupancy = build_occupancy_grid(
            occ_field,
            params["fine"] if occ_fine else params["coarse"],
            sigma_threshold=float(args.occupancy),
            center=tuple(args.occupancy_center),
            radius=float(args.occupancy_radius),
            resolution=int(args.occupancy_resolution),
            dilate=int(args.occupancy_dilate),
        )
        frac = occupancy.occupancy_fraction()
        print(
            f"occupancy grid {args.occupancy_resolution}^3 (σ > "
            f"{args.occupancy}) baked in {time.time() - t0:.1f}s — "
            f"{100.0 * frac:.1f}% occupied"
        )
        if frac == 0.0:
            print(
                "WARNING: grid is empty — no tightening will happen; "
                "lower --occupancy or move --occupancy-center/radius"
            )
    intrinsics = None
    test_indices = None
    test_intrinsics = None
    if args.refined_poses:
        if "pose" not in params:
            raise SystemExit(
                "--refined-poses: checkpoint has no 'pose' twists subtree "
                "(train with apps.train --pose-opt first)"
            )
        from dexnerf_tpu.train.pose_opt import refined_c2w

        base = scene.poses[scene.i_train][:, :4, :4].astype(np.float32)
        if scene.intrinsics is not None:
            # messytable convention: dataset poses are w2c; the pose store
            # (and its twists) act on c2w = inv(w2c)
            base = np.linalg.inv(base)
            intrinsics = scene.intrinsics[scene.i_train]
        poses = np.asarray(
            refined_c2w(jnp.asarray(base), jnp.asarray(params["pose"]))
        )
    elif args.test_set:
        held_out = scene.i_test if scene.i_test is not None else scene.i_val
        test_indices = [int(t) for t in np.asarray(held_out).ravel()]
        poses = scene.poses[test_indices]
        if scene.intrinsics is not None:
            # messytable convention: dataset poses are w2c + full K
            test_intrinsics = scene.intrinsics[test_indices]
    else:
        poses = scene.render_poses
    if args.num_poses:
        poses = poses[: args.num_poses]
        if test_indices is not None:
            test_indices = test_indices[: args.num_poses]

    os.makedirs(args.savedir, exist_ok=True)
    if args.save_disparity_image:
        os.makedirs(os.path.join(args.savedir, "disparity"), exist_ok=True)
    if args.save_jet_disparity:
        os.makedirs(os.path.join(args.savedir, "disparity_jet"), exist_ok=True)
    if args.save_pointcloud:
        os.makedirs(os.path.join(args.savedir, "pointcloud"), exist_ok=True)
    if args.save_depth_confidence is not None:
        os.makedirs(os.path.join(args.savedir, "confidence"), exist_ok=True)
    if args.sg_ir:
        if "sg" not in params:
            raise SystemExit(
                "--sg-ir: checkpoint has no 'sg' shading subtree "
                "(train with apps.train --sg-ir first)"
            )
        os.makedirs(os.path.join(args.savedir, "ir"), exist_ok=True)
        from dexnerf_tpu.render.sg_ir import render_sg_ir_image
        from dexnerf_tpu.train.loop import models_from_cfg

        sg_coarse_m, sg_fine_m = models_from_cfg(cfg)

    # One jitted program per frame: ray generation + the full hierarchical
    # render + selection of ONLY the outputs this invocation consumes.
    # Calling render_image eagerly instead costs ~40x on the remote TPU
    # (every eager op is a tunnel round-trip, and every render output —
    # per-sample weights included — is materialized whether used or not).
    need_disparity = args.save_disparity_image or args.save_jet_disparity
    need_depth = args.save_pointcloud and pc_thres_idx is None
    need_test_depth = args.test_set and scene.depths is not None
    depths_dex_gt = None
    if args.dex_depth and need_test_depth:
        if str(cfg.dataset.type).lower() == "blender":
            from dexnerf_tpu.data.blender import load_blender_depths

            ds = cfg.dataset
            depths_dex_gt = load_blender_depths(
                ds.basedir,
                testskip=int(ds.get("testskip", 1) or 1),
                half_res=bool(ds.get("half_res", False)),
                debug=bool(ds.get("debug", False)),
                prefix="d_dex_",
            )
        elif str(cfg.dataset.type).lower() == "llff":
            from dexnerf_tpu.data.llff import load_llff_depths

            depths_dex_gt = load_llff_depths(
                cfg.dataset.basedir, len(scene.images), prefix="d_dex_"
            )
        print(
            "dex-depth GT: "
            + ("σ-surface sidecars (d_dex_*.npy)"
               if depths_dex_gt is not None
               else "expected-depth sidecars (no d_dex_*.npy found)")
        )
    if args.dex_depth and args.test_set and scene.depths is None:
        # silent-degradation guard (advisor round-4): without any depth
        # sidecars the sweep has nothing to score against, and a caller
        # recording "dex columns" would get an unlabeled no-op
        raise SystemExit(
            "--dex-depth: the dataset carries no depth sidecars "
            "(d_*.npy) — no ground truth to sweep against. Generate the "
            "dataset with --save-depth (and --save-depth-dex for "
            "σ-surface GT), or drop --dex-depth."
        )
    need_rays = args.save_pointcloud or args.sg_ir
    near_f, far_f = float(cfg.dataset.near), float(cfg.dataset.far)

    def _select_outputs(ro, rd):
        out = render_image(
            coarse_fn,
            fine_fn,
            params,
            ro,
            rd,
            near_f,
            far_f,
            s_val,
            use_ndc=scene.use_ndc,
            height=H,
            width=W,
            focal_length=focal,
            rays_impl=rays_impl,
            occupancy=occupancy,
            occupancy_probes=int(args.occupancy_probes),
            occupancy_subsample=int(args.occupancy_subsample),
        )
        r = out.fine if out.fine is not None else out.coarse
        res = {"rgb": r.rgb}
        if need_disparity:
            res["disparity"] = r.disparity
        if need_depth or need_test_depth:
            res["depth"] = r.depth
        if args.dex_depth and need_test_depth:
            if r.depth_dex is None:
                raise SystemExit(
                    "--dex-depth: σ-threshold depth rides the fine pass "
                    "(reference semantics) — set nerf.validation.num_fine "
                    "> 0"
                )
            res["depth_dex_all"] = r.depth_dex  # [T, H, W]
        if need_test_depth and scene.use_ndc:
            # NDC renders report depth as the NDC ray parameter; the
            # sidecars are metric ray distance in scene units — convert
            # the SCORED depths here (exact for the σ-threshold surface,
            # f(E[t]) for expected depth; both sides of the comparison
            # use the same map). Disparity/pointcloud outputs keep their
            # NDC semantics.
            from dexnerf_tpu.core.rays import ndc_t_to_world_depth

            if "depth" in res:
                res["depth"] = ndc_t_to_world_depth(
                    res["depth"], ro, rd, H, W, focal
                )
            if "depth_dex_all" in res:
                res["depth_dex_all"] = ndc_t_to_world_depth(
                    res["depth_dex_all"], ro, rd, H, W, focal
                )
        if args.save_pointcloud:
            res["accumulation"] = r.accumulation
            if pc_thres_idx is not None:
                if r.depth_dex is None:
                    raise SystemExit(
                        "--pointcloud-threshold: σ-threshold depth rides "
                        "the fine pass (reference semantics) — set "
                        "nerf.validation.num_fine > 0"
                    )
                res["depth_dex"] = r.depth_dex[pc_thres_idx]
        if need_rays:
            res["ro"], res["rd"] = ro, rd
        if args.save_depth_confidence is not None:
            from dexnerf_tpu.core import depth_confidence
            from dexnerf_tpu.core.sampling import (
                hierarchical_z_vals,
                stratified_z_vals,
            )

            # eval-time z-values are deterministic (perturb off, det
            # resample), so they are reconstructable from the coarse
            # weights — no kernel/API change needed for either path
            nearb = jnp.full(
                out.coarse.weights.shape[:-1], near_f,
                out.coarse.weights.dtype,
            )
            z_c = stratified_z_vals(
                nearb, jnp.full_like(nearb, far_f), s_val.num_coarse,
                lindisp=s_val.lindisp,
            )
            if out.fine is not None:
                z_w, _ = hierarchical_z_vals(
                    None, z_c, out.coarse.weights, s_val.num_fine, det=True
                )
                w = out.fine.weights
            else:
                z_w, w = z_c, out.coarse.weights
            delta = float(args.save_depth_confidence)
            res["depth_conf"] = depth_confidence(w, z_w, r.depth, delta)
            if args.save_pointcloud and pc_thres_idx is not None:
                # the point cloud back-projects the σ-threshold depth:
                # embed confidence around THAT surface, not expected depth
                res["depth_conf_pc"] = depth_confidence(
                    w, z_w, r.depth_dex[pc_thres_idx], delta
                )
        return res

    if intrinsics is not None:
        # refined messytable views: rays straight from the refined c2w
        # + full K (the fx-for-both-axes quirk included) — the exact
        # rays the twists were trained against (train/pose_opt.py),
        # with no w2c round-trip inversions
        from dexnerf_tpu.core.rays import _rotate, pixel_grid

        @jax.jit
        def render_frame(pose, K):
            ii, jj = pixel_grid(H, W)
            cam_dirs = jnp.stack(
                [
                    (ii - K[0, 2]) / K[0, 0],
                    (jj - K[1, 2]) / K[0, 0],
                    jnp.ones_like(ii),
                ],
                axis=-1,
            )
            rd = _rotate(cam_dirs, pose[:3, :3])
            ro = jnp.broadcast_to(pose[:3, 3], rd.shape)
            return _select_outputs(ro, rd)

    elif test_intrinsics is not None:
        from dexnerf_tpu.core.rays import get_ray_bundle_w2c

        @jax.jit
        def render_frame(pose, K):
            ro, rd = get_ray_bundle_w2c(H, W, pose, K)
            return _select_outputs(ro, rd)

    else:

        @jax.jit
        def render_frame(pose, K=None):
            ro, rd = get_ray_bundle_c2w(H, W, focal, pose)
            return _select_outputs(ro, rd)

    times = []
    per_image = []
    gif_frames = []
    for i, pose in enumerate(poses):
        t0 = time.time()
        pose_j = jnp.asarray(np.asarray(pose[:4, :4], np.float32))
        if intrinsics is not None:
            res = render_frame(pose_j, jnp.asarray(intrinsics[i]))
        elif test_intrinsics is not None:
            res = render_frame(pose_j, jnp.asarray(test_intrinsics[i]))
        else:
            res = render_frame(pose_j)
        rgb = np.asarray(res["rgb"])
        times.append(time.time() - t0)
        imageio.imwrite(
            os.path.join(args.savedir, f"{i:04d}.png"), cast_to_image(rgb)
        )
        if args.save_gif:
            gif_frames.append(cast_to_image(rgb))
        if args.save_disparity_image or args.save_jet_disparity:
            disp = np.asarray(res["disparity"])
            if args.save_disparity_image:
                imageio.imwrite(
                    os.path.join(args.savedir, "disparity", f"{i:04d}.png"),
                    cast_to_disparity_image(disp),
                )
            if args.save_jet_disparity:
                imageio.imwrite(
                    os.path.join(args.savedir, "disparity_jet", f"{i:04d}.png"),
                    apply_jet_colormap(np.clip(disp, 0.0, 2.0) / 2.0),
                )
        if args.save_depth_confidence is not None:
            conf = np.asarray(res["depth_conf"])
            imageio.imwrite(
                os.path.join(args.savedir, "confidence", f"{i:04d}.png"),
                (np.clip(conf, 0.0, 1.0) * 255.0).astype(np.uint8),
            )
        if args.save_pointcloud:
            from dexnerf_tpu.utils import depth_to_points, write_ply

            if pc_thres_idx is not None:
                d = np.asarray(res["depth_dex"])
            else:
                d = np.asarray(res["depth"])
            # keep pixels whose ray actually hit something (the σ-threshold
            # depth lands at the first sample when no crossing exists)
            acc = np.asarray(res["accumulation"])
            pts, cols, keep = depth_to_points(
                np.asarray(res["ro"]), np.asarray(res["rd"]), d,
                rgb=rgb, mask=acc > 0.5, return_keep=True,
            )
            conf_pts = None
            if args.save_depth_confidence is not None:
                conf_key = (
                    "depth_conf_pc" if pc_thres_idx is not None
                    else "depth_conf"
                )
                conf_pts = np.asarray(res[conf_key]).reshape(-1)[keep]
            write_ply(
                os.path.join(args.savedir, "pointcloud", f"{i:04d}.ply"),
                pts, cols, confidence=conf_pts,
            )
        if args.sg_ir:
            ir = render_sg_ir_image(
                sg_coarse_m,
                sg_fine_m,
                params,
                res["ro"],
                res["rd"],
                float(cfg.dataset.near),
                float(cfg.dataset.far),
                s_val,
                # render with the same falloff the model was TRAINED with
                # (train/loop.py passes the same knob to make_sg_ir_loss)
                distance_falloff=bool(
                    cfg.nerf.train.get("sg_distance_falloff", True)
                ),
                use_ndc=scene.use_ndc,
                height=H,
                width=W,
                focal_length=focal,
            )
            imageio.imwrite(
                os.path.join(args.savedir, "ir", f"{i:04d}.png"),
                cast_to_gray_image(np.asarray(ir)),
            )
        if test_indices is not None:
            # score against ground truth (standard NeRF test-set protocol)
            from dexnerf_tpu.core.metrics import (
                compute_err_metric,
                mse2psnr,
                ssim,
            )

            idx = test_indices[i]
            gt = np.asarray(scene.images[idx][..., :3], np.float32)
            row = {
                "index": idx,
                "psnr": mse2psnr(float(np.mean((rgb - gt) ** 2))),
                "ssim": float(ssim(rgb, gt)),
            }
            if args.save_depth_confidence is not None:
                row["depth_conf"] = float(
                    np.mean(np.asarray(res["depth_conf"]))
                )
            if scene.depths is not None:
                from dexnerf_tpu.core.metrics import depth_error_img

                d_gt = np.asarray(scene.depths[idx], np.float32)
                valid_max = float(
                    cfg.dataset.get("depth_valid_max", 1.25) or 1.25
                )
                mask = (d_gt > 0) & (d_gt < valid_max)
                if mask.any():
                    d_pred = np.asarray(res["depth"])
                    row.update(compute_err_metric(d_gt, d_pred, mask))
                    # 11-band error colormap (reference train_utils.py:46-70)
                    err_dir = os.path.join(args.savedir, "depth_err")
                    os.makedirs(err_dir, exist_ok=True)
                    err_img = depth_error_img(
                        d_pred[None], d_gt[None], mask[None]
                    )
                    imageio.imwrite(
                        os.path.join(err_dir, f"{i:04d}.png"),
                        (np.clip(err_img, 0.0, 1.0) * 255.0).astype(np.uint8),
                    )
                if "depth_dex_all" in res:
                    # the reference's validation protocol: sweep the
                    # threshold candidates, select min-abs-err per view
                    # (train_dexnerf_rgb.py:393-427); scored against the
                    # σ-surface sidecars when present (surface-vs-surface)
                    gt_dex, m_dex = d_gt, mask
                    if depths_dex_gt is not None:
                        gt_dex = np.asarray(
                            depths_dex_gt[idx], np.float32
                        )
                        m_dex = (gt_dex > 0) & (gt_dex < valid_max)
                    if m_dex.any():
                        d_dex_all = np.asarray(res["depth_dex_all"])
                        cands = tuple(s_val.m_thres_cand)
                        d_errs = [
                            compute_err_metric(gt_dex, d_dex_all[t], m_dex)
                            for t in range(len(cands))
                        ]
                        best = int(np.argmin(
                            [e["depth_abs_err"] for e in d_errs]
                        ))
                        row.update({
                            "dex_" + k.removeprefix("depth_"): v
                            for k, v in d_errs[best].items()
                        })
                        row["dex_best_m"] = float(cands[best])
            per_image.append(row)
        print(f"frame {i}: {times[-1]:.3f}s")

    print(f"Avg time per image: {np.mean(times):.3f}s")
    if args.save_gif and gif_frames:
        gif_path = os.path.join(args.savedir, "render.gif")
        imageio.mimwrite(
            gif_path, gif_frames, duration=1000.0 / max(args.gif_fps, 0.1),
            loop=0,
        )
        print(f"wrote {gif_path} ({len(gif_frames)} frames)")
    if test_indices is not None:
        import json

        keys = sorted({k for r in per_image for k in r} - {"index"})
        mean = {k: float(np.mean([r[k] for r in per_image if k in r]))
                for k in keys}
        report = {
            "per_image": per_image,
            "mean": mean,
            "avg_s_per_image": float(np.mean(times)),
        }
        if args.dex_depth and need_test_depth:
            # record which ground truth the dex_* columns were scored
            # against so downstream tables can't mislabel the column
            # (advisor round-4 finding)
            report["dex_gt"] = (
                "sigma_sidecar" if depths_dex_gt is not None
                else "expected"
            )
        with open(os.path.join(args.savedir, "metrics.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(
            "test set: "
            + " ".join(f"{k}={v:.4g}" for k, v in sorted(mean.items()))
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
