"""Unified training CLI.

One command replaces the reference's four entry scripts (SURVEY.md §2.3):

    python -m dexnerf_tpu.apps.train --config configs/lego.yml
    python -m dexnerf_tpu.apps.train --config configs/messytable-obj.yml --dex
    python -m dexnerf_tpu.apps.train --config ... --ir            # luminance loss
    python -m dexnerf_tpu.apps.train --config ... --dex --ir

Flags mirror the reference CLI (``--config``, ``--load-checkpoint``,
``train_nerf_rgb.py:25-35``) plus the two mode switches.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True, help="YAML config path")
    p.add_argument(
        "--load-checkpoint",
        type=str,
        default="",
        help="checkpoint to resume from: an Orbax path, a directory of "
        "checkpoints (latest picked), or a reference PyTorch .ckpt "
        "(models + optimizer + iter, train_nerf_rgb.py:168-174)",
    )
    p.add_argument(
        "--auto-resume",
        action="store_true",
        help="resume from the latest checkpoint under <logdir>/checkpoints "
        "when one exists",
    )
    p.add_argument(
        "--sampling",
        type=str,
        default=None,
        choices=("uniform", "per_image"),
        help="ray sampling: uniform over all training rays, or the "
        "reference's one-image-per-iteration (train_nerf_rgb.py:222-241); "
        "overrides cfg.nerf.train.sampling",
    )
    p.add_argument(
        "--steps-per-call",
        type=int,
        default=None,
        help="optimizer steps per dispatch via lax.scan (amortizes host "
        "overhead on multi-host runs); overrides cfg.nerf.train.steps_per_call",
    )
    p.add_argument(
        "--dex",
        action="store_true",
        help="Dex-NeRF validation: sigma-threshold depth sweep",
    )
    p.add_argument(
        "--ir",
        action="store_true",
        help="IR supervision: Rec.601-luminance MSE instead of RGB MSE",
    )
    p.add_argument(
        "--sg-ir",
        action="store_true",
        help="active-IR supervision through the spherical-Gaussian shader "
        "(render/sg_ir.py): learnable co-located projector + environment "
        "lobes + PBR material, supervised on IR luminance — the capability "
        "behind the reference's dead SgRenderer (nerf/render.py:5)",
    )
    p.add_argument(
        "--pose-opt",
        action="store_true",
        help="SE(3) camera-pose refinement: per-train-image correction "
        "twists train alongside the fields (train/pose_opt.py — the "
        "capability behind the reference's dead lieutils.py); pose lr via "
        "cfg.optimizer.pose_lr (default 1e-3)",
    )
    p.add_argument(
        "--depth-loss",
        type=float,
        default=None,
        help="GT-depth supervision weight: adds weight * masked depth MSE "
        "on the rendered expected depth (datasets with depth maps — "
        "messytable; the reference carried the GT but only computed "
        "metrics from it); overrides cfg.nerf.train.depth_loss_weight. "
        "Works on the XLA path and inside the fused loss kernel; valid "
        "mask 0 < d < depth_valid_max (nerf.train, else the dataset's "
        "metric mask limit, default 1.25 m)",
    )
    p.add_argument(
        "--depth-warmup",
        type=int,
        default=None,
        metavar="N",
        help="with --depth-loss: run the first N iterations RGB-only "
        "before switching the depth term on (overrides "
        "cfg.nerf.train.depth_warmup). Depth supervision from iteration "
        "0 can lock the white-background fog collapse in (measured: "
        "drums/materials pinned ~9-12 dB train PSNR under --depth-loss "
        "0.1 without warmup)",
    )
    p.add_argument(
        "--occupancy",
        type=float,
        default=None,
        metavar="SIGMA",
        help="occupancy-guided training: bake a σ > SIGMA occupancy grid "
        "from the in-progress field (at cfg.nerf.train.occupancy_start_"
        "iter, re-baked every occupancy_rebake_every iters) and tighten "
        "every stored ray's [near, far] to its occupied span, so the "
        "sample budget concentrates where matter is (pair with smaller "
        "num_coarse/num_fine for speed); overrides "
        "cfg.nerf.train.occupancy. World-space scenes only (not NDC). "
        "Use a σ far below the scene's surface threshold (~0.2)",
    )
    p.add_argument(
        "--max-iters", type=int, default=None, help="override train_iters"
    )
    p.add_argument(
        "--num-devices",
        type=int,
        default=None,
        help="train data-parallel over this many devices (default: 1)",
    )
    p.add_argument(
        "--debug-nans",
        action="store_true",
        help="enable jax debug_nans (the analog of torch's "
        "detect_anomaly, which the reference left commented out)",
    )
    p.add_argument(
        "--disable-jit",
        action="store_true",
        help="run eagerly for step-through debugging",
    )
    p.add_argument(
        "--platform",
        type=str,
        default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (e.g. cpu when the TPU tunnel is "
        "unavailable); overrides the environment's pinned default",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.disable_jit:
        jax.config.update("jax_disable_jit", True)

    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train import run_training

    cfg = load_config(args.config)
    if args.sg_ir and args.ir:
        raise SystemExit("--sg-ir and --ir are mutually exclusive")
    supervision = (
        "sg_ir" if args.sg_ir else ("luminance" if args.ir else "rgb")
    )
    out = run_training(
        cfg,
        dex=args.dex,
        supervision=supervision,
        load_ckpt=args.load_checkpoint or None,
        auto_resume=args.auto_resume,
        max_iters=args.max_iters,
        num_devices=args.num_devices,
        sampling=args.sampling,
        steps_per_call=args.steps_per_call,
        pose_opt=args.pose_opt or None,
        depth_loss_weight=args.depth_loss,
        depth_warmup=args.depth_warmup,
        occupancy=args.occupancy,
    )
    print(
        f"done: {out['rays_per_sec']:.0f} rays/s, "
        f"final train metrics {out['final_train_metrics']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
