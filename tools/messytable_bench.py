"""The messytable convention at reference scale, driven on chip.

The reference's canonical working path is messytable IR training at
1024–2048 rays x 64–192 samples per ray (reference
``config/messytable-obj.yml:131-140``, ``load_messytable.py:17``). This
driver exercises that path end to end on the TPU at full convention
fidelity — w2c extrinsics + full-K intrinsics rays, IR luminance
supervision, the Dex σ-threshold validation sweep, GT-depth supervision
from the mm depth PNGs — on a messytable-format dataset rendered out of a
shipped reference checkpoint (no reference dataset ships with the repo):

  1. ``make_dataset_from_ckpt --format messytable`` renders posed IR-style
     views + uint16-mm depthL.png out of the lego checkpoint at the
     half-res messytable geometry (270x480);
  2. train ``--dex --ir --depth-loss`` at 2048 rays x 64+128 samples (the
     S=192 fused-kernel path) for --iters;
  3. record the final validation's PSNR + mm depth metrics (sweep-selected
     best threshold, abs err, err2/4/8) in ``docs/MESSYTABLE_CHIP.json``.

    python tools/messytable_bench.py                    # TPU, ~20 min
    python tools/messytable_bench.py --platform cpu \
        --size 32 --views 3 1 1 --iters 20 --rays 256 --samples 8 16  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAINED = "/root/reference/nerf-pytorch/pretrained"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--scenes", nargs="+", default=["lego"],
        help="source checkpoints to generate messytable scenes from; two+ "
        "scenes exercise the loader's multi-scene-directory convention "
        "(reference load_messytable.py:17-47) at chip scale",
    )
    p.add_argument(
        "--seeds", type=str, default="0",
        help="comma list; each (scene, seed, iters) runs separately and "
        "the report records mean ± spread per scene",
    )
    p.add_argument("--iters", type=int, default=15000)
    p.add_argument("--rays", type=int, default=2048,
                   help="num_random_rays (reference edward config: 2048)")
    p.add_argument("--samples", type=int, nargs=2, default=(64, 128),
                   metavar=("COARSE", "FINE"),
                   help="64+128 = the S=192 fine-pass kernel path")
    p.add_argument("--size", type=int, default=270,
                   help="output image height (480*size/270 wide: the "
                   "half-res messytable aspect)")
    p.add_argument("--views", type=int, nargs=3, default=(36, 2, 4))
    p.add_argument("--depth-weight", type=float, default=0.1)
    p.add_argument("--m-thres", type=int, default=100,
                   help="sweep candidates arange(5, m+5, 5) — the "
                   "reference validation grid")
    p.add_argument("--data-root", default=os.path.join(REPO, "data"))
    p.add_argument("--logdir", default=os.path.join(REPO, "logs"))
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "MESSYTABLE_CHIP.json"))
    p.add_argument("--force", action="store_true")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    return p


def run_one(args, scene: str, seed: int):
    """Generate (once) + train + validate one (scene, seed) point;
    returns the per-run report row."""
    import glob

    import jax

    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.train import run_training

    H = int(args.size)
    W = int(round(H * 480.0 / 270.0))
    # blender-synthetic camera_angle_x ~0.6911 -> focal 555.555 at 400 px
    focal = 555.555 * W / 400.0

    cands = sorted(glob.glob(os.path.join(
        PRETRAINED, f"{scene}-lowres", "checkpoint*.ckpt")))
    if not cands:
        raise SystemExit(f"no shipped checkpoint for {scene}")
    ckpt = cands[-1]
    ref_cfg = os.path.join(PRETRAINED, f"{scene}-lowres", "config.yml")

    basedir = os.path.join(args.data_root, f"{scene}_messytable")
    t_all = time.time()
    if args.force or not os.path.exists(
        os.path.join(basedir, "train", "scene-000", "meta.pkl")
    ):
        from tools.make_dataset_from_ckpt import main as gen_main

        # the dataset is seed-independent (view geometry fixed at seed 0)
        # so every (seed, iters) point trains on identical data
        gen_args = [
            "--config", ref_cfg, "--checkpoint", ckpt,
            "--hwf", str(H), str(W), str(focal),
            "--out", basedir, "--format", "messytable",
            "--views", *[str(v) for v in args.views],
            "--seed", "0",
        ]
        if args.platform:
            gen_args += ["--platform", args.platform]
        rc = gen_main(gen_args)
        if rc:
            raise SystemExit(f"dataset generation failed ({rc})")

    nc, nf = int(args.samples[0]), int(args.samples[1])
    mode = {
        "num_random_rays": int(args.rays),
        "chunksize": 65536,
        "perturb": True,
        "num_coarse": nc,
        "num_fine": nf,
        "white_background": True,
        # the reference's own recipe (messytable-obj.yml:145): σ-noise
        # 0.2 during training, 0 at validation — without it this
        # white-background training collapses to fog (measured: train
        # PSNR pinned ~7.6 dB)
        "radiance_field_noise_std": 0.2,
        "lindisp": False,
        "m_thres": int(args.m_thres),
    }
    val_mode = dict(mode, perturb=False, radiance_field_noise_std=0.0)
    cfg = CfgNode({
        "experiment": {
            "id": f"{scene}-messytable-chip-s{seed}-i{args.iters}",
            "logdir": args.logdir,
            "randomseed": int(seed),
            "train_iters": int(args.iters),
            "validate_every": int(args.iters),
            "save_every": 0,
            "print_every": max(1, args.iters // 10),
        },
        "dataset": {
            "type": "messytable",
            "basedir": basedir,
            "half_res": False,
            "testskip": 1,
            "no_ndc": True,
            "near": 2.0,
            "far": 6.0,
            "depth_valid_max": 6.0,
        },
        "models": {
            name: {
                "type": "FlexibleNeRFModel",
                "num_layers": 8,
                "hidden_size": 128,
                "skip_connect_every": 3,
                "num_encoding_fn_xyz": 10,
                "num_encoding_fn_dir": 4,
            }
            for name in ("coarse", "fine")
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "use_pallas": jax.default_backend() != "cpu",
            "train": mode,
            "validation": val_mode,
        },
    })
    out = run_training(
        cfg, dex=True, supervision="luminance",
        depth_loss_weight=float(args.depth_weight),
        use_tensorboard=False,
    )
    val = out["final_validation"]
    best = val["dex_errors"][val["best_threshold_index"]]
    return {
        "scene": scene,
        "seed": int(seed),
        "iters": int(args.iters),
        "backend": jax.default_backend(),
        "source_checkpoint": os.path.basename(ckpt),
        "wall_s": round(time.time() - t_all, 1),
        "val_psnr_db": round(float(val["psnr"]), 2),
        "best_threshold": val["best_threshold"],
        "dex_min_abs_err_mm": round(float(val["min_abs_err"]), 2),
        "dex_best": {
            "depth_rmse_mm": round(float(best["depth_rmse"]), 2),
            "err2": round(float(best["depth_err2"]), 4),
            "err4": round(float(best["depth_err4"]), 4),
            "err8": round(float(best["depth_err8"]), 4),
        },
        # the control column: expected depth at the SAME validation —
        # the dex-vs-expected comparison is the point of Dex-NeRF on
        # this convention
        "expected_depth_abs_err_mm": (
            round(float(val["depth_abs_err"]), 2)
            if val.get("depth_abs_err") is not None else None
        ),
        "expected_depth_err8": (
            round(float(val["depth_err8"]), 4)
            if val.get("depth_err8") is not None else None
        ),
    }


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    seeds = [int(s) for s in str(args.seeds).split(",") if s != ""]
    nc, nf = int(args.samples[0]), int(args.samples[1])
    H = int(args.size)
    W = int(round(H * 480.0 / 270.0))

    # merge with a previous run: (scene, seed, iters) keys resume
    runs = {}
    if os.path.exists(args.out) and not args.force:
        try:
            with open(args.out) as f:
                prior = json.load(f)
            for r in prior.get("runs", []):
                runs[(r["scene"], int(r["seed"]), int(r["iters"]))] = r
        except (json.JSONDecodeError, OSError, KeyError):
            pass

    def write_report():
        rows = [runs[k] for k in sorted(runs)]
        by_scene = {}
        for r in rows:
            by_scene.setdefault((r["scene"], r["iters"]), []).append(r)
        summary = {}
        for (scene, iters), rs in sorted(by_scene.items()):
            dex = [r["dex_min_abs_err_mm"] for r in rs]
            exp = [r["expected_depth_abs_err_mm"] for r in rs
                   if r["expected_depth_abs_err_mm"] is not None]
            psnr = [r["val_psnr_db"] for r in rs]
            summary[f"{scene}@{iters}"] = {
                "seeds": sorted(r["seed"] for r in rs),
                "val_psnr_db_mean": round(float(np.mean(psnr)), 2),
                "val_psnr_db_spread": round(
                    float(np.max(psnr) - np.min(psnr)), 2),
                "dex_min_abs_err_mm_mean": round(float(np.mean(dex)), 2),
                "dex_min_abs_err_mm_spread": round(
                    float(np.max(dex) - np.min(dex)), 2),
                "expected_depth_abs_err_mm_mean": (
                    round(float(np.mean(exp)), 2) if exp else None
                ),
            }
        report = {
            "protocol": (
                f"messytable-convention (w2c + full-K) IR training on "
                f"chip at the reference operating point: {args.rays} rays "
                f"x {nc}+{nf} samples (S={nc + nf} fine pass), --dex "
                f"--ir --depth-loss {args.depth_weight}; datasets "
                f"rendered from shipped checkpoints at {H}x{W} (half-res "
                f"messytable geometry), GT mm depth from depthL.png; "
                f"sweep arange(5, {args.m_thres}+5, 5) with min-abs-err "
                f"selection (reference train_dexnerf_rgb.py:393-427); "
                f"expected-depth control column from the same validation"
            ),
            "summary": summary,
            "runs": rows,
        }
        d = os.path.dirname(args.out)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, args.out)
        return report

    for scene in args.scenes:
        for seed in seeds:
            key = (scene, seed, int(args.iters))
            if key in runs:
                print(f"skip {key} (recorded; --force to re-run)",
                      flush=True)
                continue
            print(f"== {scene} seed {seed} iters {args.iters} ==",
                  flush=True)
            runs[key] = run_one(args, scene, seed)
            report = write_report()
            print(json.dumps(runs[key], indent=1), flush=True)

    report = write_report()
    print(json.dumps(report["summary"], indent=1))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
