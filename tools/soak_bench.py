"""Reference-length training soak: one scene to >=100k iterations on chip.

Every reference artifact is a 100k-250k-iteration run (reference
``pretrained/*/checkpoint{100000..249999}.ckpt``; ``config/lego.yml`` /
``messytable-obj.yml:10`` run 100k-1M), but the repo's recorded trainings
capped at 12.5k-30k. This driver closes the late-schedule evidence gap:
the LR-decay tail (lr*0.1^(step/250k), the reference's own horizon), the
sigma-noise interaction, and drift/divergence past 50k are exercised at
the reference's own length, with the trajectory recorded.

  1. dataset: the lego distill views (reused from tools/distill_bench.py
     when present, generated otherwise);
  2. train the RGB-only distill recipe (fused loss kernel, batch 16384)
     for --iters with periodic validation, steps_per_call 25 (the
     production dispatch shape bench.py times);
  3. score the held-out test views (apps.eval --test-set --dex-depth);
  4. write docs/SOAK_100K.json: validation-PSNR trajectory, analytic LR
     curve, stability verdicts (finite losses, no late collapse), final
     test-set metrics.

    python tools/soak_bench.py                      # TPU, ~1.5-2 h
    python tools/soak_bench.py --iters 200 --validate-every 50 \
        --platform cpu --smoke                      # CPU smoke
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAINED = "/root/reference/nerf-pytorch/pretrained"


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="lego")
    p.add_argument("--iters", type=int, default=100000)
    p.add_argument("--validate-every", type=int, default=2500)
    p.add_argument("--save-every", type=int, default=5000,
                   help="checkpoint cadence; keep it tight — the tunnel "
                        "wedges mid-run and the watchdog's retry resumes "
                        "from the latest checkpoint (--auto-resume)")
    p.add_argument("--steps-per-call", type=int, default=25)
    p.add_argument("--data-root", default=os.path.join(REPO, "data"))
    p.add_argument("--logdir", default=os.path.join(REPO, "logs"))
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "SOAK_100K.json"))
    p.add_argument("--smoke", action="store_true",
                   help="tiny model/views for an off-chip pipeline check")
    p.add_argument("--partial-report", action="store_true",
                   help="assemble the artifact from whatever the (possibly "
                        "still-running or interrupted) run has recorded so "
                        "far: skip dataset/train/eval stages, tolerate a "
                        "missing test-set score, mark the report partial")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    return p


def run(cmd, log_path):
    print(f"  $ {' '.join(cmd)}\n    -> {log_path}", flush=True)
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, cwd=REPO, stdout=log,
                              stderr=subprocess.STDOUT)
    if proc.returncode != 0:
        tail = open(log_path).read()[-2000:]
        raise SystemExit(f"stage failed ({proc.returncode}):\n{tail}")
    dt = time.time() - t0
    print(f"    done in {dt:.0f}s", flush=True)
    return dt


def main(argv=None) -> int:
    import yaml

    args = build_parser().parse_args(argv)
    platform = ["--platform", args.platform] if args.platform else []
    scene = args.scene
    basedir = os.path.join(args.data_root, f"{scene}_distill")
    ckpts = sorted(glob.glob(os.path.join(
        PRETRAINED, f"{scene}-lowres", "checkpoint*.ckpt")))
    if not ckpts:
        raise SystemExit(f"no shipped checkpoint for {scene}")
    ref_cfg = os.path.join(PRETRAINED, f"{scene}-lowres", "config.yml")

    if not args.partial_report and not os.path.exists(
            os.path.join(basedir, "source.json")):
        hw = "64" if args.smoke else "400"
        views = ("6", "2", "2") if args.smoke else ("36", "4", "8")
        run([sys.executable, "tools/make_dataset_from_ckpt.py",
             "--config", ref_cfg, "--checkpoint", ckpts[-1],
             "--hwf", hw, hw, str(555.555 * int(hw) / 400.0),
             "--out", basedir, "--views", *views,
             "--save-depth", "all", "--save-depth-dex", "25", *platform],
            f"/tmp/soak_{scene}_data.log")

    with open(os.path.join(REPO, "configs", "lego-distill-tpu.yml")) as f:
        cfg = yaml.safe_load(f)
    run_id = f"{scene}-soak-{args.iters // 1000}k"
    cfg["experiment"].update({
        "id": run_id,
        "logdir": args.logdir,
        "train_iters": int(args.iters),
        "validate_every": int(args.validate_every),
        "save_every": int(args.save_every),
        "print_every": 1000,
    })
    cfg["dataset"]["basedir"] = basedir
    cfg["nerf"]["validation"]["m_thres"] = 80
    # production dispatch shape: N steps per lax.scan dispatch (bench.py's
    # timed configuration) — the per-dispatch tunnel overhead that costs
    # the 1-step distill runs ~2x goes away
    cfg["nerf"]["train"]["steps_per_call"] = int(args.steps_per_call)
    if args.smoke:
        for m in cfg["models"].values():
            m.update({"num_layers": 2, "hidden_size": 16,
                      "num_encoding_fn_xyz": 2, "num_encoding_fn_dir": 1})
        for mode in ("train", "validation"):
            cfg["nerf"][mode].update({"num_coarse": 8, "num_fine": 8})
        cfg["nerf"]["train"]["num_random_rays"] = 256
        cfg["nerf"]["use_pallas"] = False
    cfg_path = os.path.join(basedir, f"soak_{args.iters}.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)

    logdir = os.path.join(args.logdir, run_id)
    ckpt_dir = os.path.join(logdir, "checkpoints")
    final = os.path.join(ckpt_dir, f"checkpoint_{args.iters - 1:07d}")
    t_train = None
    if not args.partial_report and not os.path.exists(final):
        t_train = run(
            [sys.executable, "-m", "dexnerf_tpu.apps.train",
             "--config", cfg_path, "--auto-resume", *platform],
            f"/tmp/soak_{scene}_train.log")

    savedir = os.path.join(logdir, "test")
    if not args.partial_report and not os.path.exists(
            os.path.join(savedir, "metrics.json")):
        run([sys.executable, "-m", "dexnerf_tpu.apps.eval",
             "--config", cfg_path, "--checkpoint", ckpt_dir,
             "--savedir", savedir, "--test-set", "--dex-depth",
             *platform],
            f"/tmp/soak_{scene}_eval.log")

    # ---- assemble the artifact from the run's own records -------------
    import numpy as np

    val_psnr, train_loss, train_psnr = [], [], []
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r["tag"] == "validation/psnr":
                val_psnr.append((int(r["step"]), float(r["value"])))
            elif r["tag"] == "train/loss":
                train_loss.append((int(r["step"]), float(r["value"])))
            elif r["tag"] == "train/psnr":
                train_psnr.append((int(r["step"]), float(r["value"])))
    # a watchdog-retried run re-logs steps it re-trains (wedge -> kill ->
    # --auto-resume from the last checkpoint); keep the LAST record per step
    def _dedupe(series):
        return sorted({s: v for s, v in series}.items())

    val_psnr = _dedupe(val_psnr)
    train_loss = _dedupe(train_loss)
    train_psnr = _dedupe(train_psnr)

    test_metrics_path = os.path.join(savedir, "metrics.json")
    if os.path.exists(test_metrics_path):
        with open(test_metrics_path) as f:
            test = json.load(f)["mean"]
    elif args.partial_report:
        test = {}
    else:
        raise SystemExit(f"missing {test_metrics_path}")

    done_iters = max(
        [s for s, _ in train_loss] + [s for s, _ in val_psnr] + [0])
    partial = args.partial_report and done_iters < args.iters - 1

    lr0 = float(cfg["optimizer"]["lr"])
    decay = float(cfg["scheduler"]["lr_decay"]) * 1000.0
    factor = float(cfg["scheduler"]["lr_decay_factor"])
    lr_curve = [
        (s, lr0 * factor ** (s / decay))
        for s, _ in val_psnr
    ]

    peak = max(v for _, v in val_psnr) if val_psnr else None
    horizon = done_iters if partial else args.iters
    finals = [v for s, v in val_psnr if s >= 0.9 * horizon]
    final_band = float(np.mean(finals)) if finals else None
    tail = [v for _, v in train_loss[-50:]]
    report = {
        "protocol": (
            f"{scene} distill recipe (RGB-only, fused loss kernel, batch "
            f"{cfg['nerf']['train']['num_random_rays']}, steps_per_call "
            f"{args.steps_per_call}) trained to {args.iters} iterations "
            f"on chip with validation every {args.validate_every}; the "
            f"reference's own schedule (lr {lr0} * {factor}^(step/"
            f"{int(decay)})) and sigma-noise 0.2 recipe; scored on the "
            f"held-out test split"
        ),
        "iters": int(args.iters),
        "iters_completed": int(done_iters),
        "partial": bool(partial),
        "train_wall_s": round(t_train, 1) if t_train else None,
        "validation_psnr_curve": [
            [s, round(v, 2)] for s, v in val_psnr
        ],
        "lr_curve": [[s, round(v, 6)] for s, v in lr_curve],
        "peak_val_psnr_db": round(peak, 2) if peak is not None else None,
        "final_decade_val_psnr_db": (
            round(final_band, 2) if final_band is not None else None
        ),
        "stability": {
            "all_train_losses_finite": bool(
                np.isfinite([v for _, v in train_loss]).all()
            ),
            "no_late_collapse": bool(
                final_band is not None and peak is not None
                and final_band > peak - 2.0
            ),
            "tail_train_loss_mean": (
                round(float(np.mean(tail)), 6) if tail else None
            ),
        },
        "test_set": {
            "psnr_db": test.get("psnr"),
            "ssim": test.get("ssim"),
            "depth_abs_err_mm": test.get("depth_abs_err"),
            "dex_abs_err_mm": test.get("dex_abs_err"),
            "dex_best_m": test.get("dex_best_m"),
        },
    }
    d = os.path.dirname(args.out)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, args.out)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("validation_psnr_curve", "lr_curve")},
                     indent=1))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
