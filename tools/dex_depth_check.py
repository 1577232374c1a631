"""Transparent-object depth accuracy: the Dex-NeRF metric of record.

BASELINE.md names "transparent-object depth RMSE" among the metrics of
record (the reference publishes no value — it logs depth abs err /
err2/4/8 per validation, ``train_utils.py:9-30``). This tool produces a
standalone number: train on the analytic soft-sphere scene (which ships
exact ground-truth depth) in Dex mode, sweep the σ-threshold candidates at
validation exactly like ``train_dexnerf_rgb.py:393-428``, and report the
best threshold's depth metrics in millimeters plus the depth RMSE.

    python tools/dex_depth_check.py --iters 2000      # TPU, ~2 min warm

Expected (height 48, 3k iters, use_pallas): best-threshold mean abs err
of a few mm on a ~meter-scale scene; the σ-threshold depth beating the
alpha-composited expected depth on the transparent spheres is asserted by
tests/test_core.py::test_transparent_object_dex_vs_expected_depth.
"""

import argparse
import json
import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--m-thres", type=int, default=40)
    p.add_argument("--no-pallas", action="store_true")
    args = p.parse_args()

    import numpy as np

    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import write_messytable_dataset
    from dexnerf_tpu.train import run_training

    tmp = tempfile.mkdtemp(prefix="dexdepth_")
    data = os.path.join(tmp, "mt")
    # 2x the target size: the messytable loader halves resolution
    write_messytable_dataset(
        data, height=2 * args.size, width=2 * args.size,
        views_per_split=(10, 1, 1),
    )
    cfg = CfgNode(
        {
            "experiment": {
                "id": "dex-depth-check",
                "logdir": os.path.join(tmp, "logs"),
                "randomseed": 7,
                "train_iters": args.iters,
                "validate_every": args.iters,
                "save_every": 0,
                "print_every": max(1, args.iters // 4),
            },
            "dataset": {
                "type": "messytable",
                "basedir": data,
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
                "use_pallas": not args.no_pallas,
                "train": {
                    "num_random_rays": args.batch,
                    "chunksize": 65536,
                    "perturb": True,
                    "num_coarse": 64,
                    "num_fine": 64,
                    "white_background": True,
                    "radiance_field_noise_std": 0.2,
                    "lindisp": False,
                    "m_thres": args.m_thres,
                },
                "validation": {
                    "chunksize": 65536,
                    "perturb": False,
                    "num_coarse": 64,
                    "num_fine": 64,
                    "white_background": True,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                    "m_thres": args.m_thres,
                },
            },
        }
    )
    out = run_training(cfg, dex=True, use_tensorboard=False)
    val = out["final_validation"]
    best = val["dex_errors"][val["best_threshold_index"]]
    print(
        json.dumps(
            {
                "metric": "dex_depth_rmse_mm",
                "value": round(best["depth_rmse"], 3),
                "abs_err_mm": round(val["min_abs_err"], 3),
                "best_threshold": val["best_threshold"],
                "err2": round(best["depth_err2"], 4),
                "err4": round(best["depth_err4"], 4),
                "err8": round(best["depth_err8"], 4),
                "psnr": round(val["psnr"], 2),
                "iters": args.iters,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
