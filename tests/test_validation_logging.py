"""Validation observability parity with the reference.

The reference logs scalars ``validation/{loss,coarse_loss,fine_loss,psnr,
min_abs_err,err4}`` and images ``validation/{rgb_coarse,rgb_fine,img_target,
depth_gt,depth_pred_<m>,depth_pred_err}`` every validation
(``train_dexnerf_rgb.py:375-428``), plus a uint32-mm depth PNG under
``pred_depth/``. These tests enumerate that tag set from the JSONL metrics
stream after a dex and a standard training run.
"""

import json
import os

import numpy as np

from dexnerf_tpu.config import CfgNode
from dexnerf_tpu.data import make_synthetic_scene
from dexnerf_tpu.train import SceneData, run_training


def _cfg(tmp_path, m_thres=10):
    val = {
        "chunksize": 64,
        "perturb": False,
        "num_coarse": 4,
        "num_fine": 4,
        "white_background": False,
        "radiance_field_noise_std": 0.0,
        "lindisp": False,
    }
    if m_thres:
        val["m_thres"] = m_thres
    return CfgNode(
        {
            "experiment": {
                "id": "vallog",
                "logdir": str(tmp_path),
                "randomseed": 7,
                "train_iters": 2,
                "validate_every": 1,
                "save_every": 0,
                "print_every": 1,
            },
            "dataset": {
                "type": "blender", "basedir": "", "near": 2.0, "far": 6.0,
                "no_ndc": True,
            },
            "models": {
                "coarse": {
                    "type": "FlexibleNeRFModel", "num_layers": 2,
                    "hidden_size": 16, "num_encoding_fn_xyz": 2,
                    "num_encoding_fn_dir": 1,
                },
                "fine": {
                    "type": "FlexibleNeRFModel", "num_layers": 2,
                    "hidden_size": 16, "num_encoding_fn_xyz": 2,
                    "num_encoding_fn_dir": 1,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5.0e-3},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {
                    "num_random_rays": 16, "chunksize": 64, "perturb": True,
                    "num_coarse": 4, "num_fine": 4, "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
                "validation": val,
            },
        }
    )


def _scene():
    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    return SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.arange(2), i_val=np.array([2]), depths=depths,
    )


def _tags(logdir):
    tags = set()
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for line in f:
            tags.add(json.loads(line)["tag"])
    return tags


def test_dex_validation_tag_set(tmp_path):
    out = run_training(
        _cfg(tmp_path), scene=_scene(), dex=True, use_tensorboard=False
    )
    tags = _tags(out["logdir"])
    # reference scalar tags (train_dexnerf_rgb.py:375-428)
    for t in (
        "validation/loss",
        "validation/coarse_loss",
        "validation/fine_loss",
        "validation/psnr",
        "validation/min_abs_err",
        "validation/err4",
    ):
        assert t in tags, t
    # reference image tags
    for t in (
        "validation/rgb_coarse",
        "validation/rgb_fine",
        "validation/img_target",
        "validation/depth_gt",
        "validation/depth_pred_err",
    ):
        assert t in tags, t
    # one per candidate threshold: m_thres=10 -> [5, 10]
    assert "validation/depth_pred_5" in tags
    assert "validation/depth_pred_10" in tags
    # uint32-mm depth PNG artifact (train_dexnerf_rgb.py:410-414)
    pred_dir = os.path.join(out["logdir"], "pred_depth")
    assert any(
        f.startswith("pred_depth_step_") for f in os.listdir(pred_dir)
    )


def test_standard_validation_tag_set(tmp_path):
    out = run_training(
        _cfg(tmp_path, m_thres=0), scene=_scene(), use_tensorboard=False
    )
    tags = _tags(out["logdir"])
    for t in (
        "validation/loss",
        "validation/coarse_loss",
        "validation/fine_loss",
        "validation/psnr",
        "validation/depth_abs_err",
        "validation/rgb_coarse",
        "validation/rgb_fine",
        "validation/img_target",
        "validation/depth_gt",
        "validation/depth_pred_err",
    ):
        assert t in tags, t
