"""Training-loop features: cachedir preference, val-view cycling, use_pallas."""

import os

import numpy as np
import pytest

from dexnerf_tpu.config import CfgNode
from dexnerf_tpu.data import make_synthetic_scene, write_blender_dataset
from dexnerf_tpu.train import SceneData, run_training


def _base_cfg(tmp_path, **dataset_extra):
    return CfgNode(
        {
            "experiment": {
                "id": "loopfeat",
                "logdir": str(tmp_path),
                "randomseed": 5,
                "train_iters": 3,
                "validate_every": 1,
                "save_every": 0,
                "print_every": 1,
            },
            "dataset": {
                "type": "blender",
                "basedir": "",
                "near": 2.0,
                "far": 6.0,
                "no_ndc": True,
                **dataset_extra,
            },
            "models": {
                "coarse": {
                    "type": "FlexibleNeRFModel",
                    "num_layers": 2,
                    "hidden_size": 16,
                    "num_encoding_fn_xyz": 2,
                    "num_encoding_fn_dir": 1,
                },
                "fine": {
                    "type": "FlexibleNeRFModel",
                    "num_layers": 2,
                    "hidden_size": 16,
                    "num_encoding_fn_xyz": 2,
                    "num_encoding_fn_dir": 1,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5.0e-3},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {
                    "num_random_rays": 16,
                    "chunksize": 64,
                    "perturb": True,
                    "num_coarse": 4,
                    "num_fine": 4,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                },
                "validation": {
                    "chunksize": 64,
                    "perturb": False,
                    "num_coarse": 4,
                    "num_fine": 4,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                },
            },
        }
    )


def _scene(n_val=2):
    images, depths, poses, hwf = make_synthetic_scene(
        num_views=2 + n_val, height=8, width=8
    )
    return SceneData(
        images=images,
        poses=poses,
        hwf=hwf,
        i_train=np.arange(2),
        i_val=np.arange(2, 2 + n_val),
        depths=depths,
    )


def test_val_view_cycling(tmp_path):
    out = run_training(
        _base_cfg(tmp_path), scene=_scene(n_val=2), use_tensorboard=False
    )
    # 3 iters, validate_every=1 -> validations at i=0,1,2 cycling val views
    # final validation (i=2) uses i_val[2 % 2] = i_val[0] = 2
    assert out["final_validation"]["index"] == 2


def test_cachedir_preference(tmp_path):
    """When cfg.dataset.cachedir holds shards, training uses them."""
    from dexnerf_tpu.apps.cache import build_parser, cache_nerf_dataset

    base = str(tmp_path / "blender")
    write_blender_dataset(base, height=25, width=25, views_per_split=(2, 1, 1))
    cachedir = str(tmp_path / "cache")
    cache_nerf_dataset(
        build_parser().parse_args(
            ["--datapath", base, "--type", "blender", "--savedir", cachedir,
             "--num-random-rays", "32"]
        )
    )
    cfg = _base_cfg(tmp_path, cachedir=cachedir)
    out = run_training(
        cfg, scene=_scene(), use_tensorboard=False
    )
    assert np.isfinite(out["final_validation"]["psnr"])


def test_use_pallas_validation_interpret(tmp_path):
    cfg = _base_cfg(tmp_path)
    cfg.nerf["use_pallas"] = True
    out = run_training(cfg, scene=_scene(), use_tensorboard=False, max_iters=1)
    assert np.isfinite(out["final_validation"]["psnr"])


def test_run_training_multi_device(tmp_path):
    """run_training with num_devices=8 uses the shard_map parallel step."""
    cfg = _base_cfg(tmp_path)
    out = run_training(
        cfg, scene=_scene(), use_tensorboard=False, max_iters=2,
        num_devices=8,
    )
    assert np.isfinite(out["final_validation"]["psnr"])
    assert np.isfinite(out["final_train_metrics"]["loss"])
