"""Full Dex-NeRF path: messytable-format data from disk -> w2c ray pipeline
-> IR (luminance) training -> sigma-threshold depth sweep validation."""

import numpy as np
import pytest

from dexnerf_tpu.config import CfgNode
from dexnerf_tpu.data import load_messytable_data, write_messytable_dataset
from dexnerf_tpu.train import SceneData, load_scene, run_training


@pytest.fixture(scope="module")
def mt_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("data") / "mt")
    write_messytable_dataset(d, height=32, width=32, views_per_split=(2, 1, 1))
    return d


def _cfg(basedir, tmp_path):
    return CfgNode(
        {
            "experiment": {
                "id": "dex-ir-e2e",
                "logdir": str(tmp_path),
                "randomseed": 3,
                "train_iters": 2,
                "validate_every": 1,
                "save_every": 0,
                "print_every": 1,
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
                    "m_thres": 15,
                },
                "validation": {
                    "chunksize": 64,
                    "perturb": False,
                    "num_coarse": 4,
                    "num_fine": 4,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                    "m_thres": 15,
                },
            },
        }
    )


def test_load_scene_messytable(mt_dir, tmp_path):
    cfg = _cfg(mt_dir, tmp_path)
    scene = load_scene(cfg)
    assert scene.intrinsics is not None
    assert scene.depths is not None
    # loader halves resolution: 32 -> 16
    assert scene.images.shape[1:3] == (16, 16)
    assert len(scene.i_train) == 2 and len(scene.i_val) == 1


def test_dex_ir_training_end_to_end(mt_dir, tmp_path):
    cfg = _cfg(mt_dir, tmp_path)
    out = run_training(
        cfg, dex=True, supervision="luminance", use_tensorboard=False,
        save_artifacts=False,
    )
    val = out["final_validation"]
    assert np.isfinite(val["psnr"])
    # threshold sweep: m_thres=15 -> candidates (5, 10, 15)
    assert len(val["dex_errors"]) == 3
    assert val["best_threshold"] in (5.0, 10.0, 15.0)
    assert np.isfinite(val["min_abs_err"])
    assert val["best_depth"].shape == (16, 16)
    # depth metrics on the standard masked protocol exist per threshold
    for e in val["dex_errors"]:
        assert set(e) == {
            "depth_abs_err", "depth_rmse",
            "depth_err2", "depth_err4", "depth_err8",
        }
