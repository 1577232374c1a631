"""Point-cloud export: back-projection geometry, PLY round-trip, eval CLI."""

import os

import numpy as np
import pytest

from dexnerf_tpu.utils import depth_to_points, read_ply, write_ply


def test_backprojection_and_mask():
    ro = np.tile(np.asarray([[1.0, 2.0, 3.0]], np.float32), (4, 1))
    rd = np.asarray(
        [[0, 0, 1], [0, 1, 0], [1, 0, 0], [0, 0, -1]], np.float32
    )
    depth = np.asarray([2.0, 0.5, np.inf, 0.0], np.float32)  # 2 invalid
    rgb = np.tile(np.asarray([[0.25, 0.5, 0.75]], np.float32), (4, 1))
    pts, cols = depth_to_points(ro, rd, depth, rgb=rgb)
    np.testing.assert_allclose(
        pts, [[1, 2, 5], [1, 2.5, 3]], atol=1e-6
    )  # o + t*d; inf and 0 dropped
    np.testing.assert_allclose(cols, [[0.25, 0.5, 0.75]] * 2)
    # explicit mask composes with the finite/positive filter
    pts2, _ = depth_to_points(
        ro, rd, depth, mask=np.asarray([False, True, True, True])
    )
    np.testing.assert_allclose(pts2, [[1, 2.5, 3]], atol=1e-6)


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(17, 3).astype(np.float32)
    cols = rng.rand(17, 3).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, cols)
    rpts, rcols = read_ply(path)
    np.testing.assert_allclose(rpts, pts, atol=1e-5)
    np.testing.assert_allclose(rcols, cols, atol=1.0 / 255.0)
    # colorless variant
    write_ply(path, pts)
    rpts, rcols = read_ply(path)
    np.testing.assert_allclose(rpts, pts, atol=1e-5)
    assert rcols is None


def test_eval_pointcloud_cli(tmp_path):
    """--save-pointcloud through apps.eval: expected-depth and σ-threshold
    variants both write parseable PLYs in world space."""
    import yaml

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.data import write_messytable_dataset
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    base = str(tmp_path / "mt")
    write_messytable_dataset(base, height=16, width=16,
                             views_per_split=(2, 1, 1))
    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "messytable", "basedir": base,
                    "near": 2.0, "far": 6.0, "no_ndc": True},
        "models": {
            "coarse": {"type": "FlexibleNeRFModel", "num_layers": 2,
                       "hidden_size": 16, "num_encoding_fn_xyz": 2,
                       "num_encoding_fn_dir": 1},
            "fine": {"type": "FlexibleNeRFModel", "num_layers": 2,
                     "hidden_size": 16, "num_encoding_fn_xyz": 2,
                     "num_encoding_fn_dir": 1},
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {"num_random_rays": 16, "chunksize": 64,
                      "perturb": True, "num_coarse": 4, "num_fine": 0,
                      "white_background": False,
                      "radiance_field_noise_std": 0.0, "lindisp": False},
            "validation": {"chunksize": 64, "perturb": False,
                           "num_coarse": 4, "num_fine": 4,
                           "white_background": False,
                           "radiance_field_noise_std": 0.0,
                           "lindisp": False, "m_thres": 10},
        },
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    cfg = load_config(cfg_path)
    _, _, params = setup_models(cfg, 1)
    state = init_train_state(params, make_optimizer(5e-3))
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 1, state)

    # expected-depth cloud
    savedir = str(tmp_path / "r1")
    rc = eval_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir,
        "--savedir", savedir, "--num-poses", "1", "--save-pointcloud",
    ])
    assert rc == 0
    pts, cols = read_ply(os.path.join(savedir, "pointcloud", "0000.ply"))
    assert pts.shape[1] == 3 and cols.shape == pts.shape
    # every point lies inside the scene's depth range along its ray
    assert pts.shape[0] > 0

    # σ-threshold (dex) cloud
    savedir = str(tmp_path / "r2")
    rc = eval_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir,
        "--savedir", savedir, "--num-poses", "1",
        "--save-pointcloud", "--pointcloud-threshold", "7.0",
        "--save-depth-confidence", "0.5",
    ])
    assert rc == 0
    ply_path = os.path.join(savedir, "pointcloud", "0000.ply")
    assert os.path.exists(ply_path)
    # confidence rides the cloud as a per-vertex property (around the
    # sigma-threshold depth, since that is what was back-projected)
    assert "property float confidence" in open(ply_path).read(400)

    with pytest.raises(SystemExit, match="save-pointcloud"):
        eval_main([
            "--config", cfg_path, "--checkpoint", ckpt_dir,
            "--savedir", savedir, "--pointcloud-threshold", "7.0",
        ])


def test_eval_save_gif(tmp_path):
    """--save-gif assembles the rendered frames into an animated GIF."""
    import imageio.v2 as imageio
    import yaml

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.data import write_blender_dataset
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    base = str(tmp_path / "blender")
    write_blender_dataset(base, height=12, width=12, views_per_split=(2, 1, 1))
    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": base,
                    "near": 2.0, "far": 6.0, "no_ndc": True},
        "models": {
            "coarse": {"type": "FlexibleNeRFModel", "num_layers": 2,
                       "hidden_size": 16, "num_encoding_fn_xyz": 2,
                       "num_encoding_fn_dir": 1},
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {"num_random_rays": 16, "chunksize": 64,
                      "perturb": True, "num_coarse": 4, "num_fine": 0,
                      "white_background": False,
                      "radiance_field_noise_std": 0.0, "lindisp": False},
            "validation": {"chunksize": 64, "perturb": False,
                           "num_coarse": 4, "num_fine": 0,
                           "white_background": False,
                           "radiance_field_noise_std": 0.0,
                           "lindisp": False},
        },
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    cfg = load_config(cfg_path)
    _, _, params = setup_models(cfg, 1)
    state = init_train_state(params, make_optimizer(5e-3))
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 1, state)

    savedir = str(tmp_path / "renders")
    rc = eval_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir,
        "--savedir", savedir, "--num-poses", "3", "--save-gif",
    ])
    assert rc == 0
    frames = imageio.mimread(os.path.join(savedir, "render.gif"))
    assert len(frames) == 3


def test_ply_confidence_property(tmp_path):
    rng = np.random.RandomState(1)
    pts = rng.randn(9, 3).astype(np.float32)
    cols = rng.rand(9, 3).astype(np.float32)
    conf = rng.rand(9).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, cols, confidence=conf)
    header = open(path).read().split("end_header")[0]
    assert "property float confidence" in header
    rpts, rcols = read_ply(path)  # extra column is reader-tolerated
    np.testing.assert_allclose(rpts, pts, atol=1e-5)
    last_col = np.asarray(
        [r.split()[-1] for r in open(path).read().splitlines()[-9:]],
        np.float32,
    )
    np.testing.assert_allclose(last_col, conf, atol=1e-4)
    with pytest.raises(ValueError, match="confidence"):
        write_ply(path, pts, cols, confidence=conf[:3])


def test_depth_to_points_return_keep():
    ro = np.zeros((4, 3), np.float32)
    rd = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (4, 1))
    depth = np.array([1.0, -1.0, 2.0, np.nan], np.float32)
    pts, _, keep = depth_to_points(ro, rd, depth, return_keep=True)
    assert keep.tolist() == [True, False, True, False]
    assert pts.shape == (2, 3)
